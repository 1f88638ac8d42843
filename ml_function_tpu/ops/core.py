"""Core dense blocks: the TPU-native equivalent of the reference's
``core_layer.py`` (HiddenLayer / DnnLayer / ResActivateLayer / ScoreLayer /
MergeScoreLayer / StackLayer / IntraViewPoolingLayer / AlignLayer,
``kon/model/ctr_model/layer/core_layer/core_layer.py:32-257``).

Differences from the reference, by design:
- pure functions over explicit param/state pytrees (no Keras layer objects);
- matmuls run in bfloat16 with float32 accumulation (MXU path);
- normalization defaults to LayerNorm (stateless, fusion-friendly); BatchNorm
  with running stats is available for parity and is threaded through an
  explicit ``state`` pytree;
- activations include PReLU and Dice (DIN paper) as the reference's
  ``ResActivateLayer``/DnnLayer activation options.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .base import (Params, bf16_matmul, glorot_uniform, ones, split_rngs,
                   zeros)

State = Dict[str, Any]


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Dense:
    """w·x+b on the MXU. Reference: the Dense inside HiddenLayer
    (core_layer.py:102-129)."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    def init(self, rng) -> Params:
        p = {"w": glorot_uniform(rng, (self.in_dim, self.out_dim))}
        if self.use_bias:
            p["b"] = zeros((self.out_dim,))
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = bf16_matmul(x, params["w"])
        if self.use_bias:
            y = y + params["b"]
        return y


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LayerNorm:
    dim: int
    eps: float = 1e-6

    def init(self, rng) -> Params:
        return {"scale": ones((self.dim,)), "bias": zeros((self.dim,))}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return y * params["scale"] + params["bias"]


@dataclass(frozen=True)
class BatchNorm:
    """BatchNorm over the leading axes with running stats in ``state``.

    Parity with the reference's optional ``BatchNormalization`` in
    HiddenLayer/ResActivateLayer (core_layer.py:117, :146-151).
    """

    dim: int
    momentum: float = 0.99
    eps: float = 1e-3

    def init(self, rng) -> Params:
        return {"scale": ones((self.dim,)), "bias": zeros((self.dim,))}

    def init_state(self) -> State:
        return {"mean": zeros((self.dim,)), "var": ones((self.dim,))}

    def __call__(self, params: Params, state: State, x: jax.Array,
                 train: bool) -> Tuple[jax.Array, State]:
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            new_state = {
                "mean": self.momentum * state["mean"] + (1 - self.momentum) * mean,
                "var": self.momentum * state["var"] + (1 - self.momentum) * var,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * params["scale"] + params["bias"], new_state


# ---------------------------------------------------------------------------
# Activations (reference ResActivateLayer options + Dice)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Activation:
    """relu | prelu | dice | sigmoid | tanh | gelu | identity.

    PReLU/Dice carry learned alphas (per-feature). Dice follows the DIN paper:
    p = sigmoid(norm(s)); f = p*s + (1-p)*alpha*s — the adaptive variant the
    reference approximates with PReLU (models.py:185 'PReLU').
    """

    kind: str
    dim: int = 0

    def init(self, rng) -> Params:
        if self.kind in ("prelu", "dice"):
            return {"alpha": zeros((self.dim,)) + 0.25}
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        k = self.kind
        if k == "relu":
            return jax.nn.relu(x)
        if k == "prelu":
            return jnp.where(x > 0, x, params["alpha"] * x)
        if k == "dice":
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            p = jax.nn.sigmoid((x - mu) * jax.lax.rsqrt(var + 1e-8))
            return p * x + (1.0 - p) * params["alpha"] * x
        if k == "sigmoid":
            return jax.nn.sigmoid(x)
        if k == "tanh":
            return jnp.tanh(x)
        if k == "gelu":
            return jax.nn.gelu(x)
        if k in ("identity", "linear", None):
            return x
        raise ValueError(f"unknown activation {k!r}")


# ---------------------------------------------------------------------------
# MLP — the reference's DnnLayer (core_layer.py:159-226)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MLP:
    """Residual MLP tower.

    - ``hidden``: layer widths (reference ``hidden_units`` lists).
    - ``res_every``: add a skip connection every N layers (reference
      ``res_unit``, core_layer.py:169) — 0 disables.
    - ``norm``: None|'layer'|'batch' (reference ``use_bn``/``use_ln``).
    - ``out_dim``: optional final linear head (reference ``output_dim``
      + sigmoid/softmax handled by score heads below).
    """

    in_dim: int
    hidden: Tuple[int, ...]
    activation: str = "relu"
    res_every: int = 0
    norm: Optional[str] = None
    out_dim: Optional[int] = None

    def _layers(self):
        dims = (self.in_dim,) + tuple(self.hidden)
        return [(dims[i], dims[i + 1]) for i in range(len(self.hidden))]

    def init(self, rng) -> Params:
        names = [f"layer{i}" for i in range(len(self.hidden))]
        if self.out_dim is not None:
            names.append("head")
        rngs = split_rngs(rng, names + ["res"])
        p: Params = {}
        for i, (din, dout) in enumerate(self._layers()):
            sub = split_rngs(rngs[f"layer{i}"], ["dense", "act", "norm"])
            layer = {"dense": Dense(din, dout).init(sub["dense"]),
                     "act": Activation(self.activation, dout).init(sub["act"])}
            if self.norm == "layer":
                layer["norm"] = LayerNorm(dout).init(sub["norm"])
            elif self.norm == "batch":
                layer["norm"] = BatchNorm(dout).init(sub["norm"])
            p[f"layer{i}"] = layer
        if self.res_every:
            # projections for residual skips when dims change
            res_rngs = jax.random.split(rngs["res"], len(self.hidden))
            for i, (din, dout) in enumerate(self._layers()):
                if (i + 1) % self.res_every == 0:
                    src = self._res_src(i)
                    src_dim = self.in_dim if src < 0 else self.hidden[src]
                    if src_dim != dout:
                        p[f"res{i}"] = Dense(src_dim, dout, use_bias=False).init(
                            res_rngs[i])
        if self.out_dim is not None:
            p["head"] = Dense(self.hidden[-1] if self.hidden else self.in_dim,
                              self.out_dim).init(rngs["head"])
        return p

    def init_state(self) -> State:
        if self.norm != "batch":
            return {}
        return {f"layer{i}": BatchNorm(d).init_state()
                for i, (_, d) in enumerate(self._layers())}

    def _res_src(self, i: int) -> int:
        """Index of the layer output feeding the skip into layer i (-1 = input)."""
        return i - self.res_every

    def __call__(self, params: Params, x: jax.Array, *, state: State = None,
                 train: bool = False) -> Tuple[jax.Array, State]:
        state = state or {}
        new_state: State = {}
        outs = [x]
        h = x
        for i, (din, dout) in enumerate(self._layers()):
            lp = params[f"layer{i}"]
            h = Dense(din, dout)(lp["dense"], h)
            if self.norm == "layer":
                h = LayerNorm(dout)(lp["norm"], h)
            elif self.norm == "batch":
                h, ns = BatchNorm(dout)(lp["norm"], state[f"layer{i}"], h, train)
                new_state[f"layer{i}"] = ns
            h = Activation(self.activation, dout)(lp["act"], h)
            if self.res_every and (i + 1) % self.res_every == 0:
                skip = outs[self._res_src(i) + 1]
                if f"res{i}" in params:
                    skip = Dense(skip.shape[-1], dout, use_bias=False)(
                        params[f"res{i}"], skip)
                h = h + skip
            outs.append(h)
        if self.out_dim is not None:
            last = self.hidden[-1] if self.hidden else self.in_dim
            h = Dense(last, self.out_dim)(params["head"], h)
        return h, new_state


# ---------------------------------------------------------------------------
# Score heads
# ---------------------------------------------------------------------------


def flatten_concat(xs: Sequence[jax.Array]) -> jax.Array:
    """Reference StackLayer (core_layer.py:32-55): flatten each input to
    (B, -1) and concatenate."""
    flat = [x.reshape(x.shape[0], -1) for x in xs]
    return flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=-1)


@dataclass(frozen=True)
class ScoreHead:
    """Single-logit head (reference ScoreLayer, core_layer.py:58-84).

    Sums a list of scalar contributions (+ optional global bias) into one
    logit. Models return LOGITS; sigmoid lives in the loss/metrics for
    numerical stability.
    """

    use_bias: bool = True

    def init(self, rng) -> Params:
        return {"bias": zeros(())} if self.use_bias else {}

    def __call__(self, params: Params, contributions: Sequence[jax.Array]) -> jax.Array:
        total = sum(c.reshape(c.shape[0]) for c in contributions)
        if self.use_bias:
            total = total + params["bias"]
        return total


@dataclass(frozen=True)
class MergeScoreHead:
    """Reference MergeScoreLayer (core_layer.py:86-100): concat → Dense(1).

    The reference emits Dense(2, softmax); a 2-way softmax is exactly one
    sigmoid logit, so we emit a single logit (same model class, half the
    head FLOPs, stable loss).
    """

    in_dim: int

    def init(self, rng) -> Params:
        return {"head": Dense(self.in_dim, 1).init(rng)}

    def __call__(self, params: Params, xs: Sequence[jax.Array]) -> jax.Array:
        h = flatten_concat(list(xs))
        return Dense(self.in_dim, 1)(params["head"], h)[:, 0]


def intra_view_pool(x: jax.Array) -> jax.Array:
    """Mean-pool over axis 1 keepdims (reference IntraViewPoolingLayer,
    core_layer.py:228-238)."""
    return jnp.mean(x, axis=1, keepdims=True)


@dataclass(frozen=True)
class Align:
    """Dense-project a list of tensors to a common last dim (reference
    AlignLayer, core_layer.py:240-257)."""

    in_dims: Tuple[int, ...]
    out_dim: int

    def init(self, rng) -> Params:
        rngs = jax.random.split(rng, len(self.in_dims))
        return {f"proj{i}": Dense(d, self.out_dim).init(rngs[i])
                for i, d in enumerate(self.in_dims) if d != self.out_dim}

    def __call__(self, params: Params, xs: Sequence[jax.Array]) -> list:
        out = []
        for i, (x, d) in enumerate(zip(xs, self.in_dims)):
            if d != self.out_dim:
                x = Dense(d, self.out_dim)(params[f"proj{i}"], x)
            out.append(x)
        return out
