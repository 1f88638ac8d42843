"""Feature-interaction blocks (FM / PNN / DCN cross / CIN / AFM).

TPU-native re-design of the reference's ``interactive_layer.py``
(``kon/model/ctr_model/layer/interactive_layer/interactive_layer.py``):

- the reference's ``InnerLayer`` loops ``itertools.combinations`` over Keras
  tensors (interactive_layer.py:34-66) → here pairwise interactions are one
  batched einsum over the (B, F, D) field-embedding tensor, or the O(F·D)
  sum-of-squares identity when only the summed FM term is needed;
- ``CrossLayer`` explicit recursion (interactive_layer.py:250-282) → rank-1
  cross step as two fused matvecs;
- ``CIN`` per-hidden Conv1D loop (interactive_layer.py:285-327) → a single
  einsum/matmul per depth on an (H·F, D) layout that tiles onto the MXU,
  with a fused Pallas layer (``ops/kernels/cin.py``) that keeps the
  interaction tensor in VMEM — 2× batch headroom (auto-dispatched).

All functions take field embeddings ``e``: (B, F, D) float32/bf16.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Params, bf16_matmul, glorot_uniform, split_rngs, zeros
from .core import MLP, Dense


# ---------------------------------------------------------------------------
# FM
# ---------------------------------------------------------------------------


def fm_interaction(e: jax.Array) -> jax.Array:
    """Second-order FM term: (B, F, D) → (B,).

    0.5 * Σ_d [(Σ_f e_fd)² − Σ_f e_fd²] — identical to the reference's
    sum over pairwise elementwise products + Add (FmLayer,
    interactive_layer.py:145-170) but O(F·D) instead of O(F²·D).
    """
    s = jnp.sum(e, axis=1)
    sq = jnp.sum(jnp.square(e), axis=1)
    return 0.5 * jnp.sum(jnp.square(s) - sq, axis=-1)


def fm_interaction_vector(e: jax.Array) -> jax.Array:
    """Bi-interaction vector (NFM): (B, F, D) → (B, D), the FM term before the
    final D-sum (reference NFM inner-sum path, models.py:108-119)."""
    s = jnp.sum(e, axis=1)
    sq = jnp.sum(jnp.square(e), axis=1)
    return 0.5 * (jnp.square(s) - sq)


def pairwise_products(e: jax.Array) -> jax.Array:
    """All F·(F−1)/2 elementwise pair products: (B, F, D) → (B, P, D).

    Used by AFM/PNN where per-pair vectors are needed (reference InnerLayer
    with combinations, interactive_layer.py:44-58).
    """
    f = e.shape[1]
    iu, ju = np.triu_indices(f, k=1)
    return e[:, iu, :] * e[:, ju, :]


def pairwise_inner_products(e: jax.Array) -> jax.Array:
    """Pairwise inner products: (B, F, D) → (B, P). PNN's IPnn signal
    (interactive_layer.py:68-80)."""
    g = jnp.einsum("bfd,bgd->bfg", e, e)  # Gram matrix, one MXU matmul
    f = e.shape[1]
    iu, ju = np.triu_indices(f, k=1)
    return g[:, iu, ju]


@dataclass(frozen=True)
class OuterProduct:
    """PNN outer-product with sum-reduction (OPnnLayer ``use_reduce``,
    interactive_layer.py:111-143): p = Σ_f e_f; signal = vec(p pᵀ) · K."""

    dim: int
    out_dim: int = 1

    def init(self, rng) -> Params:
        return {"kernel": glorot_uniform(rng, (self.dim * self.dim, self.out_dim))}

    def __call__(self, params: Params, e: jax.Array) -> jax.Array:
        p = jnp.sum(e, axis=1)  # (B, D)
        outer = jnp.einsum("bi,bj->bij", p, p).reshape(p.shape[0], -1)
        return bf16_matmul(outer, params["kernel"])


# ---------------------------------------------------------------------------
# Linear (first-order) term
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LinearUnit:
    """Explicit w·x+b over dense features (reference LinearLayer,
    interactive_layer.py:172-187). Sparse first-order terms come from the
    fused linear embedding table."""

    in_dim: int

    def init(self, rng) -> Params:
        return {"dense": Dense(self.in_dim, 1).init(rng)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return Dense(self.in_dim, 1)(params["dense"], x)[:, 0]


# ---------------------------------------------------------------------------
# DCN cross network
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CrossNet:
    """DCN-v1 cross network (reference CrossLayer, interactive_layer.py:250-282).

    x_{k+1} = x0 ⊙ (x_k·w_k) + b_k + x_k, computed as two fused matvecs —
    all k layers unrolled (depth is tiny and static).
    """

    dim: int
    depth: int = 3

    def init(self, rng) -> Params:
        rngs = jax.random.split(rng, self.depth)
        return {f"layer{i}": {"w": glorot_uniform(rngs[i], (self.dim, 1)),
                              "b": zeros((self.dim,))}
                for i in range(self.depth)}

    def __call__(self, params: Params, x0: jax.Array) -> jax.Array:
        x = x0
        for i in range(self.depth):
            lp = params[f"layer{i}"]
            xw = bf16_matmul(x, lp["w"])          # (B, 1)
            x = x0 * xw + lp["b"] + x
        return x


@dataclass(frozen=True)
class CrossNetMix:
    """DCN-v2 full-matrix cross layer: x_{k+1} = x0 ⊙ (W_k x_k + b_k) + x_k.

    Not in the reference — included because it is the modern default and a
    pure MXU win on TPU (the rank-1 v1 form is bandwidth-bound).
    """

    dim: int
    depth: int = 3

    def init(self, rng) -> Params:
        rngs = jax.random.split(rng, self.depth)
        return {f"layer{i}": {"w": glorot_uniform(rngs[i], (self.dim, self.dim)),
                              "b": zeros((self.dim,))}
                for i in range(self.depth)}

    def __call__(self, params: Params, x0: jax.Array) -> jax.Array:
        x = x0
        for i in range(self.depth):
            lp = params[f"layer{i}"]
            x = x0 * (bf16_matmul(x, lp["w"]) + lp["b"]) + x
        return x


# ---------------------------------------------------------------------------
# CIN (xDeepFM)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CIN:
    """Compressed Interaction Network (reference CIN,
    interactive_layer.py:285-327).

    Layer k: Z[b,h,f,d] = X^k[b,h,d]·X^0[b,f,d]; X^{k+1}[b,o,d] =
    Σ_{h,f} W[h,f,o]·Z[b,h,f,d]. Implemented as one einsum per depth
    (reshaped internally to an (H·F, O) matmul → MXU). Per-layer sum-pool
    over D is concatenated and projected to a logit.
    """

    n_fields: int
    dim: int
    hidden: Tuple[int, ...] = (128, 128)
    out_logit: bool = True
    # 'auto': fused Pallas layer (ops/kernels/cin.py) when shapes qualify,
    # einsum otherwise; 'pallas' forces; 'off' forces einsum. The kernel
    # keeps Z in VMEM: step-time parity at feasible batches, but 2x batch
    # headroom (B=131k trains where the einsum Z fails to compile — PERF.md)
    kernel: str = "auto"

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, [f"w{i}" for i in range(len(self.hidden))] + ["head"])
        p: Params = {}
        h_prev = self.n_fields
        for i, h in enumerate(self.hidden):
            p[f"w{i}"] = glorot_uniform(rngs[f"w{i}"], (h_prev * self.n_fields, h))
            h_prev = h
        if self.out_logit:
            p["head"] = Dense(sum(self.hidden), 1).init(rngs["head"])
        return p

    def features(self, params: Params, e: jax.Array) -> jax.Array:
        """(B, F, D) → (B, Σ hidden) pooled interaction features."""
        b, f, d = e.shape
        if self.kernel != "off":
            from .kernels.cin import cin_layer_t, supports
            if (self.kernel == "pallas"
                    or all(supports(b, f, h, d) for h in self.hidden)):
                # fused path: ONE entry transpose; each layer's (D, B, O)
                # output is the next layer's input; pooling sums over D
                # directly in the transposed layout
                e_t = jnp.transpose(e, (2, 0, 1)).astype(jnp.float32)
                xk_t = e_t
                pooled_t = []
                h_prev = f
                for i, h in enumerate(self.hidden):
                    w1 = params[f"w{i}"].reshape(h_prev, f, h).reshape(
                        h_prev, f * h)
                    xk_t = cin_layer_t(xk_t, e_t, w1)      # (D, B, H)
                    pooled_t.append(jnp.sum(xk_t, axis=0))  # (B, H)
                    h_prev = h
                return jnp.concatenate(pooled_t, axis=-1)
        x0 = e
        xk = e
        pooled = []
        for i, h in enumerate(self.hidden):
            # Z: (B, Hk*F, D) — batched outer product along fields
            z = jnp.einsum("bhd,bfd->bhfd", xk, x0).reshape(b, -1, d)
            # compress: (B, D, Hk*F) @ (Hk*F, H) → (B, D, H) → (B, H, D)
            w = params[f"w{i}"]
            nxt = jax.lax.dot_general(
                z.astype(jnp.bfloat16).transpose(0, 2, 1),
                w.astype(jnp.bfloat16),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).transpose(0, 2, 1)
            xk = nxt
            pooled.append(jnp.sum(nxt, axis=-1))  # (B, H)
        return jnp.concatenate(pooled, axis=-1)

    def __call__(self, params: Params, e: jax.Array) -> jax.Array:
        feats = self.features(params, e)
        if not self.out_logit:
            return feats
        return Dense(sum(self.hidden), 1)(params["head"], feats)[:, 0]


# ---------------------------------------------------------------------------
# AFM attention
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AFMAttention:
    """Attentional FM pooling (reference AttentionBaseLayer,
    interactive_layer.py:329-366): score pair products with an MLP, softmax
    over pairs, weighted-sum, project to logit."""

    dim: int
    attn_dim: int = 16

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["score1", "score2", "proj"])
        return {
            "score1": Dense(self.dim, self.attn_dim).init(rngs["score1"]),
            "score2": Dense(self.attn_dim, 1, use_bias=False).init(rngs["score2"]),
            "proj": Dense(self.dim, 1, use_bias=False).init(rngs["proj"]),
        }

    def __call__(self, params: Params, pair_products: jax.Array) -> jax.Array:
        """(B, P, D) → (B,) logit contribution."""
        h = jax.nn.relu(Dense(self.dim, self.attn_dim)(params["score1"],
                                                       pair_products))
        scores = Dense(self.attn_dim, 1, use_bias=False)(params["score2"], h)
        a = jax.nn.softmax(scores, axis=1)            # (B, P, 1)
        pooled = jnp.sum(a * pair_products, axis=1)    # (B, D)
        return Dense(self.dim, 1, use_bias=False)(params["proj"], pooled)[:, 0]
