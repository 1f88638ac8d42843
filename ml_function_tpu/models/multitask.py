"""Multi-task CVR model family: ESMM and MMoE.

The reference reserves a ``kon/model/cvr_model/`` package for conversion-rate
models but never implements it — its three ``__init__.py``s are import-only
stubs (``kon/model/cvr_model/__init__.py``; SURVEY §2.9). This module fills
that placeholder with the two canonical CVR architectures, built on the same
fused embedding store and Model API as the CTR zoo:

- ``ESMM`` (Ma et al. 2018): pCTR and pCVR towers over shared embeddings;
  trained on the *entire impression space* via pCTCVR = pCTR·pCVR, which
  sidesteps CVR sample-selection bias (conversions are only observed on
  clicks).
- ``MMoE`` (Ma et al. 2018, KDD): multi-gate mixture-of-experts shared
  bottom; each task has a softmax gate over the expert outputs and its own
  tower. Expert MLPs run as ONE batched einsum so all experts share a single
  MXU matmul per layer instead of E small ones.

Both return their PRIMARY logit from ``apply`` (ESMM: logit(pCTCVR); MMoE:
the first task) so the standard train loop / AUC eval work unchanged, and
emit the secondary tasks' BCE terms in ``aux`` — the explicit-loss-term
convention the rest of the zoo uses for DIEN aux / MIMN reg losses.

Batch contract: ``label`` is the primary target (ESMM: conversion), plus one
array per secondary task name (ESMM: ``click``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.base import glorot_uniform, split_rngs, zeros
from ..ops.core import MLP, flatten_concat
from ..ops.embedding import FusedEmbedding
from .base import Model, embed_inputs, stateless


def _bce(logits: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.maximum(logits, 0) - logits * y
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def ESMM(fs: FeatureSet, hidden: Tuple[int, ...] = (128, 64),
         ctr_weight: float = 1.0) -> Model:
    """Entire-Space Multi-task Model. ``apply`` returns logit(pCTCVR) —
    monotone in pCTCVR, so downstream AUC/calibration see the conversion
    probability over all impressions. aux carries the CTR tower's BCE
    against ``batch['click']`` (weighted by ``ctr_weight``)."""
    fe = FusedEmbedding(fs, with_linear=False)
    f, d, nd = len(fs.sparse), fs.embed_dim, len(fs.dense)
    in_dim = f * d + nd
    ctr_mlp = MLP(in_dim, hidden, activation="relu", out_dim=1)
    cvr_mlp = MLP(in_dim, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "ctr", "cvr"])
        return {"embedding": fe.init(rngs["emb"]),
                "ctr": ctr_mlp.init(rngs["ctr"]),
                "cvr": cvr_mlp.init(rngs["cvr"])}

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        h = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        l_ctr = ctr_mlp(params["ctr"], h)[0][:, 0]
        l_cvr = cvr_mlp(params["cvr"], h)[0][:, 0]
        # logit(pCTCVR) where log pCTCVR = logsig(l_ctr) + logsig(l_cvr);
        # -expm1(ls) = 1 - pCTCVR, stable at both ends
        ls = jax.nn.log_sigmoid(l_ctr) + jax.nn.log_sigmoid(l_cvr)
        ls = jnp.minimum(ls, -1e-7)  # guard exact 0 under bf16 towers
        logit = ls - jnp.log(-jnp.expm1(ls))
        aux = {"emb_l2": inp["l2"]}
        if "click" in batch:  # absent at serving time — scoring is features-only
            aux["ctr_bce"] = ctr_weight * _bce(l_ctr, batch["click"])
        return logit, aux

    return stateless("ESMM", fs, init_fn, fwd)


def MMoE(fs: FeatureSet, n_experts: int = 4,
         expert_hidden: Tuple[int, ...] = (64,),
         tower_hidden: Tuple[int, ...] = (32,),
         tasks: Tuple[str, ...] = ("label", "click"),
         task_weights: Tuple[float, ...] = None) -> Model:
    """Multi-gate Mixture-of-Experts. ``tasks[0]`` is the primary target
    (scored by the returned logit and the train loop's main BCE);
    ``tasks[1:]`` name batch arrays whose BCE terms ride in aux."""
    fe = FusedEmbedding(fs, with_linear=False)
    f, d, nd = len(fs.sparse), fs.embed_dim, len(fs.dense)
    in_dim = f * d + nd
    e_dim = expert_hidden[-1]
    n_tasks = len(tasks)
    weights = task_weights or (1.0,) * n_tasks
    towers = [MLP(e_dim, tower_hidden, activation="relu", out_dim=1)
              for _ in tasks]

    def init_fn(rng):
        names = (["emb"] + [f"tower{t}" for t in range(n_tasks)]
                 + [f"expert{e}" for e in range(n_experts)] + ["gates"])
        rngs = split_rngs(rng, names)
        p = {"embedding": fe.init(rngs["emb"]),
             "gates": {"w": glorot_uniform(rngs["gates"],
                                           (n_tasks, in_dim, n_experts)),
                       "b": zeros((n_tasks, n_experts))}}
        # experts stacked on a leading axis → one batched einsum per layer
        dims = (in_dim,) + tuple(expert_hidden)
        ws, bs = [], []
        for li in range(len(expert_hidden)):
            k = jax.random.fold_in(rngs[f"expert{0}"], li)
            ws.append(jax.vmap(
                lambda r: glorot_uniform(r, (dims[li], dims[li + 1])))(
                jax.random.split(k, n_experts)))
            bs.append(jnp.zeros((n_experts, dims[li + 1]), jnp.float32))
        p["experts"] = {"w": ws, "b": bs}
        for t in range(n_tasks):
            p[f"tower{t}"] = towers[t].init(rngs[f"tower{t}"])
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        h = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        # all experts in one einsum per layer: (B,in) × (E,in,out) → (B,E,out)
        x = jnp.broadcast_to(h[:, None, :], (h.shape[0], n_experts, in_dim))
        for w, b in zip(params["experts"]["w"], params["experts"]["b"]):
            x = jax.nn.relu(jnp.einsum("bei,eio->beo", x, w) + b)
        gates = jax.nn.softmax(
            jnp.einsum("bi,tie->bte", h, params["gates"]["w"])
            + params["gates"]["b"], axis=-1)                 # (B, T, E)
        mixed = jnp.einsum("bte,beo->bto", gates, x)          # (B, T, e_dim)
        logits = [towers[t](params[f"tower{t}"], mixed[:, t])[0][:, 0]
                  for t in range(n_tasks)]
        aux = {"emb_l2": inp["l2"]}
        for t in range(1, n_tasks):
            if tasks[t] in batch:  # absent at serving time
                aux[f"{tasks[t]}_bce"] = weights[t] * _bce(logits[t],
                                                           batch[tasks[t]])
        return logits[0], aux

    return stateless("MMoE", fs, init_fn, fwd)


def PLE(fs: FeatureSet, n_task_experts: int = 2, n_shared_experts: int = 2,
        n_layers: int = 2, expert_dim: int = 64,
        tower_hidden: Tuple[int, ...] = (32,),
        tasks: Tuple[str, ...] = ("label", "click"),
        task_weights: Tuple[float, ...] = None) -> Model:
    """Progressive Layered Extraction (Tang et al., RecSys 2020) — the
    seesaw-free successor to MMoE, completing the CVR family the reference
    reserved but never built (``kon/model/cvr_model/``, SURVEY §2.9).

    Each extraction layer is a CGC unit: every task owns ``n_task_experts``
    private experts and all tasks share ``n_shared_experts``; a task's gate
    mixes ONLY its own + shared experts while the shared gate mixes all of
    them, so gradients from one task cannot pull another task's private
    representation. TPU design mirrors MMoE: every expert of a layer is a
    slice of one stacked (E, in, out) weight so the whole layer is a single
    ``bei,eio->beo`` einsum on the MXU; gate selection is static indexing
    into the expert axis (no dynamic shapes)."""
    fe = FusedEmbedding(fs, with_linear=False)
    f, d, nd = len(fs.sparse), fs.embed_dim, len(fs.dense)
    in_dim = f * d + nd
    n_tasks = len(tasks)
    weights = task_weights or (1.0,) * n_tasks
    n_exp = n_tasks * n_task_experts + n_shared_experts  # experts per layer
    towers = [MLP(expert_dim, tower_hidden, activation="relu", out_dim=1)
              for _ in tasks]
    # expert e belongs to task e // n_task_experts (shared if >= n_tasks)
    own = [tuple(range(t * n_task_experts, (t + 1) * n_task_experts))
           + tuple(range(n_tasks * n_task_experts, n_exp))
           for t in range(n_tasks)]  # per-task gate's expert slice

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb"] + [f"layer{l}" for l in range(n_layers)]
                          + [f"tower{t}" for t in range(n_tasks)])
        p = {"embedding": fe.init(rngs["emb"]), "layers": []}
        dims = [in_dim] + [expert_dim] * n_layers
        for li in range(n_layers):
            kr = rngs[f"layer{li}"]
            ws = jax.vmap(lambda r: glorot_uniform(
                r, (dims[li], dims[li + 1])))(jax.random.split(
                    jax.random.fold_in(kr, 0), n_exp))
            # per-task gates over (own + shared) experts, + 1 shared gate
            # over all experts (only needed while another layer follows)
            gate_w = [glorot_uniform(jax.random.fold_in(kr, 1 + t),
                                     (dims[li], len(own[t])))
                      for t in range(n_tasks)]
            shared_gate = glorot_uniform(jax.random.fold_in(kr, 1 + n_tasks),
                                         (dims[li], n_exp))
            p["layers"].append({
                "w": ws, "b": jnp.zeros((n_exp, dims[li + 1]), jnp.float32),
                "gate_w": gate_w,
                "gate_b": [jnp.zeros((len(own[t]),), jnp.float32)
                           for t in range(n_tasks)],
                "shared_gate_w": shared_gate,
                "shared_gate_b": jnp.zeros((n_exp,), jnp.float32)})
        for t in range(n_tasks):
            p[f"tower{t}"] = towers[t].init(rngs[f"tower{t}"])
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        h = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        # CGC inputs: one stream per task + one shared stream
        streams = [h] * (n_tasks + 1)
        for li, lp in enumerate(params["layers"]):
            # each expert reads its owner's stream (shared experts read the
            # shared stream): build (B, E, in) from the streams
            x = jnp.stack(
                [streams[min(e // n_task_experts, n_tasks)]
                 for e in range(n_exp)], axis=1)
            out = jax.nn.relu(jnp.einsum("bei,eio->beo", x, lp["w"])
                              + lp["b"])                        # (B, E, out)
            new_streams = []
            for t in range(n_tasks):
                g = jax.nn.softmax(streams[t] @ lp["gate_w"][t]
                                   + lp["gate_b"][t], axis=-1)  # (B, |own|)
                sel = out[:, jnp.asarray(own[t]), :]
                new_streams.append(jnp.einsum("be,beo->bo", g, sel))
            gs = jax.nn.softmax(streams[n_tasks] @ lp["shared_gate_w"]
                                + lp["shared_gate_b"], axis=-1)
            new_streams.append(jnp.einsum("be,beo->bo", gs, out))
            streams = new_streams
        logits = [towers[t](params[f"tower{t}"], streams[t])[0][:, 0]
                  for t in range(n_tasks)]
        aux = {"emb_l2": inp["l2"]}
        for t in range(1, n_tasks):
            if tasks[t] in batch:  # absent at serving time
                aux[f"{tasks[t]}_bce"] = weights[t] * _bce(logits[t],
                                                           batch[tasks[t]])
        return logits[0], aux

    return stateless("PLE", fs, init_fn, fwd)
