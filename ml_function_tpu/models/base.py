"""Model API.

Every model constructor takes a ``FeatureSet`` (+ hyperparameters) and returns
a ``Model`` — the pure-functional counterpart of the reference's
``(InputFeature, hyperparams) -> tf.keras.Model`` constructors
(``kon/model/ctr_model/model/models.py:30-426``).

``apply(params, state, batch, train, rng) -> (logits, new_state, aux)``:
- ``logits``: (B,) pre-sigmoid scores (the reference's 2-way softmax head is
  an equivalent single logit);
- ``state``: BatchNorm running stats etc. ({} for stateless models);
- ``aux``: named auxiliary losses (DIEN aux loss, MIMN reg, DTS guide, emb
  L2) — the explicit-term replacement for Keras ``model.add_loss``
  (models.py:236).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.base import Params
from ..ops.embedding import FusedEmbedding

State = Dict[str, Any]
Aux = Dict[str, jax.Array]
ApplyFn = Callable[..., Tuple[jax.Array, State, Aux]]


@dataclass(frozen=True)
class Model:
    name: str
    feature_set: FeatureSet
    init: Callable[[jax.Array], Tuple[Params, State]]
    apply: ApplyFn  # (params, state, batch, *, train=False, rng=None)

    def init_params(self, rng) -> Tuple[Params, State]:
        return self.init(rng)


def embed_inputs(fe: FusedEmbedding, emb_params: Params, batch,
                 with_linear: bool = True, l2: bool = True):
    """Common input plumbing: one fused gather for all sparse fields.

    Returns dict with dense (B, Nd), emb (B, F, D), linear (B, F) and the
    embedding L2 aux term.

    ``behavior_inputs`` returns (cand, beh, mask, l2, emb): the full gathered
    field embeddings ride along so models never gather twice.
    """
    out: Dict[str, Any] = {"dense": batch.get("dense")}
    ids = batch["sparse"]
    emb, lin = fe.sparse_all(emb_params, ids)  # ONE gather for cross + linear
    # Cold-start hook (models/coldstart.py): a {field_name: (B, D)} entry
    # replaces that field's gathered rows — e.g. a generated meta-embedding
    # for unseen ad ids. Gradients flow to the override, not the table rows.
    override = batch.get("emb_override")
    if override:
        for name, vec in override.items():
            emb = emb.at[:, fe.feature_set.sparse_index(name), :].set(vec)
    out["emb"] = emb
    if with_linear:
        out["linear"] = lin
    if l2:
        # computed from the gathered values — no second lookup
        out["l2"] = fe.l2_from_sparse(emb)
    else:
        out["l2"] = jnp.asarray(0.0)
    return out


def behavior_inputs(fe: FusedEmbedding, emb_params: Params, batch,
                    candidate: Tuple[str, ...], behavior: Tuple[str, ...]):
    """Candidate vs behavior tensors for DIN-family models.

    The reference routes these by matching Keras tensor names inside
    ``ExtractLayer`` (interactive_layer.py:82-109); here the FeatureSet names
    them explicitly. Candidate = concat of the named sparse fields' embeddings
    (B, k·D); behavior = concat of the named seq fields' embeddings along the
    feature dim (B, L, k·D); mask = union of the per-seq masks.
    """
    fs = fe.feature_set
    cand_cols = [fs.sparse_index(n) for n in candidate]
    emb = fe.sparse(emb_params, batch["sparse"])  # (B, F, D)
    cand = jnp.concatenate([emb[:, c, :] for c in cand_cols], axis=-1)
    seqs, mask = [], None
    l2 = fe.l2_from_sparse(emb)
    for name in behavior:
        e, m = fe.seq(emb_params, name, batch["seq"][name])
        seqs.append(e)
        mask = m if mask is None else (mask | m)
        l2 = l2 + fe.l2_from_seq(name, e)
    beh = jnp.concatenate(seqs, axis=-1)
    return cand, beh, mask, l2, emb


def stateless(name: str, fs: FeatureSet, init_fn, fwd):
    """Wrap a (params, batch) forward into the Model API for models with no
    BatchNorm state."""

    def init(rng):
        return init_fn(rng), {}

    def apply(params, state, batch, *, train: bool = False, rng=None):
        logits, aux = fwd(params, batch, train)
        return logits, state, aux

    return Model(name=name, feature_set=fs, init=init, apply=apply)
