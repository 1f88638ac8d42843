"""Cold-start meta-embedding — "learning to learn" ID embeddings.

Implements the last unbuilt ID-only paper on the reference's Next-Read shelf
(``/root/reference/paper/Next Read/[Warm Up Cold-start Advertisements]
Improving CTR Predictions via Learning to Learn ID Embeddings[2019].pdf``,
Pan et al., SIGIR'19). The reference collects the PDF but has no cold-start
machinery anywhere (its embeddings are plain ``tf.keras.layers.Embedding``
rows, interactive_layer.py:189-247).

Design (paper's Meta-Embedding, adapted to the functional Model API):

- A **generator** maps an ad's attribute-field embeddings (every sparse
  field EXCEPT the target ID field, frozen via stop_gradient) to an initial
  embedding for the target ID. New ads therefore start from a learned,
  feature-conditioned point instead of the random/zero row.
- **Meta-training** simulates the cold-start transition on old ads with two
  minibatches (the paper's eq. 8-10): ``loss_a`` scores batch *a* with the
  generated embedding; one inner SGD step on the generated embedding
  (learning rate ``cold_lr``) produces the "after the first update" embedding,
  which scores batch *b* as ``loss_b``. The meta-objective
  ``alpha * loss_a + (1 - alpha) * loss_b`` trains the generator to be good
  both immediately (cold) and after warm-up — a first-order MAML on exactly
  one parameter tensor, which JAX expresses directly as grad-of-grad.
- The plumbing into any registry model is the ``emb_override`` batch entry
  honored by ``models.base.embed_inputs``: the generated (B, D) rows replace
  the target field's gathered rows, so EVERY interaction model works as the
  base model unmodified. NOTE: the override covers the CROSS embedding only —
  the (V, 1) first-order ("linear") weights of the target ids are NOT
  replaced; when simulating or serving genuinely new ads, also reset their
  rows in ``params["embedding"]["linear"]`` (see examples/coldstart_warmup.py).
- ``meta_loss``'s contract requires ``batch_a``/``batch_b`` to pair rows of
  the SAME ads positionally (the paper's D_a/D_b split per ad) —
  ``make_meta_batch_pairs`` builds such pairs from a dataset.

TPU notes: the inner step is one extra forward/backward over the same jitted
graph — no per-ad Python loops; everything is batched and static-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.base import split_rngs
from ..ops.core import MLP
from ..ops.embedding import FusedEmbedding
from ..train.metrics import bce_with_logits
from .base import Model


@dataclass(frozen=True)
class MetaEmbedding:
    """Meta-embedding generator for one target sparse ID field.

    ``generate`` is deterministic in the ad's attribute features, so all
    examples of one ad receive the same generated row (the paper's
    per-ad embedding), without any per-ad grouping machinery.
    """

    feature_set: FeatureSet
    target: str
    hidden: Tuple[int, ...] = (64,)

    def __post_init__(self):
        fs = self.feature_set
        if self.target not in [s.name for s in fs.sparse]:
            raise ValueError(f"target {self.target!r} is not a sparse field")

    def _mlp(self) -> MLP:
        fs = self.feature_set
        f, d = len(fs.sparse), fs.embed_dim
        # tanh output keeps generated rows in the scale of the 0.05-stddev
        # initialized tables (paper uses a bounded output for stability)
        return MLP((f - 1) * d, self.hidden, activation="relu", out_dim=d)

    def init(self, rng):
        return {"gen": self._mlp().init(split_rngs(rng, ["gen"])["gen"])}

    def generate(self, gen_params, emb_params, batch) -> jax.Array:
        """(B, D) generated target-ID embeddings from the OTHER fields'
        (frozen) embeddings of each example."""
        fs = self.feature_set
        fe = FusedEmbedding(fs)
        t = fs.sparse_index(self.target)
        emb = jax.lax.stop_gradient(fe.sparse(emb_params, batch["sparse"]))
        others = jnp.concatenate([emb[:, :t, :], emb[:, t + 1:, :]], axis=1)
        flat = others.reshape(others.shape[0], -1)
        out, _ = self._mlp()(gen_params["gen"], flat)
        return 0.05 * jnp.tanh(out)

    # ---- meta objective --------------------------------------------------

    def meta_loss(self, gen_params, model: Model, model_params, state,
                  batch_a, batch_b, cold_lr: float = 0.1,
                  alpha: float = 0.1) -> jax.Array:
        """The paper's two-phase objective on one (batch_a, batch_b) pair of
        the SAME ads: α·loss_a(generated) + (1−α)·loss_b(one SGD step later).
        Differentiable in ``gen_params`` (second-order term included —
        grad-of-grad through the inner step)."""

        def scored(batch, emb0):
            b = dict(batch)
            b["emb_override"] = {self.target: emb0}
            logits, _, aux = model.apply(model_params, state, b, train=True)
            loss = jnp.mean(bce_with_logits(logits, batch["label"]))
            return loss + sum(aux.values()) if aux else loss

        emb0 = self.generate(gen_params, model_params["embedding"], batch_a)
        loss_a, g = jax.value_and_grad(lambda e: scored(batch_a, e))(emb0)
        emb1 = emb0 - cold_lr * g
        loss_b = scored(batch_b, emb1)
        return alpha * loss_a + (1.0 - alpha) * loss_b

    def warm_rows(self, gen_params, emb_params, batch) -> jax.Array:
        """Serving-time initialization: generated rows for new target ids
        appearing in ``batch`` — write them into the table with
        ``table.at[global_ids].set(rows)`` before fine-tuning."""
        return self.generate(gen_params, emb_params, batch)


def make_meta_batch_pairs(data, fs: FeatureSet, target: str,
                          batch_size: int, seed: int = 0):
    """Aligned (batch_a, batch_b) minibatch pairs for ``meta_loss``: row i of
    batch_a and row i of batch_b are two DISJOINT examples of the SAME target
    ad id (the paper's per-ad D_a/D_b split). Ads with fewer than two
    examples are skipped (a single example cannot supply both phases).

    Yields full static-shape pairs only (tail dropped) — meta-training is a
    sampling loop, not an epoch sweep, so dropped rows return next pass."""
    import numpy as np

    t = fs.sparse_index(target)
    ids = np.asarray(data["sparse"])[:, t]
    rng = np.random.default_rng(seed)
    pairs = []  # (row_a, row_b) with equal ad id
    order = rng.permutation(len(ids))
    by_ad: dict = {}
    for i in order:
        by_ad.setdefault(ids[i], []).append(i)
    for rows in by_ad.values():
        for j in range(0, len(rows) - 1, 2):
            pairs.append((rows[j], rows[j + 1]))
    rng.shuffle(pairs)

    def take(rows):
        sl = np.asarray(rows)
        out = {}
        for k, v in data.items():
            if k == "seq":
                out["seq"] = {n: a[sl] for n, a in v.items()}
            else:
                out[k] = v[sl]
        out["weight"] = np.ones(len(sl), np.float32)
        return out

    for s in range(0, len(pairs) - batch_size + 1, batch_size):
        chunk = pairs[s:s + batch_size]
        yield take([a for a, _ in chunk]), take([b for _, b in chunk])


def make_meta_train_step(meta: MetaEmbedding, model: Model, optimizer,
                         cold_lr: float = 0.1, alpha: float = 0.1):
    """Jitted generator-training step over frozen base-model params."""

    def step(gen_params, opt_state, model_params, state, batch_a, batch_b):
        loss, grads = jax.value_and_grad(meta.meta_loss)(
            gen_params, model, model_params, state, batch_a, batch_b,
            cold_lr=cold_lr, alpha=alpha)
        updates, opt_state = optimizer.update(grads, opt_state, gen_params)
        gen_params = jax.tree_util.tree_map(lambda p, u: p + u, gen_params,
                                            updates)
        return gen_params, opt_state, loss

    return jax.jit(step, static_argnames=())
