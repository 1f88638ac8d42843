"""DICM — image-aware CTR (the last unbuilt paper on the reference's shelf:
``/root/reference/paper/Next Read/[Image CTR] Image Matters - Visually
modeling user behaviors using Advanced Model Server (Alibaba 2018).pdf``).
The reference collects the PDF only; it has no image modality anywhere.

The paper's serving shape, TPU-native:

- images enter as PRE-EXTRACTED feature vectors (the paper uses VGG16 fc
  activations; extraction is an offline/CNN-server concern — exactly the
  "Advanced Model Server" split: the training/serving workers never touch
  raw pixels, only compact per-image vectors);
- one shared **image embedding sub-model** (MLP tower) projects the ad
  image and every behavior image into the id-embedding space — this tower
  is the AMS sub-model; on TPU it is a single batched matmul over
  (B·(L+1), img_dim), MXU-shaped, instead of the paper's parameter-server
  round trips;
- user visual preference = attention pooling of the behavior image
  embeddings against the AD image embedding (the paper's attentive
  aggregation), masked by the behavior ids' padding mask;
- final MLP over [id embeddings, ad image emb, pooled behavior image emb,
  dense].

Batch contract (arrays ride the normal pipeline; ``iter_batches`` slices
them like any feature):
- ``batch["image"]``: (B, img_dim) ad image features;
- ``batch["hist_image"]``: (B, L, img_dim) behavior image features, row t
  aligned with ``batch["seq"][behavior[0]]``'s step t (pad steps ignored).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.base import split_rngs
from ..ops.core import MLP, Dense
from ..ops.embedding import FusedEmbedding
from .base import Model, behavior_inputs, stateless
from .sequence import _beh_dims, _other_sparse


def DICM(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         img_dim: int = 64,
         img_tower: Tuple[int, ...] = (64,),
         attention_hidden: Tuple[int, ...] = (36, 1),
         hidden: Tuple[int, ...] = (200, 80)) -> Model:
    """Deep Image CTR Model: DIN-style id path + shared image tower +
    ad-image-queried attention over behavior images."""
    from ..ops.attention import TargetAttention

    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    emb_img = img_tower[-1]
    tower = MLP(img_dim, img_tower[:-1], activation="relu",
                out_dim=emb_img)
    id_attn = TargetAttention(kd, attention_hidden, activation="sigmoid")
    img_attn = TargetAttention(emb_img, attention_hidden,
                               activation="sigmoid")
    in_dim = kd * 2 + emb_img * 2 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="dice", norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "tower", "id_attn", "img_attn",
                                "mlp"])
        return {"embedding": fe.init(rngs["emb"]),
                "tower": tower.init(rngs["tower"]),
                "id_attn": id_attn.init(rngs["id_attn"]),
                "img_attn": img_attn.init(rngs["img_attn"]),
                "mlp": mlp.init(rngs["mlp"])}

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        # shared image sub-model over ad + behavior images in ONE batched
        # matmul (the AMS tower)
        ad_img = batch["image"]                      # (B, img_dim)
        hist_img = batch["hist_image"]               # (B, L, img_dim)
        b = ad_img.shape[0]
        stacked = jnp.concatenate(
            [ad_img[:, None, :], hist_img], axis=1)  # (B, L+1, img_dim)
        projected, _ = tower(params["tower"],
                             stacked.reshape(b * (L + 1), img_dim))
        projected = projected.reshape(b, L + 1, emb_img)
        ad_e, hist_e = projected[:, 0], projected[:, 1:]
        hist_e = hist_e * mask[..., None]
        pooled_img = img_attn(params["img_attn"], ad_e, hist_e, mask)
        pooled_id = id_attn(params["id_attn"], cand, beh, mask)

        parts = [cand, pooled_id, ad_e, pooled_img]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"emb_l2": l2}

    return stateless("DICM", fs, init_fn, fwd)
