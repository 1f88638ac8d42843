"""Extended feature-interaction family — the reference's "Next Read" shelf
(``/root/reference/paper/Next Read/``), built for real.

The reference collects these papers (CCPM, FGCNN, FLEN, ONN, FAT-DeepFFM,
Fi-GNN, PS-PLM) as PDFs next to its zoo but implements none of them; this
module is the TPU-native implementation of that roadmap. Conventions match
``models/interaction.py``: every constructor takes a ``FeatureSet``, shares
the fused embedding store, and returns a single-logit ``Model``.

TPU notes: convolutions (CCPM/FGCNN) run as ``lax.conv_general_dilated`` on
the MXU with static shapes; flexible p-max pooling is ``top_k`` + index sort
(order-preserving, no dynamic shapes); Fi-GNN's propagation is a fixed-T
unrolled loop of one Gram-attention einsum + a shared GRU cell.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.schema import FeatureSet
from ..ops.base import (Params, bf16_matmul, glorot_uniform, normal_init,
                        split_rngs, zeros)
from ..ops.core import MLP, Dense, flatten_concat
from ..ops.embedding import FusedEmbedding, gather_rows
from ..ops.interactions import LinearUnit, pairwise_inner_products
from ..ops.recurrent import GRU
from .base import Model, embed_inputs, stateless
from .interaction import _dims, _first_order, _maybe_dense_linear


# ---------------------------------------------------------------------------
# CCPM — A Convolutional Click Prediction Model (CIKM 2015)
# ---------------------------------------------------------------------------


def _p_max_pool(x: jax.Array, k: int) -> jax.Array:
    """Order-preserving per-channel top-k over the field axis.

    x: (B, W, C) → (B, k, C). CCPM's flexible p-max pooling: keep the k
    largest responses per channel IN THEIR ORIGINAL ORDER (top_k indices,
    sorted ascending, gathered) — static shapes throughout.
    """
    xt = jnp.swapaxes(x, 1, 2)                    # (B, C, W)
    _, idx = jax.lax.top_k(xt, k)                 # (B, C, k)
    idx = jnp.sort(idx, axis=-1)                  # restore temporal order
    pooled = jnp.take_along_axis(xt, idx, axis=-1)
    return jnp.swapaxes(pooled, 1, 2)             # (B, k, C)


def CCPM(fs: FeatureSet,
         channels: Tuple[int, ...] = (4, 4),
         widths: Tuple[int, ...] = (3, 3),
         hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """Convolutional Click Prediction Model (Liu et al., CIKM 2015 — "A
    Convolutional Click Prediction Model.pdf" on the Next-Read shelf).

    The field-embedding matrix (B, F, D) is a length-F sequence with D
    channels; conv layers (width w_i, c_i maps) + flexible p-max pooling
    shrink it level by level (p_i = ceil((1 − (i/n)^(n−i))·F), final level
    keeps 3); the last maps flatten into an MLP. Convs are MXU matmuls via
    ``conv_general_dilated``.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    n = len(channels)
    # per-level pool sizes (paper's schedule), monotone non-increasing
    sizes = []
    cur = f
    for i in range(1, n + 1):
        p = f if i == n else int(np.ceil((1 - (i / n) ** (n - i)) * f))
        cur = 3 if i == n else max(3, min(cur, p))
        sizes.append(cur)
    in_ch = [d] + list(channels[:-1])
    mlp = MLP(sizes[-1] * channels[-1] + nd, hidden, activation="relu",
              out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "dense_linear"]
                          + [f"conv{i}" for i in range(n)])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "bias": zeros(())}
        for i in range(n):
            p[f"conv{i}"] = glorot_uniform(
                rngs[f"conv{i}"], (widths[i], in_ch[i], channels[i]))
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        x = inp["emb"]                              # (B, F, D) = NWC
        for i in range(n):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}"], window_strides=(1,),
                padding="SAME", dimension_numbers=("NWC", "WIO", "NWC"))
            x = jnp.tanh(x)
            x = _p_max_pool(x, min(sizes[i], x.shape[1]))
        h = x.reshape(x.shape[0], -1)
        if nd:
            h = jnp.concatenate([h, inp["dense"]], axis=-1)
        deep, _ = mlp(params["mlp"], h)
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("CCPM", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# FGCNN — Feature Generation by CNN (WWW 2019)
# ---------------------------------------------------------------------------


def FGCNN(fs: FeatureSet,
          channels: Tuple[int, ...] = (6, 8),
          kernel_heights: Tuple[int, ...] = (7, 7),
          pool_sizes: Tuple[int, ...] = (2, 2),
          new_maps: Tuple[int, ...] = (3, 3),
          hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """Feature Generation by CNN (Liu et al., WWW 2019 — "[FGCNN]" pdf on
    the Next-Read shelf).

    CNN over the (F × D) embedding image (kernels h×1 along the field axis,
    weights shared across embedding dims), max-pooling per level, and a
    RECOMBINATION dense layer per level that mixes (fields × channels) into
    ``new_maps`` generated feature embeddings. Original + generated fields
    then feed an IPNN-style head: pairwise inner products + deep tower.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    n = len(channels)
    in_ch = [1] + list(channels[:-1])
    # effective pool sizes: never larger than the current field count
    cur, pools, rec_in = f, [], []
    total_new = 0
    for i in range(n):
        pools.append(min(pool_sizes[i], cur))
        cur = max(1, cur // pools[i])
        rec_in.append(cur * channels[i])
        total_new += new_maps[i]
    ft = f + total_new
    pairs = ft * (ft - 1) // 2
    mlp = MLP(ft * d + pairs + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "dense_linear"]
                          + [f"conv{i}" for i in range(n)]
                          + [f"rec{i}" for i in range(n)])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "bias": zeros(())}
        for i in range(n):
            p[f"conv{i}"] = glorot_uniform(
                rngs[f"conv{i}"], (kernel_heights[i], 1, in_ch[i], channels[i]))
            p[f"rec{i}"] = Dense(rec_in[i], new_maps[i] * 1).init(rngs[f"rec{i}"])
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        e = inp["emb"]                                  # (B, F, D)
        x = e[..., None]                                # NHWC: (B, F, D, 1)
        gen = []
        for i in range(n):
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}"], window_strides=(1, 1),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.tanh(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, pools[i], 1, 1), (1, pools[i], 1, 1), "VALID")
            # recombination: mix (fields_i × channels_i) → new_maps_i fields,
            # shared across embedding dims
            b, fi, dd, ci = x.shape
            flat = jnp.swapaxes(x, 1, 2).reshape(b, dd, fi * ci)
            new = jnp.tanh(Dense(fi * ci, new_maps[i])(params[f"rec{i}"], flat))
            gen.append(jnp.swapaxes(new, 1, 2))          # (B, new_i, D)
        fields = jnp.concatenate([e] + gen, axis=1)      # (B, F', D)
        parts = [fields.reshape(fields.shape[0], -1),
                 pairwise_inner_products(fields)]
        if nd:
            parts.append(inp["dense"])
        deep, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("FGCNN", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# FLEN — field-leveraged embedding network (2019)
# ---------------------------------------------------------------------------


def FLEN(fs: FeatureSet,
         groups: Optional[Tuple[Tuple[str, ...], ...]] = None,
         hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """FLEN (Chen et al. 2019 — "[FLEN] Leveraging Field for Scalable CTR
    Predicti" pdf on the Next-Read shelf).

    Fields are partitioned into groups (user/item/context in the paper;
    default: 3 contiguous groups). The field-wise bi-interaction computes
    - MF module: inter-group ⟨s_m, s_n⟩ Hadamard products of group sums;
    - FM module: intra-group bi-interaction (square-of-sum − sum-of-squares)
      summed over groups;
    both O(F·D) — the group structure removes the quadratic blowup, which is
    the paper's scalability claim. Concat [deep(flat emb), FM, MF] → head.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    if groups is None:
        names = [s.name for s in fs.sparse]
        k = max(1, len(names) // 3)
        groups = (tuple(names[:k]), tuple(names[k:2 * k]),
                  tuple(names[2 * k:]))
    groups = tuple(g for g in groups if g)
    idx_groups = [jnp.asarray([fs.sparse_index(n) for n in g]) for g in groups]
    m = len(groups)
    n_pairs = m * (m - 1) // 2
    mlp = MLP(f * d + nd, hidden, activation="relu")
    head = Dense(hidden[-1] + d + n_pairs * d, 1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "head", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "head": head.init(rngs["head"]), "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        e = inp["emb"]
        sums = [jnp.sum(e[:, g, :], axis=1) for g in idx_groups]     # (B, D)
        sqs = [jnp.sum(jnp.square(e[:, g, :]), axis=1) for g in idx_groups]
        # FM: intra-group bi-interaction, summed over groups
        fm_vec = 0.5 * sum(jnp.square(s) - q for s, q in zip(sums, sqs))
        # MF: inter-group Hadamard products
        mf = [sums[i] * sums[j] for i in range(m) for j in range(i + 1, m)]
        h = flatten_concat([e] + ([inp["dense"]] if nd else []))
        deep, _ = mlp(params["mlp"], h)
        z = jnp.concatenate([deep, fm_vec] + mf, axis=-1)
        logit = (_first_order(params, inp) + head(params["head"], z)[:, 0]
                 + params["bias"])
        return logit, {"emb_l2": inp["l2"]}

    return stateless("FLEN", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# ONN / NFFM — operation-aware neural network (2019)
# ---------------------------------------------------------------------------


def ONN(fs: FeatureSet, ffm_dim: int = 4,
        hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """Operation-aware Neural Network (Yang et al. 2019 — "[ONN]" pdf on the
    Next-Read shelf; a.k.a. NFFM).

    Each feature keeps a distinct embedding per operation: one "copy"
    embedding for the deep tower plus FFM-style per-target-field embeddings
    for every pairwise product. Pair (i, j) contributes
    ⟨v_{i→fj}, v_{j→fi}⟩; [copy embeddings, pair dots] → MLP. One (V, F·K)
    table serves all F² operation blocks in a single fused gather (FFM
    storage trick, models/interaction.py FFM).
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    k = ffm_dim
    pairs = f * (f - 1) // 2
    emb_l2 = jnp.asarray([s.emb_l2 for s in fs.sparse], jnp.float32)
    mlp = MLP(f * d + pairs + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "ffm", "mlp", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]),
             "ffm": normal_init(rngs["ffm"], (fs.total_vocab, f * k), 0.05),
             "mlp": mlp.init(rngs["mlp"]), "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        gids = batch["sparse"] + jnp.asarray(fs.sparse_offsets())[None, :]
        rows = gather_rows(params["ffm"], gids, tape_key="ffm")  # (B, F, F·K)
        e = rows.reshape(rows.shape[0], f, f, k)
        t = jnp.sum(e * jnp.swapaxes(e, 1, 2), axis=-1)   # (B, F, F)
        iu, ju = np.triu_indices(f, k=1)
        pair_feats = t[:, iu, ju]                         # (B, P)
        parts = [flatten_concat([inp["emb"]]), pair_feats]
        if nd:
            parts.append(inp["dense"])
        deep, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        l2 = inp["l2"] + jnp.sum(emb_l2 * jnp.sum(jnp.square(rows),
                                                  axis=(0, 2)))
        return logit, {"emb_l2": l2}

    return stateless("ONN", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# FAT-DeepFFM — field-attentive DeepFFM (2019)
# ---------------------------------------------------------------------------


def FATDeepFFM(fs: FeatureSet, ffm_dim: int = 4, reduction: int = 2,
               hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """FAT-DeepFFM (Zhang et al. 2019 — "[FAT-DeepFFM] Field Attentive Deep
    Field-aware Factorization Machine" pdf on the Next-Read shelf).

    CENet field attention (an SE block: squeeze each field's F·K operation
    block to a scalar by mean, two-layer excitation, sigmoid rescale)
    modulates the FFM embedding matrix BEFORE the pairwise Hadamard
    products; the attended pair products feed the deep tower.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    k = ffm_dim
    pairs = f * (f - 1) // 2
    mid = max(1, f // reduction)
    emb_l2 = jnp.asarray([s.emb_l2 for s in fs.sparse], jnp.float32)
    mlp = MLP(pairs * k + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "ffm", "se1", "se2", "mlp",
                                "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]),
             "ffm": normal_init(rngs["ffm"], (fs.total_vocab, f * k), 0.05),
             "se1": Dense(f, mid).init(rngs["se1"]),
             "se2": Dense(mid, f).init(rngs["se2"]),
             "mlp": mlp.init(rngs["mlp"]), "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        gids = batch["sparse"] + jnp.asarray(fs.sparse_offsets())[None, :]
        rows = gather_rows(params["ffm"], gids, tape_key="ffm")  # (B, F, F·K)
        # CENet: squeeze → excite → rescale fields
        zsq = jnp.mean(rows, axis=-1)                     # (B, F)
        a = jax.nn.relu(Dense(f, mid)(params["se1"], zsq))
        a = jax.nn.sigmoid(Dense(mid, f)(params["se2"], a))
        rows = rows * a[..., None]
        e = rows.reshape(rows.shape[0], f, f, k)
        had = e * jnp.swapaxes(e, 1, 2)                   # (B, F, F, K)
        iu, ju = np.triu_indices(f, k=1)
        pair_feats = had[:, iu, ju, :].reshape(rows.shape[0], -1)
        parts = [pair_feats]
        if nd:
            parts.append(inp["dense"])
        deep, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        l2 = inp["l2"] + jnp.sum(emb_l2 * jnp.sum(jnp.square(rows),
                                                  axis=(0, 2)))
        return logit, {"emb_l2": l2}

    return stateless("FATDeepFFM", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# Fi-GNN — field interactions as a graph (CIKM 2019)
# ---------------------------------------------------------------------------


def FiGNN(fs: FeatureSet, steps: int = 2,
          num_heads: int = 2) -> Model:
    """Fi-GNN (Li et al., CIKM 2019 — "[Fi-GNN] Modeling Feature
    Interactions via Graph Neural Networks" pdf on the Next-Read shelf).

    Fields form a complete graph. Edge weights are Gram attention over the
    (self-attention-refined) field embeddings; ``steps`` propagation rounds
    each aggregate neighbor messages (one einsum) and update node state with
    a shared GRU cell + residual. Readout: per-node attentional scoring
    (ŷ = Σ_i σ(a_i)·w(h_i)) — the paper's attentional scoring layer.
    """
    from ..ops.attention import MultiHeadAttention

    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    mha = MultiHeadAttention(d, num_heads)
    cell = GRU(d, d)
    eye = jnp.eye(f, dtype=bool)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mha", "wmsg", "cell", "score",
                                "attn", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]),
             "mha": mha.init(rngs["mha"]),
             "wmsg": glorot_uniform(rngs["wmsg"], (d, d)),
             "cell": cell.init(rngs["cell"]),
             "score": Dense(d, 1).init(rngs["score"]),
             "attn": Dense(d, 1).init(rngs["attn"]),
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        e = mha(params["mha"], inp["emb"])                # refined (B, F, D)
        # complete-graph edge attention from initial states (no self loops)
        logits = jnp.einsum("bfd,bgd->bfg", e, e) / np.sqrt(d)
        logits = jnp.where(eye[None], -1e9, logits)
        adj = jax.nn.softmax(logits, axis=-1)             # (B, F, F)
        h = e
        b = e.shape[0]
        ones = jnp.ones((b * f,), bool)
        for _ in range(steps):
            msg = jnp.einsum("bfg,bgd->bfd", adj,
                             bf16_matmul(h, params["wmsg"]))
            xw = (bf16_matmul(msg.reshape(b * f, d), params["cell"]["wx"])
                  + params["cell"]["b"])
            h_new = cell._step(params["cell"], h.reshape(b * f, d), xw, ones)
            h = h_new.reshape(b, f, d) + e                # residual to input
        score = Dense(d, 1)(params["score"], h)[..., 0]   # (B, F)
        gate = jax.nn.sigmoid(Dense(d, 1)(params["attn"], h)[..., 0])
        logit = jnp.sum(gate * score, axis=-1)
        logit = logit + _first_order(params, inp) + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("FiGNN", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# MLR / PS-PLM — piece-wise linear model (Alibaba 2017)
# ---------------------------------------------------------------------------


def MLR(fs: FeatureSet, regions: int = 4) -> Model:
    """Mixed/piece-wise Linear Model (Gai et al. 2017 — "[PS-PLM] Learning
    Piece-wise Linear Models from Large Scale Data" pdf on the Next-Read
    shelf). Alibaba's pre-deep-CTR workhorse:

        p(x) = Σ_m softmax(Uᵀx)_m · σ(Wᵀx)_m

    a soft partition into ``regions`` regions, each with its own logistic
    scorer. Returned as a logit (log p − log(1−p)) to fit the single-logit
    Model API; two matmuls total.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    x_dim = f * d + nd

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "u", "w", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]),
             "u": Dense(x_dim, regions).init(rngs["u"]),
             "w": Dense(x_dim, regions).init(rngs["w"])}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        x = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        region = jax.nn.softmax(Dense(x_dim, regions)(params["u"], x), -1)
        scorer = jax.nn.sigmoid(Dense(x_dim, regions)(params["w"], x))
        prob = jnp.clip(jnp.sum(region * scorer, axis=-1), 1e-6, 1 - 1e-6)
        logit = jnp.log(prob) - jnp.log1p(-prob)
        return logit, {"emb_l2": inp["l2"]}

    return stateless("MLR", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# OENN — Order-aware Embedding Neural Network (SIGIR 2019)
# ---------------------------------------------------------------------------


def OENN(fs: FeatureSet, max_order: int = 3,
         hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """OENN (Guo et al. 2019 — "[OENN] Order-aware Embedding Neural Network
    for CTR Predicti" pdf on the Next-Read shelf).

    The paper's point: one embedding per feature cannot serve every
    interaction order, so each feature keeps a DISTINCT embedding table per
    order k, and the order-k signal is built only from the order-k
    embeddings. Divergence from the paper's construction (documented): the
    paper concatenates every k-combination's Hadamard product (O(F^k · D)
    inputs); here each order's combination sum is computed in closed form
    via elementary-symmetric-polynomial identities over the per-order
    power sums — Σ_{i<j} e_i∘e_j = (s₁²−s₂)/2 and
    Σ_{i<j<l} e_i∘e_j∘e_l = (s₁³−3s₁s₂+2s₃)/6 with s_p = Σ_i e_i^∘p —
    O(F·D) per order, MXU/VPU-friendly, no combinatorial blowup at F=26
    Criteo fields. Concat [order-1 flat, order-2 vec, order-3 vec, dense]
    → MLP."""
    if not 2 <= max_order <= 3:
        raise ValueError("max_order must be 2 or 3")
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    emb_l2 = jnp.asarray([s.emb_l2 for s in fs.sparse], jnp.float32)
    mlp = MLP(f * d + (max_order - 1) * d + nd, hidden, activation="relu",
              out_dim=1)

    def init_fn(rng):
        names = ["emb", "mlp", "dense_linear"] + [
            f"order{k}" for k in range(2, max_order + 1)]
        rngs = split_rngs(rng, names)
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "bias": zeros(())}
        for k in range(2, max_order + 1):
            p[f"order{k}"] = normal_init(rngs[f"order{k}"],
                                         (fs.total_vocab, d), 0.05)
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        gids = batch["sparse"] + jnp.asarray(fs.sparse_offsets())[None, :]
        parts = [inp["emb"].reshape(inp["emb"].shape[0], -1)]
        l2 = inp["l2"]
        for k in range(2, max_order + 1):
            e = gather_rows(params[f"order{k}"], gids,
                            tape_key=f"order{k}")    # (B, F, D)
            s1 = jnp.sum(e, axis=1)
            s2 = jnp.sum(jnp.square(e), axis=1)
            if k == 2:
                vec = 0.5 * (jnp.square(s1) - s2)
            else:
                s3 = jnp.sum(e * e * e, axis=1)
                vec = (s1 ** 3 - 3.0 * s1 * s2 + 2.0 * s3) / 6.0
            parts.append(vec)
            l2 = l2 + jnp.sum(emb_l2 * jnp.sum(jnp.square(e), axis=(0, 2)))
        if nd:
            parts.append(inp["dense"])
        deep, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        return logit, {"emb_l2": l2}

    return stateless("OENN", fs, init_fn, fwd)
