"""Feature-interaction model family.

TPU-native counterparts of the reference constructors in
``kon/model/ctr_model/model/models.py``: FM (:36), PNN (:43), DeepCross (:58),
Wide&Deep (:69), DeepFM (:80), DCN (:92), NFM (:108), xDeepFM (:121),
AFM (:141), AutoInt (:150). Built to the papers' semantics (the reference is
"connectivity-tested", not a reproduction — its README says so at
``kon/model/ctr_model/README.md:41``); every model shares one fused embedding
table pair and emits a single logit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.schema import FeatureSet
from ..ops.attention import MultiHeadAttention
from ..ops.base import normal_init, split_rngs, zeros
from ..ops.core import MLP, Dense, flatten_concat
from ..ops.embedding import FusedEmbedding, gather_rows
from ..ops.interactions import (AFMAttention, CIN, CrossNet, CrossNetMix,
                                LinearUnit, OuterProduct, fm_interaction,
                                fm_interaction_vector, pairwise_inner_products,
                                pairwise_products)
from .base import Model, embed_inputs, stateless


def _dims(fs: FeatureSet):
    f = len(fs.sparse)
    d = fs.embed_dim
    nd = len(fs.dense)
    return f, d, nd


def _first_order(params, inp):
    """linear sparse terms + optional dense linear: (B,) logit part."""
    lo = jnp.sum(inp["linear"], axis=1)
    if inp["dense"] is not None and inp["dense"].shape[-1] > 0:
        lo = lo + LinearUnit(inp["dense"].shape[-1])(params["dense_linear"],
                                                     inp["dense"])
    return lo


def _maybe_dense_linear(fs, rngs):
    if len(fs.dense):
        return {"dense_linear": LinearUnit(len(fs.dense)).init(rngs["dense_linear"])}
    return {}


def FM(fs: FeatureSet) -> Model:
    """Factorization Machine (reference ``FM``, models.py:36-41)."""
    fe = FusedEmbedding(fs)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        logit = _first_order(params, inp) + fm_interaction(inp["emb"]) + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("FM", fs, init_fn, fwd)


def FFM(fs: FeatureSet, ffm_dim: int = 4) -> Model:
    """Field-aware FM (Juan et al. 2016). Not in the reference's zoo (its
    lineage stops at FM, models.py:36-41) but mandated by BASELINE.json's
    north star ("FM/FFM second-order terms").

    Each feature value carries F per-field embedding blocks; pair (i, j)
    interacts v_{i, field j} · v_{j, field i}. TPU design: ONE (V, F·K)
    table so all F² blocks arrive in a single fused gather (per-row gather
    cost — PERF.md), and the pair reduction is an elementwise multiply with
    the (i, j)-transposed blocks + strict-upper-triangle sum — no pair loop,
    no dynamic shapes.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    k = ffm_dim
    emb_l2 = jnp.asarray([s.emb_l2 for s in fs.sparse], jnp.float32)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "ffm", "dense_linear"])
        p = {"embedding": {"linear": fe.init(rngs["emb"])["linear"]},
             "ffm": normal_init(rngs["ffm"], (fs.total_vocab, f * k),
                                stddev=0.05),
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        ids = batch["sparse"]
        gids = ids + jnp.asarray(fs.sparse_offsets())[None, :]
        lin = gather_rows(params["embedding"]["linear"], gids,
                          tape_key="linear")[..., 0]
        rows = gather_rows(params["ffm"], gids, tape_key="ffm")  # (B, F, F·K)
        e = rows.reshape(rows.shape[0], f, f, k)          # e[b,i,j] = v_{i,fj}
        t = jnp.sum(e * jnp.swapaxes(e, 1, 2), axis=-1)   # t[b,i,j]=v_{i,fj}·v_{j,fi}
        diag = jnp.sum(jnp.diagonal(t, axis1=1, axis2=2), axis=-1)
        second = 0.5 * (jnp.sum(t, axis=(1, 2)) - diag)
        inp = {"dense": batch.get("dense"), "linear": lin}
        logit = _first_order(params, inp) + second + params["bias"]
        l2 = jnp.sum(emb_l2 * jnp.sum(jnp.square(rows), axis=(0, 2)))
        return logit, {"emb_l2": l2}

    return stateless("FFM", fs, init_fn, fwd)


def FwFM(fs: FeatureSet, hidden: Optional[Tuple[int, ...]] = None) -> Model:
    """Field-weighted FM (Pan et al. 2018): logit = first-order +
    Σ_{i<j} r_{ij} ⟨v_i, v_j⟩ with a learned field-pair strength matrix —
    FFM quality at FM parameter cost. Shares the fused embedding store;
    the pair dots are one Gram einsum (MXU). ``hidden`` adds a DeepFwFM
    tower over the flattened embeddings."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    triu = jnp.triu(jnp.ones((f, f), jnp.float32), k=1)
    mlp = MLP(f * d + nd, hidden, activation="relu", out_dim=1) if hidden else None

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "r", "mlp", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]),
             "field_r": normal_init(rngs["r"], (f, f), stddev=0.1),
             "bias": zeros(())}
        if mlp:
            p["mlp"] = mlp.init(rngs["mlp"])
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        e = inp["emb"]
        gram = jnp.einsum("bid,bjd->bij", e, e)
        second = jnp.sum(gram * (params["field_r"] * triu), axis=(1, 2))
        logit = _first_order(params, inp) + second + params["bias"]
        if mlp:
            h = flatten_concat([e] + ([inp["dense"]] if nd else []))
            logit = logit + mlp(params["mlp"], h)[0][:, 0]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("FwFM", fs, init_fn, fwd)


def PNN(fs: FeatureSet, hidden: Tuple[int, ...] = (128, 64),
        use_inner: bool = True, use_outer: bool = True) -> Model:
    """Product-based NN (reference ``PNN``, models.py:43-56): linear signal z
    ⊕ inner products ⊕ outer product → DNN → logit."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    n_pairs = f * (f - 1) // 2
    in_dim = f * d + nd + (n_pairs if use_inner else 0) + (d * d if use_outer else 0)
    mlp = MLP(in_dim, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "outer"])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"])}
        if use_outer:
            p["outer"] = {"kernel": OuterProduct(d, d * d).init(rngs["outer"])["kernel"]}
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        e = inp["emb"]
        parts = [e.reshape(e.shape[0], -1)]
        if inp["dense"] is not None and inp["dense"].shape[-1] > 0:
            parts.append(inp["dense"])
        if use_inner:
            parts.append(pairwise_inner_products(e))
        if use_outer:
            p_sum = jnp.sum(e, axis=1)
            parts.append(jnp.einsum("bi,bj->bij", p_sum, p_sum
                                    ).reshape(e.shape[0], -1))
        h = jnp.concatenate(parts, axis=-1)
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"emb_l2": inp["l2"]}

    return stateless("PNN", fs, init_fn, fwd)


def DeepCross(fs: FeatureSet, hidden: Tuple[int, ...] = (256, 128, 64),
              res_every: int = 2) -> Model:
    """Deep Crossing-style residual MLP (reference ``DeepCross``,
    models.py:58-67 — whose body is accidentally indented under an ``if``;
    built here as intended)."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    mlp = MLP(f * d + nd, hidden, activation="relu", res_every=res_every,
              out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp"])
        return {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"])}

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        h = flatten_concat([inp["emb"]] + (
            [inp["dense"]] if nd else []))
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"emb_l2": inp["l2"]}

    return stateless("DeepCross", fs, init_fn, fwd)


def WideDeep(fs: FeatureSet, hidden: Tuple[int, ...] = (256, 128, 64)) -> Model:
    """Wide & Deep (reference ``Wide_Deep``, models.py:69-78): wide linear
    part + deep MLP, joint single logit."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    mlp = MLP(f * d + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        h = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        deep, _ = mlp(params["mlp"], h)
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("WideDeep", fs, init_fn, fwd)


def DeepFM(fs: FeatureSet, hidden: Tuple[int, ...] = (256, 128, 64)) -> Model:
    """DeepFM (reference ``DeepFM``, models.py:80-90): FM + deep tower over
    SHARED embeddings; logit = first-order + FM second-order + MLP."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    mlp = MLP(f * d + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        h = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        deep, _ = mlp(params["mlp"], h)
        logit = (_first_order(params, inp) + fm_interaction(inp["emb"])
                 + deep[:, 0] + params["bias"])
        return logit, {"emb_l2": inp["l2"]}

    return stateless("DeepFM", fs, init_fn, fwd)


def DCN(fs: FeatureSet, cross_depth: int = 3,
        hidden: Tuple[int, ...] = (256, 128), version: int = 1) -> Model:
    """Deep & Cross (reference ``DCN``, models.py:92-106, cross_hidden=3).
    ``version=2`` switches to DCN-v2 full-matrix cross layers."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    x_dim = f * d + nd
    cross = (CrossNet if version == 1 else CrossNetMix)(x_dim, cross_depth)
    mlp = MLP(x_dim, hidden, activation="relu")
    head = Dense(x_dim + hidden[-1], 1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "cross", "mlp", "head"])
        return {"embedding": fe.init(rngs["emb"]),
                "cross": cross.init(rngs["cross"]),
                "mlp": mlp.init(rngs["mlp"]),
                "head": head.init(rngs["head"])}

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        x0 = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        xc = cross(params["cross"], x0)
        xd, _ = mlp(params["mlp"], x0)
        logit = head(params["head"], jnp.concatenate([xc, xd], axis=-1))
        return logit[:, 0], {"emb_l2": inp["l2"]}

    return stateless("DCN", fs, init_fn, fwd)


def NFM(fs: FeatureSet, hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """Neural FM (reference ``NFM``, models.py:108-119): bi-interaction
    pooling → DNN; + first-order terms."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    mlp = MLP(d + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        bi = fm_interaction_vector(inp["emb"])
        h = jnp.concatenate([bi] + ([inp["dense"]] if nd else []), axis=-1)
        deep, _ = mlp(params["mlp"], h)
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("NFM", fs, init_fn, fwd)


def xDeepFM(fs: FeatureSet, cin_hidden: Tuple[int, ...] = (128, 128),
            hidden: Tuple[int, ...] = (256, 128),
            cin_kernel: str = "auto") -> Model:
    """xDeepFM (reference ``XDeepFM``, models.py:121-138): CIN ⊕ DNN ⊕ linear
    summed into one logit (reference ScoreLayer add-merge). ``cin_kernel``:
    'auto' | 'pallas' | 'off' (ops/kernels/cin.py fused layer)."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    cin = CIN(f, d, cin_hidden, out_logit=True, kernel=cin_kernel)
    mlp = MLP(f * d + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "cin", "mlp", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "cin": cin.init(rngs["cin"]),
             "mlp": mlp.init(rngs["mlp"]), "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        h = flatten_concat([inp["emb"]] + ([inp["dense"]] if nd else []))
        deep, _ = mlp(params["mlp"], h)
        logit = (_first_order(params, inp) + cin(params["cin"], inp["emb"])
                 + deep[:, 0] + params["bias"])
        return logit, {"emb_l2": inp["l2"]}

    return stateless("xDeepFM", fs, init_fn, fwd)


def AFM(fs: FeatureSet, attn_dim: int = 16) -> Model:
    """Attentional FM (reference ``AFM``, models.py:141-147)."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    attn = AFMAttention(d, attn_dim)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "attn", "dense_linear"])
        p = {"embedding": fe.init(rngs["emb"]), "attn": attn.init(rngs["attn"]),
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        pp = pairwise_products(inp["emb"])
        logit = (_first_order(params, inp) + attn(params["attn"], pp)
                 + params["bias"])
        return logit, {"emb_l2": inp["l2"]}

    return stateless("AFM", fs, init_fn, fwd)


def FiBiNET(fs: FeatureSet, reduction: int = 3,
            bilinear_type: str = "each",
            hidden: Tuple[int, ...] = (128, 64)) -> Model:
    """FiBiNET (Huang et al. 2019). On the reference's own roadmap — its
    "Next Building" checklist lists the FiBiNET paper as [reading]
    (``kon/model/ctr_model/README.md``, Next Building §3) but it was never
    built; implemented here to the paper's semantics.

    SENET squeeze-excitation reweights the field embeddings, then a bilinear
    interaction layer crosses every field pair through a learned (D, D)
    kernel — applied to BOTH the raw and the SENET-reweighted embeddings —
    and the concatenated pair vectors feed a DNN. TPU design: the pair
    products are gathered with static triu index arrays (no Python pair
    loop inside jit), and ``bilinear_type='each'`` runs all per-field
    kernels as one ``bfd,fde->bfe`` einsum on the MXU.
    """
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    if bilinear_type not in ("all", "each"):
        raise ValueError(f"bilinear_type {bilinear_type!r} not in "
                         "('all', 'each')")
    iu, ju = np.triu_indices(f, k=1)
    iu, ju = jnp.asarray(iu), jnp.asarray(ju)
    n_pairs = f * (f - 1) // 2
    se_mid = max(1, f // reduction)
    mlp = MLP(2 * n_pairs * d + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "se1", "se2", "w", "mlp",
                                "dense_linear"])
        kshape = (d, d) if bilinear_type == "all" else (f, d, d)
        p = {"embedding": fe.init(rngs["emb"]),
             "se": {"w1": normal_init(rngs["se1"], (f, se_mid), stddev=0.1),
                    "w2": normal_init(rngs["se2"], (se_mid, f), stddev=0.1)},
             "bilinear_w": normal_init(rngs["w"], kshape, stddev=0.05),
             "mlp": mlp.init(rngs["mlp"]), "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def bilinear(w, e):
        if bilinear_type == "all":
            t = jnp.einsum("bfd,de->bfe", e, w)
        else:
            t = jnp.einsum("bfd,fde->bfe", e, w)
        return (t[:, iu, :] * e[:, ju, :]).reshape(e.shape[0], -1)

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        e = inp["emb"]
        z = jnp.mean(e, axis=-1)                              # squeeze (B, F)
        a = jax.nn.relu(jax.nn.relu(z @ params["se"]["w1"])
                        @ params["se"]["w2"])                 # excitation
        v = e * a[..., None]                                  # reweight
        parts = [bilinear(params["bilinear_w"], e),
                 bilinear(params["bilinear_w"], v)]
        if nd:
            parts.append(inp["dense"])
        deep, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        logit = _first_order(params, inp) + deep[:, 0] + params["bias"]
        return logit, {"emb_l2": inp["l2"]}

    return stateless("FiBiNET", fs, init_fn, fwd)


def DLRM(fs: FeatureSet, bottom: Tuple[int, ...] = (64,),
         top: Tuple[int, ...] = (256, 128)) -> Model:
    """DLRM (Naumov et al. 2019). Beyond the reference's zoo: the canonical
    production recommendation architecture and the natural target for the
    sharded embedding store (SURVEY §2.10) — dense features pass through a
    bottom MLP into the same D-dim space as the sparse embeddings, all
    (F+1 choose 2) pairwise dots form the interaction vector (one Gram
    einsum on the MXU), and [bottom output ∥ interactions] feeds the top
    MLP. Without dense features it degrades to pairwise dots over the
    sparse fields only."""
    fe = FusedEmbedding(fs, with_linear=False)
    f, d, nd = _dims(fs)
    bottom_mlp = MLP(nd, bottom + (d,), activation="relu") if nd else None
    n_fields = f + (1 if nd else 0)
    iu, ju = np.triu_indices(n_fields, k=1)
    iu, ju = jnp.asarray(iu), jnp.asarray(ju)
    top_dim = (d if nd else 0) + n_fields * (n_fields - 1) // 2
    top_mlp = MLP(top_dim, top, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "bottom", "top"])
        p = {"embedding": fe.init(rngs["emb"]),
             "top": top_mlp.init(rngs["top"])}
        if bottom_mlp:
            p["bottom"] = bottom_mlp.init(rngs["bottom"])
        return p

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        e = inp["emb"]
        parts = []
        if bottom_mlp:
            x0, _ = bottom_mlp(params["bottom"], inp["dense"])   # (B, D)
            e = jnp.concatenate([x0[:, None, :], e], axis=1)
            parts.append(x0)
        gram = jnp.einsum("bid,bjd->bij", e, e)
        parts.append(gram[:, iu, ju])
        logit, _ = top_mlp(params["top"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"emb_l2": inp["l2"]}

    return stateless("DLRM", fs, init_fn, fwd)


def AutoInt(fs: FeatureSet, n_layers: int = 2, num_heads: int = 2,
            head_dim: int = 16) -> Model:
    """AutoInt (reference ``AutoInt``, models.py:150-165): stacked multi-head
    self-attention over field embeddings (the reference nests its MHA inside
    DnnLayer via ``other_dense``; here the stack is explicit), then flatten →
    logit. Dense features join as one projected pseudo-field."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    n_fields = f + (1 if nd else 0)
    mha = MultiHeadAttention(d, num_heads, head_dim, use_res=True, use_ln=True)
    head = Dense(n_fields * d, 1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "head", "dense_proj"]
                          + [f"mha{i}" for i in range(n_layers)])
        p = {"embedding": fe.init(rngs["emb"]), "head": head.init(rngs["head"])}
        if nd:
            p["dense_proj"] = Dense(nd, d).init(rngs["dense_proj"])
        for i in range(n_layers):
            p[f"mha{i}"] = mha.init(rngs[f"mha{i}"])
        return p

    def _pp(n_blocks):
        """(mesh, microbatches, blocks/stage) when pipeline parallelism is
        requested (context) and the block stack splits evenly."""
        from ..parallel import context as pctx
        m = pctx.pp_microbatches()
        if not m or pctx.model_axis_size() <= 1:
            return None
        mesh = pctx.active_mesh()
        stages = mesh.shape["model"]
        if n_blocks % stages:
            raise ValueError(
                f"pipeline over {stages} stages needs n_layers divisible "
                f"({n_blocks} blocks)")
        return mesh, m, n_blocks // stages

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch, with_linear=False)
        e = inp["emb"]
        if nd:
            dense_field = Dense(nd, d)(params["dense_proj"], inp["dense"])
            e = jnp.concatenate([e, dense_field[:, None, :]], axis=1)
        pp = _pp(n_layers)
        if pp is not None:
            # PP path (parallel/pipeline.py): each model-axis device owns
            # blocks_per_stage consecutive MHA blocks; activations hand
            # off via ppermute in one GPipe scan — same math, same order,
            # parity vs the sequential stack pinned in tests/test_pipeline
            mesh, micro, bps = pp
            from ..parallel.pipeline import make_pipeline, stack_stage_params
            stages = mesh.shape["model"]
            stacked = stack_stage_params([
                {f"b{j}": params[f"mha{s * bps + j}"] for j in range(bps)}
                for s in range(stages)])

            def stage_fn(sp, x):
                eb = x.reshape(x.shape[0], n_fields, d)
                for j in range(bps):
                    eb = mha(sp[f"b{j}"], eb)
                return eb.reshape(x.shape[0], -1)

            pipe = make_pipeline(mesh, stage_fn, n_microbatches=micro)
            e = pipe(stacked, e.reshape(e.shape[0], -1)).reshape(
                e.shape[0], n_fields, d)
        else:
            for i in range(n_layers):
                e = mha(params[f"mha{i}"], e)
        logit = head(params["head"], e.reshape(e.shape[0], -1))
        return logit[:, 0], {"emb_l2": inp["l2"]}

    return stateless("AutoInt", fs, init_fn, fwd)


def LR(fs: FeatureSet) -> Model:
    """Logistic regression (reference shelf: "[LR] Predicting Clicks -
    Estimating the Click-Through Rate for New Ads", paper/interactive/).

    Pure first-order model: one (V, 1) weight table over the fused vocab +
    dense-feature linear + bias. The baseline every CTR paper compares
    against; also the serving-cheapest model in the registry (a single 1-wide
    gather — v5e's fastest gather width, PERF.md)."""
    fe = FusedEmbedding(fs)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "dense_linear"])
        # nested under "embedding" (like FM/FFM) so the parallel path's
        # _is_table_path sees it: padded, row-sharded, collective-lookup'd
        p = {"embedding": {"linear": fe.init(rngs["emb"])["linear"]},
             "bias": zeros(())}
        p.update(_maybe_dense_linear(fs, rngs))
        return p

    def fwd(params, batch, train):
        lin = fe.sparse_linear(params["embedding"], batch["sparse"])  # (B, F)
        inp = {"linear": lin, "dense": batch.get("dense")}
        logit = _first_order(params, inp) + params["bias"]
        return logit, {}

    return stateless("LR", fs, init_fn, fwd)


def FNN(fs: FeatureSet, hidden: Tuple[int, ...] = (200, 200, 200)) -> Model:
    """FNN — Factorization-machine-supported Neural Network (reference shelf:
    "[FNN] Deep Learning over Multi-field Categorical Data", UCL 2016,
    paper/interactive/).

    Each field's dense-layer input is the paper's z_i = (w_i, v_i): the FM
    first-order weight concatenated with the factor vector, then an MLP to a
    single logit. The defining trick is the FM warm-start: pretrain ``FM`` on
    the same ``FeatureSet`` and copy its tables in with ``fnn_from_fm``
    (the JAX counterpart of the paper's layer-wise pretraining; same
    ``pre_weight`` mechanism the reference uses for graph embeddings,
    interactive_layer.py:216)."""
    fe = FusedEmbedding(fs)
    f, d, nd = _dims(fs)
    mlp = MLP(f * (d + 1) + nd, hidden, activation="relu", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp"])
        return {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"]),
                "bias": zeros(())}

    def fwd(params, batch, train):
        inp = embed_inputs(fe, params["embedding"], batch)
        z = jnp.concatenate([inp["emb"].reshape(inp["emb"].shape[0], -1),
                             inp["linear"]]
                            + ([inp["dense"]] if nd else []), axis=-1)
        deep, _ = mlp(params["mlp"], z)
        return deep[:, 0] + params["bias"], {"emb_l2": inp["l2"]}

    return stateless("FNN", fs, init_fn, fwd)


def fnn_from_fm(fnn_params, fm_params):
    """Warm-start FNN from a trained FM: copies the shared (V, D) + (V, 1)
    tables (the FNN paper's FM-pretraining step). Returns new params."""
    out = dict(fnn_params)
    out["embedding"] = jax.tree_util.tree_map(lambda x: x,
                                              fm_params["embedding"])
    return out
