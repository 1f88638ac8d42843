"""AUC/logloss parity: this framework vs the reference's stack (TF2 Keras).

BASELINE.json's quality target is "DeepFM/xDeepFM AUC within ±0.001 of
reference training". The reference publishes no numbers and real Criteo is
unavailable here (zero-egress image), so this driver trains BOTH stacks on
the IDENTICAL synthetic Criteo-format dataset (planted FM structure,
``features/synthetic.py``) with the same split, batch size, optimizer, and
epochs, and reports eval AUC/logloss side by side (sklearn metrics for
both). The TF model mirrors the reference's DeepFM composition
(``kon/model/ctr_model/model/models.py:80-90``: shared embeddings, FM block
+ deep tower, BCE + Adam) — written fresh in Keras 3 ops, not copied.

    python examples/reference_parity.py --rows 400000 --epochs 2
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def split(data, frac=0.05, seed=0):
    n = len(data["label"])
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    cut = int(n * (1 - frac))

    def take(v, sl):
        if isinstance(v, dict):
            return {k: a[sl] for k, a in v.items()}
        return v[sl]

    tr = {k: take(v, idx[:cut]) for k, v in data.items()}
    te = {k: take(v, idx[cut:]) for k, v in data.items()}
    return tr, te


def eval_metrics(y, p, groups=None):
    from sklearn.metrics import log_loss, roc_auc_score
    p = np.clip(np.asarray(p, np.float64).reshape(-1), 1e-7, 1 - 1e-7)
    out = {"auc": float(roc_auc_score(y, p)),
           "logloss": float(log_loss(y, p))}
    if groups is not None:
        # the DIN/DIEN papers' headline metric (train/metrics.gauc)
        from ml_function_tpu.train.metrics import gauc
        g, used = gauc(y, p, groups)
        out["gauc"] = round(float(g), 4)
        out["gauc_groups"] = int(used)
    return out


def model_hp(args):
    if args.model == "din":
        return {"hidden": (200, 80)}
    if args.model == "bst":
        return {"hidden": (200, 80), "n_blocks": 1, "num_heads": 2}
    if args.model == "dien":
        return {"hidden": (200, 80), "mode": "aigru",
                "aux_weight": args.aux_weight}
    if args.model == "dsin":
        return {"hidden": (200, 80),
                "session_shape": tuple(args.session_shape)}
    if args.model == "mmoe":
        return {"n_experts": 4, "expert_hidden": (64,),
                "tower_hidden": (32,)}
    if args.model == "fm":
        return {}
    if args.model == "autoint":
        return {"n_layers": 2, "num_heads": 2, "head_dim": 16}
    if args.model == "dcn":
        return {"cross_depth": 3, "hidden": tuple(args.hidden)}
    hp = {"hidden": tuple(args.hidden)}
    if args.model == "xdeepfm":
        hp["cin_hidden"] = tuple(args.cin)
    return hp


def run_ours(fs, train, test, args):
    from ml_function_tpu.models import get_model
    from ml_function_tpu.serving import Scorer
    from ml_function_tpu.train.loop import fit

    model = get_model(args.model, fs, **model_hp(args))
    t0 = time.perf_counter()
    ts, res = fit(model, train, epochs=args.epochs, batch_size=args.batch,
                  learning_rate=args.lr, verbose=True,
                  steps_per_call=args.steps_per_call, seed=args.seed)
    dt = time.perf_counter() - t0
    p = Scorer(model, ts.params, ts.model_state,
               batch_size=args.batch).predict_proba(test)
    m = eval_metrics(test["label"], p, groups=test.get("group"))
    m["train_s"] = round(dt, 1)   # includes jit compile (cold: minutes on the
    # axon remote-compile tunnel; cached after the first run)
    m["examples_per_sec"] = round(res.examples_per_sec)  # steady-state
    return m


def run_tf(fs, train, test, args):
    import os
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from keras import layers, ops

    n_dense = len(fs.dense)
    n_sparse = len(fs.sparse)
    vocab = fs.sparse[0].vocab_size
    dim = fs.embed_dim

    inp_dense = keras.Input((n_dense,))
    inp_sparse = keras.Input((n_sparse,), dtype="int32")
    offs = np.arange(n_sparse, dtype=np.int32) * vocab

    class Offset(layers.Layer):
        def call(self, x):
            return x + ops.convert_to_tensor(offs)[None, :]

    gids = Offset()(inp_sparse)
    e = layers.Embedding(vocab * n_sparse, dim,
                         embeddings_initializer=keras.initializers.RandomNormal(0, 0.05))(gids)
    lin_e = layers.Embedding(vocab * n_sparse, 1,
                             embeddings_initializer=keras.initializers.RandomNormal(0, 0.05))(gids)

    class FMHead(layers.Layer):
        def call(self, e, lin_e, dense):
            s = ops.sum(e, axis=1)
            fm = 0.5 * ops.sum(ops.square(s) - ops.sum(ops.square(e), 1), -1)
            lin = ops.sum(lin_e[..., 0], axis=1)
            deep = ops.concatenate(
                [ops.reshape(e, (-1, n_sparse * dim)), dense], -1)
            return fm, lin, deep

    fm, lin, deep_in = FMHead()(e, lin_e, inp_dense)
    deep = deep_in
    for h in args.hidden:
        deep = layers.Dense(h, activation="relu")(deep)
    deep = layers.Dense(1)(deep)

    if args.model == "fm":
        # reference FM (models.py:36-41): first + second order only
        class FMScore(layers.Layer):
            def call(self, fm, lin):
                return ops.sigmoid(fm + lin)

        m = keras.Model([inp_dense, inp_sparse], FMScore()(fm, lin))
        return _tf_fit_eval(m, train, test, args)

    if args.model == "wide_deep":
        # reference Wide_Deep (models.py:69-78): linear ⊕ DNN
        class WDScore(layers.Layer):
            def call(self, lin, deep):
                return ops.sigmoid(lin + deep[:, 0])

        m = keras.Model([inp_dense, inp_sparse], WDScore()(lin, deep))
        return _tf_fit_eval(m, train, test, args)

    if args.model == "dcn":
        # reference DCN (models.py:92-106): 3 cross layers ⊕ DNN → head
        class CrossNet(layers.Layer):
            def __init__(self, depth=3):
                super().__init__()
                self.depth = depth

            def build(self, shape):
                d = shape[-1]
                self.ws = [self.add_weight(shape=(d, 1),
                                           initializer="glorot_uniform",
                                           name=f"w{i}")
                           for i in range(self.depth)]
                self.bs = [self.add_weight(shape=(d,), initializer="zeros",
                                           name=f"b{i}")
                           for i in range(self.depth)]

            def call(self, x0):
                x = x0
                for w, b in zip(self.ws, self.bs):
                    x = x0 * ops.matmul(x, w) + b + x
                return x

        xc = CrossNet(3)(deep_in)
        xd = deep_in
        for h in args.hidden:
            xd = layers.Dense(h, activation="relu")(xd)
        out = layers.Dense(1, activation="sigmoid")(
            ops.concatenate([xc, xd], -1))[:, 0]
        m = keras.Model([inp_dense, inp_sparse], out)
        return _tf_fit_eval(m, train, test, args)

    if args.model == "autoint":
        # AutoInt (models.py:150-165): stacked field MHA (+ dense
        # pseudo-field, matching ours) → flatten → logit
        h_fields = e
        if n_dense:
            df = layers.Dense(dim)(inp_dense)
            h_fields = ops.concatenate([h_fields, df[:, None, :]], 1)
        for _ in range(2):
            att = layers.MultiHeadAttention(num_heads=2, key_dim=16,
                                            output_shape=dim)(
                h_fields, h_fields)
            h_fields = layers.LayerNormalization()(h_fields + att)
        out = layers.Dense(1, activation="sigmoid")(
            layers.Flatten()(h_fields))[:, 0]
        m = keras.Model([inp_dense, inp_sparse], out)
        return _tf_fit_eval(m, train, test, args)

    if args.model == "xdeepfm":
        # CIN head replaces the FM term (reference XDeepFM composition,
        # models.py:121-138: CIN ⊕ DNN ⊕ linear → add-merge score).
        class CINBlock(layers.Layer):
            def build(self, _):
                h_prev = n_sparse
                self.ws = []
                for i, h in enumerate(args.cin):
                    self.ws.append(self.add_weight(
                        shape=(h_prev * n_sparse, h),
                        initializer="glorot_uniform", name=f"cin_w{i}"))
                    h_prev = h

            def call(self, e):
                x0, xk = e, e
                pooled = []
                for w in self.ws:
                    z = ops.einsum("bhd,bfd->bhfd", xk, x0)
                    z = ops.reshape(z, (-1, z.shape[1] * n_sparse, dim))
                    xk = ops.einsum("bzd,zh->bhd", z, w)
                    pooled.append(ops.sum(xk, -1))
                return ops.concatenate(pooled, -1)

        fm = layers.Dense(1)(CINBlock()(e))[:, 0]

    class Score(layers.Layer):
        def call(self, fm, lin, deep):
            return ops.sigmoid(fm + lin + deep[:, 0])

    out = Score()(fm, lin, deep)
    m = keras.Model([inp_dense, inp_sparse], out)
    return _tf_fit_eval(m, train, test, args)


def _tf_fit_eval(m, train, test, args):
    import keras

    m.compile(optimizer=keras.optimizers.Adam(args.lr),
              loss="binary_crossentropy")
    t0 = time.perf_counter()
    m.fit([train["dense"], train["sparse"]], train["label"],
          batch_size=args.batch, epochs=args.epochs, verbose=2)
    dt = time.perf_counter() - t0
    p = m.predict([test["dense"], test["sparse"]], batch_size=args.batch,
                  verbose=0)
    met = eval_metrics(test["label"], p)
    met["train_s"] = round(dt, 1)
    met["examples_per_sec"] = round(args.epochs * len(train["label"]) / dt)
    return met


def run_tf_din(fs, train, test, args):
    """Reference DIN composition (models.py:168-200: ExtractLayer routing →
    sum-pool + AttentionUnit([cand, cand−beh, cand·beh, beh]) with −2³²
    masking + softmax, behavior_layer.py:53-120 → PReLU DNN) written fresh
    in Keras 3 ops against the same shared item/cate vocab tables."""
    import os
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from keras import layers, ops

    d = fs.embed_dim
    L = train["seq"]["hist_item"].shape[1]
    item_v = fs.sparse[0].vocab_size
    cate_v = fs.sparse[1].vocab_size
    n_extra = len(fs.sparse) - 2
    u_vocab = fs.sparse[2].vocab_size if n_extra else 0

    inp_sparse = keras.Input((len(fs.sparse),), dtype="int32")
    inp_hitem = keras.Input((L,), dtype="int32")
    inp_hcate = keras.Input((L,), dtype="int32")

    init = keras.initializers.RandomNormal(0, 0.05)
    emb_item = layers.Embedding(item_v, d, embeddings_initializer=init)
    emb_cate = layers.Embedding(cate_v, d, embeddings_initializer=init)
    emb_u = (layers.Embedding(u_vocab * n_extra, d,
                              embeddings_initializer=init) if n_extra else None)

    att_d1 = layers.Dense(36, activation="sigmoid")
    att_d2 = layers.Dense(1)

    class DINBody(layers.Layer):
        def call(self, sparse, hitem, hcate):
            cand = ops.concatenate([emb_item(sparse[:, 0]),
                                    emb_cate(sparse[:, 1])], -1)   # (B, 2D)
            beh = ops.concatenate([emb_item(hitem), emb_cate(hcate)], -1)
            mask = ops.cast(ops.not_equal(hitem, 0), "float32")    # (B, L)
            beh = beh * mask[..., None]
            c = ops.broadcast_to(cand[:, None, :], ops.shape(beh))
            s = att_d2(att_d1(ops.concatenate(
                [c, beh, c - beh, c * beh], -1)))[..., 0]          # (B, L)
            s = s + (1.0 - mask) * -1e9
            a = ops.softmax(s, axis=-1)
            att_pool = ops.sum(a[..., None] * beh, axis=1)
            sum_pool = ops.sum(beh, axis=1)
            parts = [cand, sum_pool, att_pool]
            if emb_u is not None:
                offs = ops.convert_to_tensor(
                    np.arange(n_extra, dtype=np.int32) * u_vocab)
                u = emb_u(sparse[:, 2:] + offs[None, :])
                parts.append(ops.reshape(u, (-1, n_extra * d)))
            return ops.concatenate(parts, -1)

    h = DINBody()(inp_sparse, inp_hitem, inp_hcate)
    for width in (200, 80):
        h = layers.Dense(width)(h)
        h = layers.BatchNormalization()(h)
        h = layers.PReLU()(h)
    out = layers.Dense(1, activation="sigmoid")(h)[:, 0]
    m = keras.Model([inp_sparse, inp_hitem, inp_hcate], out)
    m.compile(optimizer=keras.optimizers.Adam(args.lr),
              loss="binary_crossentropy")

    def xs(d_):
        return [d_["sparse"], d_["seq"]["hist_item"], d_["seq"]["hist_cate"]]

    t0 = time.perf_counter()
    m.fit(xs(train), train["label"], batch_size=args.batch,
          epochs=args.epochs, verbose=2)
    dt = time.perf_counter() - t0
    p = m.predict(xs(test), batch_size=args.batch, verbose=0)
    met = eval_metrics(test["label"], p)
    met["train_s"] = round(dt, 1)
    met["examples_per_sec"] = round(args.epochs * len(train["label"]) / dt)
    return met


def _beh_embeds(fs):
    """Shared TF embedding tables + candidate/behavior assembly for the
    behavior-family compositions (fresh Keras 3, reference semantics)."""
    import keras
    from keras import layers

    d = fs.embed_dim
    item_v = fs.sparse[0].vocab_size
    cate_v = fs.sparse[1].vocab_size
    init = keras.initializers.RandomNormal(0, 0.05)
    emb_item = layers.Embedding(item_v, d, embeddings_initializer=init)
    emb_cate = layers.Embedding(cate_v, d, embeddings_initializer=init)
    return d, emb_item, emb_cate


def _din_attention(ops, att_d1, att_d2, cand, keys, mask):
    """Reference AttentionUnit scoring (behavior_layer.py:53-83): DNN on
    [cand, keys, cand−keys, cand·keys], −1e9 mask, softmax."""
    c = ops.broadcast_to(cand[:, None, :], ops.shape(keys))
    s = att_d2(att_d1(ops.concatenate([c, keys, c - keys, c * keys],
                                      -1)))[..., 0]
    s = s + (1.0 - mask) * -1e9
    return ops.softmax(s, axis=-1)


def run_tf_dien(fs, train, test, args):
    """Reference DIEN composition (models.py:202-238): GRU interest
    extractor + auxiliary loss (AuxiliaryLayer, behavior_layer.py:122-152;
    negatives drawn from the batch, SampleLayer :154-171) → AIGRU evolution
    (the reference's default path, :199-241) → PReLU DNN."""
    import os
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from keras import layers, ops

    d, emb_item, emb_cate = _beh_embeds(fs)
    kd = 2 * d
    L = train["seq"]["hist_item"].shape[1]
    n_extra = len(fs.sparse) - 2
    u_vocab = fs.sparse[2].vocab_size if n_extra else 0
    init = keras.initializers.RandomNormal(0, 0.05)
    emb_u = (layers.Embedding(u_vocab * n_extra, d,
                              embeddings_initializer=init) if n_extra else None)

    inp_sparse = keras.Input((len(fs.sparse),), dtype="int32")
    inp_hitem = keras.Input((L,), dtype="int32")
    inp_hcate = keras.Input((L,), dtype="int32")

    class DIENBody(layers.Layer):
        def __init__(self):
            super().__init__()
            self.gru1 = layers.GRU(kd, return_sequences=True)
            self.gru2 = layers.GRU(kd)
            self.aux = keras.Sequential([
                layers.Dense(100, activation="sigmoid"),
                layers.Dense(50, activation="sigmoid"),
                layers.Dense(1)])
            self.att_d1 = layers.Dense(36, activation="sigmoid")
            self.att_d2 = layers.Dense(1)

        def call(self, sparse, hitem, hcate):
            cand = ops.concatenate([emb_item(sparse[:, 0]),
                                    emb_cate(sparse[:, 1])], -1)
            mask = ops.cast(ops.not_equal(hitem, 0), "float32")
            beh = ops.concatenate([emb_item(hitem), emb_cate(hcate)], -1)
            beh = beh * mask[..., None]
            states = self.gru1(beh)

            # aux loss: classify (h_t, e_{t+1}) click vs (h_t, e_neg)
            h_t = states[:, :-1, :]
            pos = beh[:, 1:, :]
            neg = ops.roll(beh, 1, axis=0)[:, 1:, :]
            s_pos = self.aux(ops.concatenate([h_t, pos], -1))[..., 0]
            s_neg = self.aux(ops.concatenate([h_t, neg], -1))[..., 0]
            m = mask[:, 1:] * mask[:, :-1]
            aux = -ops.sum((ops.log_sigmoid(s_pos)
                            + ops.log_sigmoid(-s_neg)) * m) \
                / ops.maximum(ops.sum(m), 1.0)
            self.add_loss(args.aux_weight * aux)

            a = _din_attention(ops, self.att_d1, self.att_d2, cand, states,
                               mask)
            final = self.gru2(states * a[..., None])  # AIGRU
            parts = [cand, final]
            if emb_u is not None:
                offs = ops.convert_to_tensor(
                    np.arange(n_extra, dtype=np.int32) * u_vocab)
                u = emb_u(sparse[:, 2:] + offs[None, :])
                parts.append(ops.reshape(u, (-1, n_extra * d)))
            return ops.concatenate(parts, -1)

    h = DIENBody()(inp_sparse, inp_hitem, inp_hcate)
    for width in (200, 80):
        h = layers.Dense(width)(h)
        h = layers.BatchNormalization()(h)
        h = layers.PReLU()(h)
    out = layers.Dense(1, activation="sigmoid")(h)[:, 0]
    m = keras.Model([inp_sparse, inp_hitem, inp_hcate], out)
    return _tf_fit_eval_seq(m, train, test, args)


def run_tf_dsin(fs, train, test, args):
    """Reference DSIN composition (models.py:240-261): session division +
    bias position encodings (behavior_layer.py:428-475) → per-session
    self-attention (:478-495) → BiLSTM across sessions (:497-508) → two
    target attentions → PReLU DNN."""
    import os
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from keras import layers, ops

    d, emb_item, emb_cate = _beh_embeds(fs)
    kd = 2 * d
    L = train["seq"]["hist_item"].shape[1]
    S, Ls = args.session_shape
    assert S * Ls == L
    H = kd // 2

    inp_sparse = keras.Input((len(fs.sparse),), dtype="int32")
    inp_hitem = keras.Input((L,), dtype="int32")
    inp_hcate = keras.Input((L,), dtype="int32")

    class DSINBody(layers.Layer):
        def build(self, _):
            self.bias_s = self.add_weight(shape=(S, 1, 1), name="bias_s",
                                          initializer="zeros")
            self.bias_p = self.add_weight(shape=(1, Ls, 1), name="bias_p",
                                          initializer="zeros")
            self.bias_d = self.add_weight(shape=(1, 1, kd), name="bias_d",
                                          initializer="zeros")
            self.mha = layers.MultiHeadAttention(num_heads=2,
                                                 key_dim=kd // 2,
                                                 output_shape=kd)
            self.bilstm = layers.Bidirectional(
                layers.LSTM(H, return_sequences=True))
            self.att1 = [layers.Dense(36, activation="sigmoid")
                         for _ in range(2)]
            self.att2 = [layers.Dense(1) for _ in range(2)]

        def call(self, sparse, hitem, hcate):
            cand = ops.concatenate([emb_item(sparse[:, 0]),
                                    emb_cate(sparse[:, 1])], -1)
            mask = ops.cast(ops.not_equal(hitem, 0), "float32")
            beh = ops.concatenate([emb_item(hitem), emb_cate(hcate)], -1)
            beh = beh * mask[..., None]
            sess = ops.reshape(beh, (-1, S, Ls, kd))
            sess = sess + (self.bias_s + self.bias_p + self.bias_d)[None]
            flat = ops.reshape(sess, (-1, Ls, kd))
            sm = ops.reshape(mask, (-1, Ls))
            att = self.mha(flat, flat,
                           attention_mask=ops.cast(sm, "bool")[:, None, :])
            denom = ops.maximum(ops.sum(sm, -1, keepdims=True), 1.0)
            interests = ops.sum(att * sm[..., None], 1) / denom
            interests = ops.reshape(interests, (-1, S, kd))
            sess_valid = ops.cast(
                ops.any(ops.reshape(ops.cast(mask, "bool"), (-1, S, Ls)), 2),
                "float32")
            lstm_out = self.bilstm(interests)
            a_i = _din_attention(ops, self.att1[0], self.att2[0], cand,
                                 interests, sess_valid)
            pooled_i = ops.sum(a_i[..., None] * interests, 1)
            a_l = _din_attention(ops, self.att1[1], self.att2[1], cand,
                                 lstm_out, sess_valid)
            pooled_l = ops.sum(a_l[..., None] * lstm_out, 1)
            return ops.concatenate([cand, pooled_i, pooled_l], -1)

    h = DSINBody()(inp_sparse, inp_hitem, inp_hcate)
    for width in (200, 80):
        h = layers.Dense(width)(h)
        h = layers.BatchNormalization()(h)
        h = layers.PReLU()(h)
    out = layers.Dense(1, activation="sigmoid")(h)[:, 0]
    m = keras.Model([inp_sparse, inp_hitem, inp_hcate], out)
    return _tf_fit_eval_seq(m, train, test, args)


def run_tf_bst(fs, train, test, args):
    """Reference BST composition (models.py:336-349) to the PAPER's
    semantics (candidate appended to the sequence + sin/cos positions +
    transformer block + MLP — our stack's documented divergence from the
    reference's seq-pair split is applied to BOTH sides so the comparison
    isolates numerics, not architecture)."""
    import os
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from keras import layers, ops

    d, emb_item, emb_cate = _beh_embeds(fs)
    kd = 2 * d
    L = train["seq"]["hist_item"].shape[1]

    inp_sparse = keras.Input((len(fs.sparse),), dtype="int32")
    inp_hitem = keras.Input((L,), dtype="int32")
    inp_hcate = keras.Input((L,), dtype="int32")

    pos = np.zeros((L + 1, kd), np.float32)
    p_ = np.arange(L + 1)[:, None]
    div = np.exp(np.arange(0, kd, 2) * (-np.log(10000.0) / kd))
    pos[:, 0::2] = np.sin(p_ * div)
    pos[:, 1::2] = np.cos(p_ * div)

    class BSTBody(layers.Layer):
        def build(self, _):
            self.mha = layers.MultiHeadAttention(num_heads=2,
                                                 key_dim=kd // 2,
                                                 output_shape=kd)
            self.ln1 = layers.LayerNormalization()
            self.ln2 = layers.LayerNormalization()
            self.ff1 = layers.Dense(4 * kd, activation="relu")
            self.ff2 = layers.Dense(kd)

        def call(self, sparse, hitem, hcate):
            cand = ops.concatenate([emb_item(sparse[:, 0]),
                                    emb_cate(sparse[:, 1])], -1)
            mask = ops.cast(ops.not_equal(hitem, 0), "float32")
            beh = ops.concatenate([emb_item(hitem), emb_cate(hcate)], -1)
            beh = beh * mask[..., None]
            seq = ops.concatenate([beh, cand[:, None, :]], 1)  # (B, L+1, kd)
            full = ops.concatenate(
                [mask, ops.ones_like(mask[:, :1])], 1)
            seq = seq + ops.convert_to_tensor(pos)[None]
            att = self.mha(seq, seq,
                           attention_mask=ops.cast(full, "bool")[:, None, :])
            seq = self.ln1(seq + att)
            seq = self.ln2(seq + self.ff2(self.ff1(seq)))
            denom = ops.maximum(ops.sum(full, -1, keepdims=True), 1.0)
            return ops.sum(seq * full[..., None], 1) / denom

    h = BSTBody()(inp_sparse, inp_hitem, inp_hcate)
    for width in (200, 80):
        h = layers.Dense(width)(h)
        h = layers.LayerNormalization()(h)
        h = layers.ReLU()(h)
    out = layers.Dense(1, activation="sigmoid")(h)[:, 0]
    m = keras.Model([inp_sparse, inp_hitem, inp_hcate], out)
    return _tf_fit_eval_seq(m, train, test, args)


def run_tf_mmoe(fs, train, test, args):
    """MMoE composition (the cvr_model the reference stubbed,
    kon/model/cvr_model/ — implemented to the paper): shared experts,
    per-task softmax gates, per-task towers; primary task scored."""
    import os
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from keras import layers, ops

    n_dense = len(fs.dense)
    n_sparse = len(fs.sparse)
    vocab = fs.sparse[0].vocab_size
    dim = fs.embed_dim
    n_exp = 4

    inp_dense = keras.Input((n_dense,))
    inp_sparse = keras.Input((n_sparse,), dtype="int32")
    offs = np.arange(n_sparse, dtype=np.int32) * vocab

    class Offset(layers.Layer):
        def call(self, x):
            return x + ops.convert_to_tensor(offs)[None, :]

    e = layers.Embedding(
        vocab * n_sparse, dim,
        embeddings_initializer=keras.initializers.RandomNormal(0, 0.05))(
        Offset()(inp_sparse))
    h = layers.Flatten()(e)
    if n_dense:
        h = layers.Concatenate()([h, inp_dense])
    experts = ops.stack([layers.Dense(64, activation="relu")(h)
                         for _ in range(n_exp)], axis=1)   # (B, E, 64)
    outs = []
    for _ in range(2):  # cvr (primary) + ctr task
        gate = layers.Dense(n_exp, activation="softmax")(h)  # (B, E)
        mixed = ops.sum(experts * gate[..., None], axis=1)
        t = layers.Dense(32, activation="relu")(mixed)
        outs.append(layers.Dense(1, activation="sigmoid")(t)[:, 0])
    m = keras.Model([inp_dense, inp_sparse], outs)
    m.compile(optimizer=keras.optimizers.Adam(args.lr),
              loss=["binary_crossentropy", "binary_crossentropy"])
    t0 = time.perf_counter()
    m.fit([train["dense"], train["sparse"]],
          [train["label"], train["click"]],
          batch_size=args.batch, epochs=args.epochs, verbose=2)
    dt = time.perf_counter() - t0
    p = m.predict([test["dense"], test["sparse"]], batch_size=args.batch,
                  verbose=0)[0]
    met = eval_metrics(test["label"], p)
    met["train_s"] = round(dt, 1)
    met["examples_per_sec"] = round(args.epochs * len(train["label"]) / dt)
    return met


def _tf_fit_eval_seq(m, train, test, args):
    import keras

    m.compile(optimizer=keras.optimizers.Adam(args.lr),
              loss="binary_crossentropy")

    def xs(d_):
        return [d_["sparse"], d_["seq"]["hist_item"], d_["seq"]["hist_cate"]]

    t0 = time.perf_counter()
    m.fit(xs(train), train["label"], batch_size=args.batch,
          epochs=args.epochs, verbose=2)
    dt = time.perf_counter() - t0
    p = m.predict(xs(test), batch_size=args.batch, verbose=0)
    met = eval_metrics(test["label"], p)
    met["train_s"] = round(dt, 1)
    met["examples_per_sec"] = round(args.epochs * len(train["label"]) / dt)
    return met


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. 'cpu' — the image's "
                         "sitecustomize overrides the JAX_PLATFORMS env var, "
                         "so use this flag to keep 'ours' off the TPU tunnel)")
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--vocab", type=int, default=10_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hidden", type=int, nargs="+", default=[256, 128, 64])
    ap.add_argument("--model", choices=["fm", "wide_deep", "deepfm",
                                        "xdeepfm", "dcn", "autoint", "din",
                                        "dien", "dsin", "bst", "mmoe"],
                    default="deepfm")
    ap.add_argument("--seq-len", type=int, default=32)
    ap.add_argument("--session-shape", type=int, nargs=2, default=[4, 8])
    ap.add_argument("--aux-weight", type=float, default=1.0)
    ap.add_argument("--cin", type=int, nargs="+", default=[64, 64])
    ap.add_argument("--steps-per-call", type=int, default=8,
                    help="chained steps per dispatch (amortizes link latency)")
    ap.add_argument("--seed", type=int, default=0,
                    help="init seed for OUR stack (TF varies per run)")
    ap.add_argument("--skip-tf", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.model in ("din", "dien", "dsin", "bst"):
        from ml_function_tpu.features.synthetic import make_behavior_data
        fs, data = make_behavior_data(
            n_rows=args.rows, n_items=args.vocab,
            n_cates=max(args.vocab // 50, 10), seq_len=args.seq_len,
            session_shape=(tuple(args.session_shape)
                           if args.model == "dsin" else None))
    elif args.model == "mmoe":
        from ml_function_tpu.features.synthetic import make_cvr_data
        fs, data = make_cvr_data(n_rows=args.rows, n_dense=4, n_sparse=8,
                                 vocab_size=args.vocab)
    else:
        from ml_function_tpu.features.synthetic import make_criteo_like
        fs, data = make_criteo_like(n_rows=args.rows, vocab_size=args.vocab)
    train, test = split(data)
    print(f"rows={args.rows} vocab={args.vocab} "
          f"pos_rate={float(np.mean(data['label'])):.3f}")

    ours = None if args.skip_ours else run_ours(fs, train, test, args)
    if ours:
        print("ours:", json.dumps(ours), flush=True)
    if not args.skip_tf:
        tf_fn = {"din": run_tf_din, "dien": run_tf_dien,
                 "dsin": run_tf_dsin, "bst": run_tf_bst,
                 "mmoe": run_tf_mmoe}.get(args.model, run_tf)
        ref = tf_fn(fs, train, test, args)
        print("tf reference stack:", json.dumps(ref))
        if ours:
            print(f"dAUC = {ours['auc'] - ref['auc']:+.4f}  "
                  f"wall speedup = "
                  f"{ours['examples_per_sec'] / ref['examples_per_sec']:.1f}x "
                  "(ours includes jit compile + tunnel dispatch; the pure "
                  "step rate is bench.py's number)")


if __name__ == "__main__":
    main()
