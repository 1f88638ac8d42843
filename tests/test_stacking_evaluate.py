"""TF-IDF stacking + embedding evaluation utilities."""

import numpy as np
import pytest

from ml_function_tpu.embedding_pretrain.evaluate import (cosine_class_gap,
                                                         silhouette,
                                                         tsne_plot)
from ml_function_tpu.tools.stacking import TfidfStacker


def test_tfidf_stacker_learns():
    rng = np.random.default_rng(0)
    n = 400
    # texts where token 'buy' predicts the label
    texts, y = [], []
    for i in range(n):
        label = int(rng.uniform() < 0.5)
        toks = list(rng.choice(["a", "b", "c", "d"], 5))
        if label:
            toks.append("buy")
        texts.append("|".join(toks))
        y.append(label)
    st = TfidfStacker(max_features=50, n_folds=3).fit(texts, y)
    assert st.oof_auc_ > 0.9
    p = st.predict_proba(["a|buy", "a|b"])
    assert p[0] > p[1]


def test_embedding_eval(tmp_path):
    rng = np.random.default_rng(1)
    embs, labels = {}, {}
    for i in range(30):
        c = i % 2
        embs[f"n{i}"] = rng.normal(size=8) + (c * 4.0)
        labels[f"n{i}"] = c
    assert cosine_class_gap(embs, labels) > 0.2
    assert silhouette(embs, labels) > 0.2
    path = tsne_plot(embs, labels, str(tmp_path / "tsne.png"))
    import os
    assert os.path.getsize(path) > 1000
