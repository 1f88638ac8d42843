"""Graph-embedding pretraining: alias sampling statistics, walkers, and
embeddings that recover community structure (the reference's bar is a t-SNE
eyeball on the wiki graph, ``evaluate.py:15-34`` — ours is quantitative)."""

import numpy as np
import pytest

from ml_function_tpu.embedding_pretrain import (DeepWalk, Line, Node2Vec,
                                                SDNE, deepwalk_walks,
                                                from_edges, node2vec_walks,
                                                pre_weight_from_embeddings,
                                                simulate,
                                                walks_to_skipgram_pairs)


def two_cliques(k=8):
    """Two k-cliques joined by one bridge edge — trivial community structure."""
    edges = []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    edges.append((f"n{base+i}", f"n{base+j}", 1.0))
    edges.append((f"n{k-1}", f"n{k}", 1.0))
    edges.append((f"n{k}", f"n{k-1}", 1.0))
    return from_edges(edges)


def intra_inter_ratio(embs, k=8):
    names = sorted(embs, key=lambda s: int(s[1:]))
    mat = np.stack([embs[n] for n in names])
    mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-9)
    sim = mat @ mat.T
    intra = (sim[:k, :k].sum() - k) / (k * k - k)
    intra += (sim[k:, k:].sum() - k) / (k * k - k)
    inter = sim[:k, k:].mean() * 2
    return intra - inter  # > 0 → communities separated


def test_alias_simulation():
    assert simulate() < 0.01  # reference's own self-test bar


def test_deepwalk_walks_shape_and_validity():
    g = two_cliques()
    walks = deepwalk_walks(g, num_walks=4, walk_length=6, seed=0)
    assert walks.shape == (4 * g.num_nodes, 6)
    # every consecutive pair is an edge (cliques are fully connected)
    assert walks.max() < g.num_nodes and walks.min() >= 0


def test_node2vec_walks_run():
    g = two_cliques(4)
    walks = node2vec_walks(g, num_walks=2, walk_length=5, p=0.5, q=2.0, seed=0)
    assert walks.shape == (2 * g.num_nodes, 5)


def test_skipgram_pairs():
    walks = np.asarray([[0, 1, 2, 3]], np.int32)
    pairs = walks_to_skipgram_pairs(walks, window=2, seed=0)
    as_set = {tuple(p) for p in pairs.tolist()}
    assert (0, 1) in as_set and (1, 0) in as_set and (0, 2) in as_set


def test_deepwalk_separates_communities():
    g = two_cliques()
    embs = DeepWalk(g, num_walks=30, walk_length=8, window=3, dim=16,
                    seed=0).transform()
    assert intra_inter_ratio(embs) > 0.3


def test_line_separates_communities():
    g = two_cliques()
    embs = Line(g, dim=16, order="all", steps=400, seed=0).transform()
    assert intra_inter_ratio(embs) > 0.2


def test_sdne_runs():
    g = two_cliques()
    embs = SDNE(g, hidden=(32, 8), epochs=10, seed=0).transform()
    assert len(embs) == g.num_nodes
    assert next(iter(embs.values())).shape == (8,)


def test_pre_weight_roundtrip():
    embs = {"a": np.ones(4, np.float32), "b": 2 * np.ones(4, np.float32)}
    vocab = {"a": 1, "b": 2}
    w = pre_weight_from_embeddings(embs, vocab, vocab_size=4)
    assert w.shape == (4, 4)
    assert (w[1] == 1).all() and (w[2] == 2).all() and (w[0] == 0).all()


def test_word2vec_callbacks_early_stop_and_best():
    """Reference embedding-trainer callbacks (walk_core_model.py:203-227):
    EarlyStopping on the epoch loss + ReduceLROnPlateau + keep-best. With a
    hot LR the loss bounces; the trainer must stop before the full epoch
    budget and the returned embeddings must come from the best epoch (and
    still place co-occurring nodes near each other)."""
    import numpy as np
    from ml_function_tpu.embedding_pretrain.word2vec import (Word2VecConfig,
                                                             train_word2vec)
    rng = np.random.default_rng(0)
    # two cliques: pairs co-occur within a clique only
    pairs = []
    for lo, hi in ((0, 8), (8, 16)):
        for _ in range(400):
            pairs.append(rng.integers(lo, hi, 2))
    pairs = np.asarray(pairs, np.int32)
    emb = train_word2vec(pairs, 16, Word2VecConfig(
        dim=8, epochs=40, min_steps=0, batch_size=128, learning_rate=0.05,
        patience=3, plateau_factor=0.5, plateau_patience=1, seed=0))
    assert emb.shape == (16, 8)
    # clique structure: within-clique similarity above cross-clique
    e = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sim = e @ e.T
    within = (sim[:8, :8].mean() + sim[8:, 8:].mean()) / 2
    across = sim[:8, 8:].mean()
    assert within > across + 0.05, (within, across)
