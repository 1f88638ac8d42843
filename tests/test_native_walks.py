"""Native C++ walk engine vs closed-form walk distributions.

The engine must reproduce the papers' sampling exactly: DeepWalk first-order
transitions ∝ edge weight; node2vec second-order transitions ∝ weight ×
(1/p | 1 | 1/q). The rejection sampler is exact, so empirical frequencies
are pinned against closed-form probabilities, not against the NumPy walker
(different RNG streams)."""

import numpy as np
import pytest

from ml_function_tpu.embedding_pretrain.graph import from_edges
from ml_function_tpu.embedding_pretrain import native_walks

pytestmark = pytest.mark.skipif(not native_walks.native_available(),
                                reason="g++ unavailable")


def _edge_set(g):
    s = set()
    for v in range(g.num_nodes):
        for x in g.neighbors(v):
            s.add((v, int(x)))
    return s


def test_deepwalk_walks_are_paths():
    g = from_edges([("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
                    ("b", "d", 1.0), ("d", "a", 3.0)], undirected=True)
    walks = native_walks.deepwalk_walks_native(g, num_walks=20,
                                               walk_length=6, seed=0)
    assert walks.shape == (20 * g.num_nodes, 6)
    edges = _edge_set(g)
    deg = g.degrees()
    for row in walks:
        for u, v in zip(row[:-1], row[1:]):
            assert (int(u), int(v)) in edges or (deg[u] == 0 and u == v)


def test_deepwalk_dead_end_repeats():
    g = from_edges([("a", "b", 1.0)])  # directed: b has no out-edges
    walks = native_walks.deepwalk_walks_native(g, num_walks=4,
                                               walk_length=5, seed=1)
    b = g.name_to_id["b"]
    for row in walks:
        if row[1] == b or row[0] == b:
            tail = row[list(row).index(b):]
            assert (tail == b).all()


def test_deepwalk_transition_matches_weights():
    """From A with out-weights {B: 1, C: 3}, P(C) = 0.75."""
    g = from_edges([("A", "B", 1.0), ("A", "C", 3.0),
                    ("B", "A", 1.0), ("C", "A", 1.0)])
    a, c = g.name_to_id["A"], g.name_to_id["C"]
    walks = native_walks.deepwalk_walks_native(g, num_walks=4000,
                                               walk_length=2, seed=2)
    from_a = walks[walks[:, 0] == a]
    frac_c = float(np.mean(from_a[:, 1] == c))
    assert abs(frac_c - 0.75) < 0.03, frac_c


def test_deepwalk_deterministic_and_thread_invariant():
    g = from_edges([("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
                   undirected=True)
    w1 = native_walks.deepwalk_walks_native(g, 10, 8, seed=3, n_threads=1)
    w2 = native_walks.deepwalk_walks_native(g, 10, 8, seed=3, n_threads=4)
    np.testing.assert_array_equal(w1, w2)
    w3 = native_walks.deepwalk_walks_native(g, 10, 8, seed=4, n_threads=4)
    assert not np.array_equal(w1, w3)


def test_node2vec_second_order_distribution():
    """prev=A, cur=B, N(B)={A, C, D}, C ∈ N(A), D ∉ N(A): the exact
    second-order distribution is ∝ (1/p, 1, 1/q)."""
    p, q = 0.5, 2.0
    g = from_edges([("A", "B", 1.0), ("A", "C", 1.0), ("B", "C", 1.0),
                    ("B", "D", 1.0)], undirected=True)
    a, b, c, d = (g.name_to_id[x] for x in "ABCD")
    walks = native_walks.node2vec_walks_native(
        g, num_walks=6000, walk_length=3, p=p, q=q, seed=5)
    sel = walks[(walks[:, 0] == a) & (walks[:, 1] == b)]
    assert len(sel) > 1000  # first hop from A is uniform over {B, C}
    want = np.asarray([1 / p, 1.0, 1 / q])
    want = want / want.sum()
    got = np.asarray([np.mean(sel[:, 2] == x) for x in (a, c, d)])
    np.testing.assert_allclose(got, want, atol=0.03)
    assert abs(got.sum() - 1.0) < 1e-9  # no walker escaped N(B)


def test_node2vec_matches_python_engine_distribution():
    """Same second-order slice through the NumPy walker — both engines hit
    the same closed-form distribution."""
    from ml_function_tpu.embedding_pretrain.walks import node2vec_walks
    p, q = 2.0, 0.5
    g = from_edges([("A", "B", 1.0), ("A", "C", 1.0), ("B", "C", 2.0),
                    ("B", "D", 1.0)], undirected=True)
    a, b, c, d = (g.name_to_id[x] for x in "ABCD")
    want = np.asarray([1 / p, 2.0, 1 / q])  # weights: A=1, C=2, D=1
    want = want / want.sum()
    for walk_fn in (native_walks.node2vec_walks_native, node2vec_walks):
        walks = walk_fn(g, num_walks=6000, walk_length=3, p=p, q=q, seed=6)
        sel = walks[(walks[:, 0] == a) & (walks[:, 1] == b)]
        got = np.asarray([np.mean(sel[:, 2] == x) for x in (a, c, d)])
        np.testing.assert_allclose(got, want, atol=0.03)


def test_api_engine_dispatch():
    """DeepWalk(engine='native') and engine='python' both produce a full
    embedding dict; engine='bogus' raises."""
    from ml_function_tpu.embedding_pretrain.api import DeepWalk
    g = from_edges([("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
                    ("c", "d", 1.0)], undirected=True)
    for engine in ("native", "python"):
        embs = DeepWalk(g, num_walks=6, walk_length=5, dim=8,
                        engine=engine).transform()
        assert set(embs) == set("abcd")
        assert all(v.shape == (8,) for v in embs.values())
    with pytest.raises(ValueError):
        DeepWalk(g, engine="bogus").transform()
