"""Covariance-graph semantics and clique enumeration tests."""

import numpy as np
import networkx as nx  # oracle only; the library itself does not use it
import pytest

from bluest_tpu.graph import CovarianceGraph, cliques


def random_adj(M, p, seed):
    rng = np.random.default_rng(seed)
    A = rng.random((M, M)) < p
    A = np.triu(A, 1)
    A = A | A.T
    return A


@pytest.mark.parametrize("M,p,K", [(6, 0.5, 3), (8, 0.7, 4), (10, 0.4, 4), (5, 1.0, 5)])
def test_cliques_match_networkx(M, p, K):
    A = random_adj(M, p, seed=M)
    ours = {tuple(c) for c in cliques.enumerate_cliques(A, K)}
    G = nx.from_numpy_array(A.astype(float))
    ref = set()
    for c in nx.enumerate_all_cliques(G):
        if len(c) > K:
            break
        ref.add(tuple(sorted(c)))
    assert ours == ref


def test_connected_component():
    A = np.zeros((6, 6), dtype=bool)
    for i, j in [(0, 1), (1, 2), (3, 4)]:
        A[i, j] = A[j, i] = True
    assert cliques.connected_component(A, 0) == [0, 1, 2]
    assert cliques.connected_component(A, 3) == [3, 4]
    assert not cliques.is_connected(A)


def test_sentinel_decode_roundtrip():
    M = 4
    C = np.array([[2.0, np.nan, np.inf, 0.0],
                  [np.nan, 3.0, 1.0, np.nan],
                  [np.inf, 1.0, 4.0, 0.5],
                  [0.0, np.nan, 0.5, 5.0]])
    g = CovarianceGraph(C)
    # unknown entries
    assert g.unknown[0, 1] and g.unknown[1, 3]
    # uncouplable
    assert not g.couplable[0, 2]
    # known uncorrelated
    assert g.uncorrelated[0, 3]
    out = g.covariance()
    # uncouplable and unknown -> NaN in the user matrix (blue_models.py:166-179)
    assert np.isnan(out[0, 2]) and np.isnan(out[0, 1])
    assert out[0, 3] == 0.0
    assert out[2, 3] == 0.5 and out[2, 2] == 4.0

    # npz-format adjacency roundtrip
    A = g.adjacency()
    g2 = CovarianceGraph.from_adjacency(A)
    np.testing.assert_array_equal(g2.covariance(), out)


def test_check_prunes_uncorrelated():
    C = np.array([[2.0, 0.0], [0.0, 3.0]])
    g = CovarianceGraph(C)
    g.check(remove_uncorrelated=True)
    assert g.component == [0]
    out = g.covariance()
    assert np.isnan(out[0, 1])  # pruned edge reads as uncouplable


def test_estimation_and_projection_updates():
    C = np.nan * np.ones((3, 3))
    g = CovarianceGraph(C)
    assert g.missing_rows() == [0, 1, 2]
    g.set_estimated(0, 0, 2.0, 1.0)
    g.set_estimated(1, 1, 1.0, 1.0)
    g.set_estimated(2, 2, 1.0, 1.0)
    g.set_estimated(0, 1, 0.5, 0.35)
    g.set_estimated(0, 2, 1e-9, 1e-9)   # below tol -> uncorrelated
    g.set_estimated(1, 2, 0.2, 0.2)
    assert g.uncorrelated[0, 2]
    out = g.covariance()
    assert out[0, 2] == 0.0 and out[0, 1] == 0.5

    # projection: entry (1,2) becomes uncorrelated, all else updated
    C_new = np.array([[2.1, 0.45, np.inf],
                      [0.45, 1.05, np.inf],
                      [np.inf, np.inf, 0.95]])
    # keep (0,2) marker from earlier: projection says inf there too
    g.apply_projection(C_new)
    out = g.covariance()
    assert out[1, 2] == 0.0 and out[0, 1] == 0.45
    assert out[2, 2] == 0.95


def test_native_cliques_match_python():
    """Native C++ enumeration must agree with the Python bitmask DFS."""
    from bluest_tpu import _native
    if not _native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    for M, p, K in [(10, 0.5, 4), (25, 0.4, 4), (40, 0.6, 3)]:
        A = rng.random((M, M)) < p
        A = np.triu(A, 1); A = A | A.T
        nat = _native.enumerate_cliques(A, K)
        # direct python implementation (bypasses the dispatch)
        masks = cliques.adjacency_bitmasks(A)
        from bluest_tpu.graph.cliques import enumerate_cliques
        # nodes subset restriction too
        sub = list(range(0, M, 2))
        nat_sub = _native.enumerate_cliques(A, K, nodes=sub)
        assert {tuple(c) for c in nat_sub} <= {tuple(c) for c in nat}
        for c in nat_sub:
            assert all(v in sub for v in c)
