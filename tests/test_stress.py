"""Randomized allocation stress tests: on a spread of random model
hierarchies, the SDP path must match or beat the NLP path, satisfy its
constraints, and the eps/budget modes must be mutually consistent."""

import numpy as np
import pytest
from itertools import combinations

from bluest_tpu.allocation import SAP, MOSAP

pytestmark = pytest.mark.slow


def random_spd_corr(M, rng, base_rho=0.9):
    """Covariance with an MLBLUE-like decaying correlation structure."""
    rho = base_rho ** np.abs(np.subtract.outer(np.arange(M), np.arange(M)))
    jitter = rng.standard_normal((M, M)) * 0.05
    jitter = (jitter + jitter.T) / 2
    C = rho + jitter
    w, V = np.linalg.eigh((C + C.T) / 2)
    C = (V * np.maximum(w, 1e-6)) @ V.T
    s = rng.uniform(0.5, 3.0, M)
    return C * np.outer(s, s)


@pytest.mark.parametrize("seed", range(6))
def test_sap_modes_consistent(seed):
    rng = np.random.default_rng(seed)
    M = int(rng.integers(3, 7))
    K = int(rng.integers(2, min(4, M) + 1))
    C = random_spd_corr(M, rng)
    groups = [[list(c) for c in combinations(range(M), k)]
              for k in range(1, K + 1)]
    L = sum(len(g) for g in groups)
    costs = np.sort(rng.uniform(1, 50, L))[::-1].copy()
    sap = SAP(C, K, groups, costs)

    budget = float(rng.uniform(50, 500)) * costs.max()
    m_b = sap.solve(budget=budget, continuous_relaxation=True)
    assert m_b is not None
    v_b = sap.variance(m_b)
    assert np.isfinite(v_b) and v_b > 0
    assert m_b @ costs <= budget * (1 + 1e-6)

    # NLP must not beat the SDP by more than solver noise
    m_s = sap.solve(budget=budget, solver="scipy",
                    continuous_relaxation=True)
    v_s = sap.variance(np.maximum(m_s, 0))
    assert v_b <= v_s * 1.02

    # eps mode hits its tolerance at (near-)minimal cost: re-solving the
    # budget problem at the eps-mode cost must not give lower variance
    # than eps^2 by more than solver noise
    eps = np.sqrt(2.0 * v_b)
    m_e = sap.solve(eps=eps, continuous_relaxation=True)
    v_e = sap.variance(np.maximum(m_e, 0))
    assert v_e <= eps ** 2 * 1.01
    cost_e = m_e @ costs
    m_b2 = sap.solve(budget=cost_e, continuous_relaxation=True)
    v_b2 = sap.variance(np.maximum(m_b2, 0))
    assert v_b2 <= eps ** 2 * 1.05  # same frontier point


@pytest.mark.parametrize("seed", range(3))
def test_mosap_integer_feasibility(seed):
    rng = np.random.default_rng(100 + seed)
    M, K, No = 5, 2, 2
    Cs = [random_spd_corr(M, rng) for _ in range(No)]
    groups = [[list(c) for c in combinations(range(M), k)]
              for k in range(1, K + 1)]
    mg = [[list(gk) for gk in groups] for _ in range(No)]
    wm = np.sort(rng.uniform(1, 30, M))[::-1].copy()
    costs = np.array([wm[list(g)].sum() for gk in groups for g in gk])
    mosap = MOSAP(Cs, K, [K] * No, [list(g) for g in groups], mg,
                  costs, [costs.copy() for _ in range(No)])

    eps = [np.sqrt(Cs[n][0, 0]) / rng.uniform(5, 30) for n in range(No)]
    m = mosap.solve(eps=eps)
    assert m is not None and m.dtype == np.int64
    Vs = mosap.variances(m.astype(float))
    for n in range(No):
        assert Vs[n] <= (eps[n] ** 2) * 1.05
    assert m @ mosap.e >= 1
