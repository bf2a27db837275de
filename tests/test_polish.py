"""Active-set Newton polish (allocation/polish.py): the machinery behind
the 1e-8 golden parity tier (VERDICT r3 item 2).

Solver families stop at their own tolerances (IPM ~1e-8 relgap, NLP
~1e-6); polish runs full Newton on the reduced KKT system through the
variance closures (a code path independent of every cone solver) and
must land DIFFERENT families' points on the SAME optimum to ~machine
precision -- that identity is what upgrades "three families agree to
1e-6" into a pinned 1e-8+ statement.
"""

from itertools import combinations

import numpy as np
import pytest

from bluest_tpu.allocation.mosap import MOSAP
from bluest_tpu.allocation.polish import polish_eps
from bluest_tpu.allocation.sap import SAP

M = 4
K = 2


def _groups(M=M, K=K):
    return [[list(c) for c in combinations(range(M), k)]
            for k in range(1, K + 1)]


def _sap_instance(seed, rho=None, M=M, K=K):
    rng = np.random.default_rng(seed)
    if rho is None:
        B = rng.standard_normal((M, M))
        C = B @ B.T + 0.1 * np.eye(M)
    else:
        s = np.linspace(1.0, 0.3, M)
        R = np.array([[rho ** abs(i - j) for j in range(M)]
                      for i in range(M)])
        np.fill_diagonal(R, 1.0)
        C = R * np.outer(s, s)
    groups = _groups(M, K)
    flat = [g for gk in groups for g in gk]
    costs = np.sort(np.exp(rng.uniform(0.0, np.log(100.0), M)))[::-1]
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    eps = float(np.sqrt(C[0, 0]) * 0.03)
    return C, groups, gcosts, eps


@pytest.mark.parametrize("seed", range(3))
def test_polish_reaches_machine_precision_from_ipm(seed):
    C, groups, gcosts, eps = _sap_instance(seed)
    sap = SAP(C, K, groups, gcosts)
    m = sap.solve(eps=eps, continuous_relaxation=True)
    raw_cost = float(np.asarray(m, float) @ gcosts)
    r = polish_eps(sap, m, eps)
    assert r["converged"]
    assert r["stationarity"] <= 1e-11
    assert r["feasibility"] <= 1e-11
    # polishing restores V = eps^2 exactly; from a solver-accurate
    # point the cost moves by at most the solver's own tolerance
    assert abs(r["cost"] - raw_cost) <= 1e-5 * raw_cost
    # and never above the raw point by more than that slack
    Vr = r["variances"]
    assert np.all(Vr <= (1 + 1e-9) * eps ** 2)


@pytest.mark.parametrize("seed", range(3))
def test_polish_makes_solver_families_identical(seed):
    """IPM and scipy NLP stop ~1e-6 apart; polished independently they
    must land on the SAME optimum (convex problem, same KKT system)."""
    C, groups, gcosts, eps = _sap_instance(10 + seed)
    s1 = SAP(C, K, groups, gcosts)
    m1 = s1.solve(eps=eps, continuous_relaxation=True)
    r1 = polish_eps(s1, m1, eps)
    s2 = SAP(C, K, groups, gcosts)
    m2 = s2.solve(eps=eps, continuous_relaxation=True, solver="scipy")
    r2 = polish_eps(s2, m2, eps)
    assert r1["converged"] and r2["converged"]
    assert abs(r1["cost"] - r2["cost"]) <= 1e-10 * r1["cost"]
    np.testing.assert_allclose(r1["variances"], r2["variances"],
                               rtol=1e-9)


def test_polish_multi_output_mosap():
    rng = np.random.default_rng(42)
    Cs = []
    for _ in range(2):
        B = rng.standard_normal((M, M))
        Cs.append(B @ B.T + 0.1 * np.eye(M))
    groups = _groups()
    flat = [g for gk in groups for g in gk]
    costs = np.sort(np.exp(rng.uniform(0.0, np.log(100.0), M)))[::-1]
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    eps = np.array([float(np.sqrt(Cs[n][0, 0]) * 0.03) for n in range(2)])

    mos1 = MOSAP(Cs, K, [K] * 2, groups, [groups] * 2, gcosts,
                 [gcosts] * 2, verbose=False)
    m1 = mos1.solve(eps=eps, continuous_relaxation=True)
    r1 = polish_eps(mos1, m1, eps)
    mos2 = MOSAP(Cs, K, [K] * 2, groups, [groups] * 2, gcosts,
                 [gcosts] * 2, verbose=False)
    m2 = mos2.solve(eps=eps, continuous_relaxation=True, solver="scipy")
    r2 = polish_eps(mos2, m2, eps)
    assert r1["converged"] and r2["converged"]
    assert abs(r1["cost"] - r2["cost"]) <= 1e-9 * r1["cost"]
    # active outputs sit exactly on their tolerances, inactive below
    for n in range(2):
        assert r1["variances"][n] <= (1 + 1e-9) * eps[n] ** 2


def test_polish_degenerate_ladder():
    """rho = 0.999 correlation ladder: the Hessian conditioning eats
    a few digits, but polish must still tighten the IPM point well past
    the 1e-8 target."""
    C, groups, gcosts, eps = _sap_instance(7, rho=0.999, M=5)
    sap = SAP(C, 2, groups, gcosts)
    m = sap.solve(eps=eps, continuous_relaxation=True)
    r = polish_eps(sap, m, eps)
    assert r["stationarity"] <= 1e-9
    assert r["feasibility"] <= 1e-9


def test_mosap_solve_polish_option():
    """solver_params={"polish": True} on the library surface: the
    continuous point is polished in place (eps mode, no caps), the cost
    can only improve, and the report is exposed."""
    C, groups, gcosts, eps = _sap_instance(5)
    mk = lambda: MOSAP([C], K, [K], groups, [groups], gcosts, [gcosts],
                       verbose=False)
    m_raw = mk().solve(eps=eps, continuous_relaxation=True)
    mos = mk()
    m_pol = mos.solve(eps=eps, continuous_relaxation=True,
                      solver_params={"polish": True})
    assert hasattr(mos, "polish_report")
    rep = mos.polish_report
    assert rep["feasibility"] <= 1e-9
    assert rep["stationarity"] <= 1e-8
    c_raw = float(np.asarray(m_raw, float) @ gcosts)
    c_pol = float(np.asarray(m_pol, float) @ gcosts)
    assert c_pol <= c_raw * (1 + 1e-12)


@pytest.mark.parametrize("seed", range(2))
def test_polish_with_binding_cap(seed):
    """Caps join the KKT system as linear rows (VERDICT r5 item 2): a
    cap binding at the optimum must be held exactly by the polished
    point, two solver families must polish to the same capped optimum,
    and capping can only cost more than the free optimum."""
    C, groups, gcosts, eps = _sap_instance(21 + seed)
    sap0 = SAP(C, K, groups, gcosts)
    m_free = np.asarray(sap0.solve(eps=eps, continuous_relaxation=True),
                        float)
    r_free = polish_eps(sap0, m_free, eps)
    # cap the busiest low-fidelity model at half its free usage:
    # guaranteed binding (and large enough to survive the library's
    # integer rounding of cap rhs values)
    usages = [float(sap0.ES[i] @ m_free) for i in range(sap0.N)]
    i_cap = 1 + int(np.argmax(usages[1:]))
    assert usages[i_cap] >= 4.0, "instance unusable for a binding cap"
    caps = np.full(sap0.N, np.inf)
    caps[i_cap] = max(0.5 * usages[i_cap], 2.0)
    rows = []
    for s_ in ("sdp", "scipy"):
        sap = SAP(C, K, groups, gcosts)
        m = sap.solve(eps=eps, continuous_relaxation=True, solver=s_,
                      max_model_samples=caps)
        es, rhs = sap.get_max_sample_constraints(caps)
        r = polish_eps(sap, np.asarray(m, float), eps, es=es, rhs=rhs)
        assert r["converged"], s_
        assert r["stationarity"] <= 1e-10, s_
        assert r["feasibility"] <= 1e-10, s_
        # the cap row is exactly tight and reported active
        assert 0 in r["active_caps"], s_
        assert float(es[0] @ r["m"]) == pytest.approx(rhs[0], rel=1e-9)
        assert np.all(r["variances"] <= (1 + 1e-9) * eps ** 2), s_
        # restricting the feasible set cannot help
        assert r["cost"] >= r_free["cost"] * (1 - 1e-10), s_
        rows.append(r)
    # cross-family identity at the capped optimum
    assert abs(rows[0]["cost"] - rows[1]["cost"]) <= 1e-9 * rows[0]["cost"]


def test_polish_respects_coverage_row():
    """The model-0 coverage constraint e.m >= 1 is part of the
    formulation (reference sap.py's own row); at large eps it binds and
    a coverage-blind polish walks to e.m < 1 'saving' cost on an
    infeasible point (observed on the Matern golden: e.m = 0.53, -0.7%
    cost).  The polish must keep it feasible and report it active."""
    C, groups, gcosts, _ = _sap_instance(31)
    sap = SAP(C, K, groups, gcosts)
    eps = 0.9 * float(np.sqrt(C[0, 0]))       # large eps: coverage binds
    m = sap.solve(eps=eps, continuous_relaxation=True)
    r = polish_eps(sap, np.asarray(m, float), eps)
    assert float(sap.e @ r["m"]) >= 1.0 - 1e-9
    assert r["feasibility"] <= 1e-8
    assert r["stationarity"] <= 1e-8
    if float(sap.e @ r["m"]) <= 1.0 + 1e-6:
        assert r["active_coverage"] == [0]
