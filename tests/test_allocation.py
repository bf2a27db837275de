"""SAP / MOSAP allocation tests, modeled on the reference's SAP self-test
(sap.py:458-497): solver agreement, constraint satisfaction, budget/eps
mode consistency."""

import numpy as np
import pytest
from itertools import combinations

from bluest_tpu.allocation import SAP, MOSAP


def make_sap(M=6, K=3, seed=0, verbose=False):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(c) for c in combinations(range(M), k)]
              for k in range(1, K + 1)]
    L = sum(len(g) for g in groups)
    costs = 1.0 + 5 * np.arange(L)[::-1].astype(float)
    return SAP(C, K, groups, costs, verbose=verbose), C, costs


def test_sap_budget_sdp_vs_scipy():
    sap, C, costs = make_sap(M=5, K=2)
    budget = 100 * costs.sum()
    m_sdp = sap.solve(budget=budget, solver="sdp", continuous_relaxation=True)
    m_sci = sap.solve(budget=budget, solver="scipy", continuous_relaxation=True)
    v_sdp = sap.variance(m_sdp)
    v_sci = sap.variance(m_sci)
    assert m_sdp @ costs <= budget * (1 + 1e-6)
    np.testing.assert_allclose(v_sdp, v_sci, rtol=1e-3)
    assert v_sdp <= v_sci * (1 + 1e-6)  # SDP should not be worse


def test_sap_eps_mode_meets_tolerance():
    sap, C, costs = make_sap(M=5, K=2)
    eps = np.sqrt(C[0, 0]) / 50
    m = sap.solve(eps=eps, solver="sdp")
    assert m is not None
    v = sap.variance(m.astype(float))
    assert v <= (1.001 * eps) ** 2 * 1.0001
    assert sap.tot_cost == m @ costs


def test_sap_budget_integer_projection():
    sap, C, costs = make_sap(M=5, K=2)
    budget = 100 * costs.sum()
    m = sap.solve(budget=budget, solver="sdp")
    assert m is not None
    assert m.dtype == np.int64
    assert m @ costs <= budget * 1.0002
    assert m @ sap.e >= 1


def test_sap_max_model_samples():
    sap, C, costs = make_sap(M=6, K=3)
    budget = 100 * costs.sum()
    mms = np.inf * np.ones(6)
    mms[-2:] = [10.0, 100.0]
    m = sap.solve(budget=budget, max_model_samples=mms, solver="sdp")
    assert m is not None
    es, rhs = sap.get_max_sample_constraints(mms)
    for ee, rr in zip(es, rhs):
        assert m @ ee <= rr


def make_mosap(M=5, K=2, No=2, seed=0, verbose=False):
    rng = np.random.default_rng(seed)
    Cs = []
    for n in range(No):
        A = rng.standard_normal((M, M))
        Cs.append(A @ A.T + M * np.eye(M))
    groups = [[list(c) for c in combinations(range(M), k)]
              for k in range(1, K + 1)]
    multi_groups = [[list(gk) for gk in groups] for n in range(No)]
    w_model = np.array([2.0 ** (M - i) for i in range(M)])
    costs = np.array([w_model[list(g)].sum() for gk in groups for g in gk])
    multi_costs = [costs.copy() for n in range(No)]
    Ks = [K] * No
    return (MOSAP(Cs, K, Ks, [list(g) for g in groups], multi_groups,
                  costs, multi_costs, verbose=verbose), Cs, costs)


def test_mosap_mappings_identity_when_same_groups():
    mosap, Cs, costs = make_mosap()
    for mp in mosap.mappings:
        np.testing.assert_array_equal(mp, np.arange(mosap.L))


def test_mosap_budget_solve():
    mosap, Cs, costs = make_mosap()
    budget = 200 * max(costs)
    m = mosap.solve(budget=budget, solver="sdp")
    assert m is not None
    assert m @ costs <= budget * 1.0002
    Vs = mosap.variances(m.astype(float))
    assert all(np.isfinite(Vs))
    # per-output SAP samples were installed
    for n in range(mosap.n_outputs):
        np.testing.assert_array_equal(mosap.SAPS[n].samples,
                                      m[mosap.mappings[n]])


def test_mosap_eps_solve_meets_tolerances():
    mosap, Cs, costs = make_mosap()
    eps = [np.sqrt(Cs[n][0, 0]) / 30 for n in range(2)]
    m = mosap.solve(eps=eps, solver="sdp")
    assert m is not None
    Vs = mosap.variances(m.astype(float))
    for n in range(2):
        assert Vs[n] <= (eps[n] ** 2) * 1.01


def test_mosap_budget_sdp_vs_scipy():
    mosap, Cs, costs = make_mosap(M=4, K=2)
    budget = 100 * max(costs)
    m_sdp = mosap.solve(budget=budget, solver="sdp",
                        continuous_relaxation=True)
    v_sdp = max(mosap.variances(m_sdp))
    m_sci = mosap.solve(budget=budget, solver="scipy",
                        continuous_relaxation=True)
    v_sci = max(mosap.variances(m_sci))
    np.testing.assert_allclose(v_sdp, v_sci, rtol=1e-2)
    assert v_sdp <= v_sci * (1 + 1e-4)


def test_mosap_cleanup_reduces_support():
    mosap, Cs, costs = make_mosap(M=5, K=2)
    budget = 500 * max(costs)
    m = mosap.solve(budget=budget, solver="sdp", continuous_relaxation=True)
    nnz_before = int(np.sum(m > 1e-9))
    mc = mosap.cleanup_solution(m.copy())
    V0 = max(mosap.variances(m))
    V1 = max(mosap.variances(mc))
    assert V1 <= V0 * (1 + 2e-4)
    assert int(np.sum(mc > 1e-9)) <= nnz_before


def test_budget_bisection_certified_cap_floor():
    """An underspending bisection result is accepted exactly when the
    level below it is CERTIFIED infeasible (caps bound the achievable
    spend -- the true optimum underspends); an uncertified underspend
    (first-order stall) is still rejected."""
    from bluest_tpu.allocation.sap import budget_level_bisection
    point = np.array([1.0, 2.0])

    def cost_at_certified(v):
        if v < 1.0:
            return None, np.inf, True       # tau-collapse certificate
        return point, 10.0, False           # spends 10% of budget=100

    def cost_at_stall(v):
        if v < 1.0:
            return None, np.inf, False      # solver stall, no certificate
        return point, 10.0, False

    assert budget_level_bisection(cost_at_certified, 4.0, 100.0) is point
    assert budget_level_bisection(cost_at_stall, 4.0, 100.0) is None


def test_direct_eps_validate_rejects_overcap():
    """An 'optimal'-status point that violates the caps must be rejected
    by the validator: oversampling a capped model FAKES a low variance,
    so the tolerance check alone would bless exactly the bad points."""
    from bluest_tpu.solvers.sdp import ConeLPResult
    sap, C, costs = make_sap(M=4, K=2, seed=5)
    mms = np.full(4, np.inf)
    mms[1] = 5.0
    es, rhs = sap.get_max_sample_constraints(mms)
    eps = np.sqrt(C[0, 0]) / 30
    meps = 100.0 / np.sqrt(max(C[0, 0], 1e-300) / eps ** 2)
    big = np.full(sap.L, 1e4) * meps ** 2   # hugely overcapped, tiny variance

    def fake(c, Gl, hl, As, Hs, **kw):
        return ConeLPResult(big, "optimal", 1, 0.0, 0.0, 0.0,
                            float(np.asarray(c) @ big))

    m = sap._direct_eps_solve(eps, es, rhs, {}, cone_solve=fake,
                              validate=True)
    assert m is None


def test_mosap_ray_cache_prefers_cleaned_ray():
    """A continuous-relaxation budget sweep caches the diffuse interior
    point on the budget ray; a later full solve must REPLACE it with the
    post-cleanup sparse ray, so warm budget re-solves (bench calibration,
    complexity sweeps) skip the null-space cleanup walk entirely."""
    mosap, Cs, costs = make_mosap(M=6, K=3)
    budget = 200 * max(costs)
    key = ("budget_ray", "sdp")

    m_cont = mosap.solve(budget=budget, solver="sdp",
                         continuous_relaxation=True)
    assert m_cont is not None
    ray = mosap._ray_cache[key]
    diffuse_nnz = int(np.sum(ray > 1e-12 * ray.max()))
    assert diffuse_nnz > 4 * mosap.N          # the regression's precondition

    m_full = mosap.solve(budget=budget, solver="sdp")
    assert m_full is not None
    ray = mosap._ray_cache[key]
    cleaned_nnz = int(np.sum(ray > 1e-12 * ray.max()))
    assert cleaned_nnz <= 4 * mosap.N
    assert cleaned_nnz < diffuse_nnz

    calls = []
    orig = mosap.cleanup_solution
    mosap.cleanup_solution = \
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    m2 = mosap.solve(budget=1.1 * budget, solver="sdp")
    assert m2 is not None
    assert not calls                          # warm re-solve: no cleanup


def test_mosap_estimator_assembly():
    mosap, Cs, costs = make_mosap(M=4, K=2)
    budget = 100 * max(costs)
    m = mosap.solve(budget=budget, solver="sdp")
    rng = np.random.default_rng(3)
    sums = [[rng.standard_normal(len(g)) * max(int(mi), 1)
             for g, mi in zip(mosap.flattened_groups, m)]
            for n in range(2)]
    mus, Vs = mosap.compute_BLUE_estimators(sums, m)
    assert len(mus) == 2 and Vs.shape == (2,)
    assert all(np.isfinite(Vs))


def test_native_corner_filter_matches_numpy(rng):
    """The C corner feasibility filter must reproduce the numpy masks."""
    from bluest_tpu import _native
    from bluest_tpu.solvers.integer import corner_matrix
    if not _native.available():
        pytest.skip("native library not built")

    LL = 11
    lb = rng.integers(0, 3, LL)
    ub = lb + rng.integers(0, 2, LL)
    w = rng.random(LL) + 0.5
    base_cost = 3.0
    budget = base_cost + float(w @ (lb + ub)) / 2
    e_rows = [rng.random(LL) * (rng.random(LL) > 0.5),
              rng.random(LL) * (rng.random(LL) > 0.5)]
    e_base = [0.3, 0.0]
    cap_rows = [rng.random(LL)]
    cap_rhs = [float(cap_rows[0] @ ub) * 0.7]

    ms = corner_matrix(np.asarray(lb, np.int64), np.asarray(ub, np.int64))
    ref = base_cost + w @ ms <= 1.0001 * budget
    for row, b in zip(e_rows, e_base):
        ref &= (b + row @ ms) >= 1.0
    for row, r in zip(cap_rows, cap_rhs):
        ref &= row @ ms <= r

    got = _native.corner_filter(lb, ub, base_cost, w, budget,
                                e_rows, e_base, cap_rows, cap_rhs)
    assert got is not None
    np.testing.assert_array_equal(got, ref)

    # eps mode: budget row disabled
    got2 = _native.corner_filter(lb, ub, base_cost, w, None,
                                 e_rows, e_base, [], [])
    ref2 = np.ones(ms.shape[1], bool)
    for row, b in zip(e_rows, e_base):
        ref2 &= (b + row @ ms) >= 1.0
    np.testing.assert_array_equal(got2, ref2)


# ------------------------- optimality certificates ---------------------- #

def test_sap_certificate_and_kkt():
    """Every cone solve records its IPM certificate, and the independent
    first-order KKT verifier confirms the continuous point (the role the
    reference's cross-vendor solver_test blocks play)."""
    sap, C, costs = make_sap(M=5, K=2)
    eps = np.sqrt(C[0, 0]) / 50
    m = sap.solve(eps=eps, solver="sdp", continuous_relaxation=True)
    assert m is not None
    assert len(sap.certificates) >= 1
    best = min(sap.certificates,
               key=lambda cc: max(cc["relgap"], cc["pres"], cc["dres"]))
    assert best["status"] in ("optimal", "inaccurate")
    assert best["relgap"] < 1e-4 and best["pres"] < 1e-5

    kkt = sap.kkt_certificate()
    assert kkt["stationarity"] < 1e-3
    assert kkt["primal_feasibility"] < 1e-6
    assert kkt["dual_infeasibility"] < 1e-3
    assert kkt["complementarity"] < 1e-3


def test_mosap_certificate_and_kkt():
    mosap, Cs, costs = make_mosap()
    eps = [np.sqrt(Cs[n][0, 0]) / 30 for n in range(2)]
    m = mosap.solve(eps=eps, solver="sdp", continuous_relaxation=True)
    assert m is not None
    assert len(mosap.certificates) >= 1
    best = min(mosap.certificates,
               key=lambda cc: max(cc["relgap"], cc["pres"], cc["dres"]))
    assert best["status"] in ("optimal", "inaccurate")
    assert best["relgap"] < 1e-4

    kkt = mosap.kkt_certificate()
    assert kkt["stationarity"] < 1e-3
    assert kkt["primal_feasibility"] < 1e-6
    # budget mode: verified against its own achieved variances
    mb = mosap.solve(budget=200 * max(costs), solver="sdp",
                     continuous_relaxation=True)
    assert mb is not None
    kkt_b = mosap.kkt_certificate()
    assert kkt_b["stationarity"] < 1e-3
    assert kkt_b["primal_feasibility"] < 1e-8


# ------------------- third solver family: projected gradient ------------ #

def test_sap_spg_matches_sdp_budget():
    """The SPG path is an algorithmically unrelated solver family; on a
    smooth instance it must land on the same optimum as the IPM (the
    reference's cross-solver agreement pattern, sap.py __main__ test)."""
    sap, C, costs = make_sap(M=5, K=2)
    budget = 100 * costs.sum()
    m_sdp = sap.solve(budget=budget, solver="sdp", continuous_relaxation=True)
    m_spg = sap.solve(budget=budget, solver="spg", continuous_relaxation=True)
    assert m_spg is not None
    assert m_spg @ costs <= budget * (1 + 1e-9)
    v_sdp, v_spg = sap.variance(m_sdp), sap.variance(m_spg)
    np.testing.assert_allclose(v_spg, v_sdp, rtol=2e-3)


def test_sap_spg_eps_mode():
    sap, C, costs = make_sap(M=5, K=2)
    eps = np.sqrt(C[0, 0]) / 50
    m = sap.solve(eps=eps, solver="spg", continuous_relaxation=True)
    assert m is not None
    v = sap.variance(m)
    np.testing.assert_allclose(v, eps ** 2, rtol=1e-6)
    # cost within a whisker of the SDP optimum
    m_sdp = sap.solve(eps=eps, solver="sdp", continuous_relaxation=True)
    assert m @ costs <= (m_sdp @ costs) * 1.01


def test_mosap_spg_matches_sdp():
    mosap, Cs, costs = make_mosap()
    budget = 200 * max(costs)
    m_sdp = mosap.solve(budget=budget, solver="sdp",
                        continuous_relaxation=True)
    m_spg = mosap.solve(budget=budget, solver="spg",
                        continuous_relaxation=True)
    assert m_spg is not None
    assert m_spg @ costs <= budget * (1 + 1e-9)
    v_sdp = max(mosap.variances(m_sdp))
    v_spg = max(mosap.variances(m_spg))
    # smoothed-max bias at the final temperature bounds the gap
    np.testing.assert_allclose(v_spg, v_sdp, rtol=2e-2)

    eps = [np.sqrt(Cs[n][0, 0]) / 30 for n in range(2)]
    m_eps = mosap.solve(eps=eps, solver="spg", continuous_relaxation=True)
    assert m_eps is not None
    Vs = mosap.variances(m_eps)
    for n in range(2):
        assert Vs[n] <= (eps[n] ** 2) * 1.0001


def test_reference_method_name_aliases():
    """The reference's vendor-named solver methods exist and route to the
    equivalent paths (cvxopt/cvxpy -> IPM, ipopt -> scipy NLP;
    reference sap.py:242/332/420, mosap.py:395/500/615)."""
    sap, C, costs = make_sap(M=4, K=2)
    budget = 50 * costs.sum()
    m1 = sap.cvxopt_solve(budget=budget)
    m2 = sap.cvxpy_solve(budget=budget)
    assert m1 is not None and m2 is not None
    np.testing.assert_allclose(sap.variance(m1), sap.variance(m2), rtol=1e-6)
    m3 = sap.ipopt_solve(budget=budget)
    assert m3 is not None
    get_phi, variance, variance_GH = sap.get_variance_functions()
    v = variance(m1)
    v2, g, H = variance_GH(m1)
    assert np.isclose(v, v2)
    assert get_phi(m1).shape == (4, 4)

    mosap, Cs, costs_m = make_mosap(M=4, K=2)
    mm = mosap.cvxopt_solve(budget=50 * max(costs_m))
    assert mm is not None
    # scalar eps through the reference calling convention (normalized
    # via check_input, mosap.py:395-396)
    eps_s = float(np.sqrt(Cs[0][0, 0]) / 20)
    me = mosap.cvxpy_solve(eps=eps_s)
    assert me is not None and len(mosap.certificates) >= 1
    mi = mosap.ipopt_solve(eps=eps_s)
    assert mi is not None
    with pytest.raises(ValueError):
        mosap.cvxopt_solve()


def test_mosap_spg_heterogeneous_eps():
    """Heterogeneous per-output tolerances through the SPG path: the
    homogeneity reduction must weight the smoothed max by eps_n^2, or
    the loosest output gets oversampled ~100x (review finding: 1.84x
    cost blow-up with the unweighted max)."""
    rng = np.random.default_rng(3)
    M = 3
    # output 0 helped by model 1, output 1 by model 2
    C0 = np.array([[1.0, 0.95, 0.1], [0.95, 1.0, 0.1], [0.1, 0.1, 1.0]])
    C1 = np.array([[1.0, 0.1, 0.95], [0.1, 1.0, 0.1], [0.95, 0.1, 1.0]])
    groups = [[[i] for i in range(M)],
              [list(c) for c in combinations(range(M), 2)]]
    L = sum(len(g) for g in groups)
    flat = [g for gk in groups for g in gk]
    costs = np.array([10.0, 1.0, 1.0])
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    mosap = MOSAP([C0, C1], 2, [2, 2], groups, [groups] * 2, gcosts,
                  [gcosts] * 2, verbose=False)
    eps = [0.02, 0.2]
    m_sdp = mosap.solve(eps=eps, solver="sdp", continuous_relaxation=True)
    m_spg = mosap.solve(eps=eps, solver="spg", continuous_relaxation=True)
    assert m_spg is not None
    Vs = mosap.variances(m_spg)
    for n in range(2):
        assert Vs[n] <= (eps[n] ** 2) * 1.0001
    c_sdp = float(m_sdp @ gcosts)
    c_spg = float(m_spg @ gcosts)
    assert c_spg <= 1.10 * c_sdp, (c_spg, c_sdp)


def test_infeasible_caps_certified():
    """Contradictory per-model caps: the HSD embedding's tau collapse is
    surfaced as status='infeasible' in the certificate (distinguishable
    from numerical failure), and the solve returns None."""
    sap, C, costs = make_sap(M=5, K=2)
    eps = np.sqrt(C[0, 0]) / 100.0          # needs ~1e4 samples
    caps = np.full(5, 2.0)                  # every model capped at 2
    m = sap.sdp_solve(eps=eps, max_model_samples=caps)
    assert m is None
    assert any(c["status"] == "infeasible" for c in sap.certificates)


class _FakeResult:
    def __init__(self, x, success):
        self.x = np.asarray(x, dtype=float)
        self.success = success
        self.status = 1 if success else 0


def test_nlp_nonconverged_infeasible_returns_none(monkeypatch):
    """A trust-constr run that hits maxiter AND returns an infeasible
    point must yield None (-> BLUESTError upstream), not a garbage
    allocation handed to integer projection (VERDICT r2 item 5)."""
    import scipy.optimize as sopt
    sap, C, costs = make_sap(M=5, K=2)
    budget = 100 * costs.sum()

    bad = np.full(sap.L, 1e12)   # violates the budget by orders of magnitude

    def fake_minimize(*a, **k):
        return _FakeResult(bad, success=False)

    monkeypatch.setattr(sopt, "minimize", fake_minimize)
    assert sap.scipy_solve(budget=budget) is None
    assert sap.solve(budget=budget, solver="scipy") is None

    # multi-output epigraph path: same contract
    mosap, Cs, gcosts = make_mosap(M=5, K=2, No=2)

    def fake_minimize_mo(*a, **k):
        return _FakeResult(np.full(mosap.L + 1, 1e12), success=False)

    monkeypatch.setattr(sopt, "minimize", fake_minimize_mo)
    assert mosap.scipy_solve(budget=100 * gcosts.sum()) is None


def test_nlp_nonconverged_but_feasible_is_kept():
    """The validation must NOT reject feasible points: a maxiter
    termination with a budget-feasible iterate is still usable."""
    from bluest_tpu.allocation.sap import validated_nlp_point
    x = np.array([1.0, 2.0, 3.0])
    r = _FakeResult(x, success=False)
    out = validated_nlp_point(r, lambda m: True)
    np.testing.assert_array_equal(out, x)
    assert validated_nlp_point(r, lambda m: False) is None
    r_ok = _FakeResult(x, success=True)
    out = validated_nlp_point(r_ok, lambda m: False)  # converged: kept
    np.testing.assert_array_equal(out, x)


def test_vendor_alias_updates_kkt_target():
    """cvxopt_solve/etc must leave kkt_certificate pointing at THEIR
    result, not a stale point from an earlier solve() (ADVICE r2)."""
    sap, C, costs = make_sap(M=5, K=2)
    budget = 100 * costs.sum()
    m1 = sap.solve(budget=budget, continuous_relaxation=True)
    m2 = sap.cvxopt_solve(budget=4 * budget)
    assert m2 is not None
    np.testing.assert_allclose(sap.continuous_solution, m2)
    rep = sap.kkt_certificate()   # certifies m2, not the stale m1
    assert rep["stationarity"] <= 1e-3, rep
    assert rep["dual_infeasibility"] <= 1e-3, rep


def test_capped_projection_is_projection():
    """Dykstra projection onto {m>=0, w.m<=B, E_i.m<=r_i}: feasibility +
    the variational inequality (x-p).(z-p) <= 0 for feasible z."""
    import jax.numpy as jnp
    from bluest_tpu.solvers.spg_alloc import capped_projection
    rng = np.random.default_rng(3)
    L = 12
    w = rng.random(L) + 0.5
    B = 3.0
    cap_rows = np.zeros((2, L))
    cap_rows[0, :4] = 1.0
    cap_rows[1, 6:] = 1.0
    cap_rhs = np.array([1.5, 2.0])
    proj = capped_projection(w, B, cap_rows, cap_rhs)
    for _ in range(5):
        x = rng.standard_normal(L) * 2
        p = np.asarray(proj(jnp.asarray(x)))
        assert p.min() >= -1e-12
        assert w @ p <= B * (1 + 1e-9)
        assert np.all(cap_rows @ p <= cap_rhs * (1 + 1e-9))
        for _ in range(20):
            z = rng.random(L)
            z = z / max(1.0, (w @ z) / B)
            z = z * min(1.0, float((cap_rhs /
                                    np.maximum(cap_rows @ z, 1e-300)).min()))
            assert (x - p) @ (z - p) <= 1e-6 * (1 + np.linalg.norm(x))


def test_sap_spg_caps_budget():
    """SPG family under per-model caps, budget mode: feasible and within
    10% variance of the IPM (three-family cross-check, VERDICT r2 #6)."""
    sap, C, costs = make_sap(M=6, K=3)
    budget = 100 * costs.sum()
    mms = np.full(6, np.inf)
    mms[-2:] = [10.0, 100.0]
    m_sdp = sap.solve(budget=budget, max_model_samples=mms, solver="sdp",
                      continuous_relaxation=True)
    m_spg = sap.solve(budget=budget, max_model_samples=mms, solver="spg",
                      continuous_relaxation=True)
    assert m_spg is not None
    es, rhs = sap.get_max_sample_constraints(mms)
    for ee, rr in zip(es, rhs):
        assert ee @ m_spg <= rr * 1.0001
    assert m_spg @ costs <= budget * 1.0001
    assert sap.variance(m_spg) <= 1.10 * sap.variance(m_sdp)


def test_sap_spg_caps_eps():
    """SPG family under a BINDING cap in eps mode (budget bisection):
    tolerance met, cap held, cost within 10% of the IPM."""
    sap, C, costs = make_sap(M=5, K=2)
    eps = np.sqrt(C[0, 0]) / 50
    m_unc = sap.solve(eps=eps, solver="sdp", continuous_relaxation=True)
    tot = np.array([sap.ES[i] @ m_unc for i in range(5)])
    i = int(np.argmax(tot[1:])) + 1
    caps = np.full(5, np.inf)
    caps[i] = max(tot[i] / 4.0, 2.0)
    m_sdp = sap.solve(eps=eps, max_model_samples=caps, solver="sdp",
                      continuous_relaxation=True)
    m_spg = sap.solve(eps=eps, max_model_samples=caps, solver="spg",
                      continuous_relaxation=True)
    assert m_sdp is not None and m_spg is not None
    es, rhs = sap.get_max_sample_constraints(caps)
    for ee, rr in zip(es, rhs):
        assert ee @ m_spg <= rr * 1.0001
    assert sap.variance(m_spg) <= (1.01 * eps) ** 2
    assert m_spg @ costs <= 1.10 * (m_sdp @ costs)


def test_mosap_spg_caps_eps():
    """Multi-output eps+caps through all three families agree."""
    mosap, Cs, gcosts = make_mosap(M=5, K=2, No=2)
    eps = [np.sqrt(Cs[n][0, 0]) / 40 for n in range(2)]
    m_unc = mosap.solve(eps=eps, solver="sdp", continuous_relaxation=True)
    # per-model totals via the cap-constraint rows themselves
    es_all, _ = mosap.get_max_sample_constraints(np.full(5, 1.0e18))
    totals = np.array([np.asarray(ee) @ m_unc for ee in es_all])
    i = int(np.argmax(totals[1:])) + 1
    caps = np.full(5, np.inf)
    caps[i] = max(totals[i] / 4.0, 2.0)
    m_sdp = mosap.solve(eps=eps, max_model_samples=caps, solver="sdp",
                        continuous_relaxation=True)
    m_spg = mosap.solve(eps=eps, max_model_samples=caps, solver="spg",
                        continuous_relaxation=True)
    assert m_sdp is not None and m_spg is not None
    es, rhs = mosap.get_max_sample_constraints(caps)
    for ee, rr in zip(es, rhs):
        assert ee @ m_spg <= rr * 1.0001
    Vs = mosap.variances(np.asarray(m_spg, float))
    for n in range(2):
        assert Vs[n] <= (1.01 * eps[n]) ** 2
    assert m_spg @ gcosts <= 1.10 * (m_sdp @ gcosts)


def test_eps_caps_budget_search_retries_failed_solves():
    """A solve that fails (None) at small budgets must be retried at
    doubled budgets, not abort the eps+caps search (late-r3 hardening);
    and failed bisection probes tighten the bracket from below."""
    from bluest_tpu.solvers.spg_alloc import eps_caps_budget_search
    calls = []

    def solve_at(B, x0):
        calls.append(B)
        return None if B < 12.0 else np.array([B])

    m = eps_caps_budget_search(solve_at, lambda m: 40.0 / m[0], B0=1.0)
    assert m is not None
    # frontier is at B=40; bracket tolerance 1e-4 relative
    assert abs(m[0] - 40.0) <= 40.0 * 2e-3
    assert any(b < 12.0 for b in calls)   # small-budget failures seen

    def never(B, x0):
        return None

    assert eps_caps_budget_search(never, lambda m: 1.0, B0=1.0) is None


def test_capped_projection_feasible_fixed_point():
    """A strictly feasible point is its own projection and must take the
    exact fast path (identity), not accumulate Dykstra sweep error."""
    import jax.numpy as jnp
    from bluest_tpu.solvers.spg_alloc import capped_projection
    L = 6
    w = np.ones(L)
    cap_rows = np.zeros((1, L))
    cap_rows[0, :2] = 1.0
    proj = capped_projection(w, 100.0, cap_rows, np.array([5.0]))
    x = np.array([1.0, 2.0, 3.0, 0.0, 0.5, 4.0])
    np.testing.assert_array_equal(np.asarray(proj(jnp.asarray(x))), x)


def test_capped_projection_zero_cap_rhs():
    """A zero cap RHS must zero ONLY that cap's support, not collapse the
    whole iterate (round-3 review finding: the global-shrink repair
    mapped feasible points to the zero vector)."""
    import jax.numpy as jnp
    from bluest_tpu.solvers.spg_alloc import capped_projection
    L = 4
    w = np.ones(L)
    cap_rows = np.zeros((1, L))
    cap_rows[0, 3] = 1.0
    proj = capped_projection(w, 10.0, cap_rows, np.array([0.0]))
    p = np.asarray(proj(jnp.asarray([1.0, 2.0, 3.0, 0.5])))
    assert p[3] == 0.0
    np.testing.assert_allclose(p[:3], [1.0, 2.0, 3.0], atol=1e-9)


def test_corner_pipeline_matches_sync():
    """The pipelined corner-variance fetch (one batched device_get) must
    be bit-identical to the synchronous per-chunk path it replaced --
    BLUEST_TPU_CORNER_PIPELINE=0 is the A/B knob."""
    from bluest_tpu.solvers import integer as integ

    rng = np.random.default_rng(3)
    M = 5
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    sap, _, costs = make_sap(M=M, K=2, seed=3)
    psi = np.asarray(sap.psi)
    LL = 9
    idx = np.arange(LL)
    ms = (rng.integers(0, 4, size=(LL, 2 * integ._CHUNK + 7))
          ).astype(np.float64)
    basephi = psi @ np.maximum(rng.integers(0, 3, size=sap.L), 0).astype(float)

    v_pipe = integ._corner_variances(basephi, psi[:, idx], ms)
    old = integ._PIPELINE
    integ._PIPELINE = False
    try:
        v_sync = integ._corner_variances(basephi, psi[:, idx], ms)
    finally:
        integ._PIPELINE = old
    np.testing.assert_array_equal(v_pipe, v_sync)


def test_cleanup_matrices_pipelined_matches_per_output():
    """MOSAP.get_cleanup_matrices (one batched gather across outputs)
    must equal the per-output SAP.get_cleanup_matrix scatter it
    replaced."""
    rng = np.random.default_rng(7)
    M, No = 4, 3
    Cs = []
    for n in range(No):
        A = rng.standard_normal((M, M))
        Cs.append(A @ A.T + M * np.eye(M))
    groups = [[[i] for i in range(M)],
              [list(c) for c in combinations(range(M), 2)]]
    costs = 1.0 + np.arange(M + len(groups[1]))[::-1].astype(float)
    mos = MOSAP(Cs, K=2, Ks=[2] * No, groups=groups,
                multi_groups=[groups] * No, costs=costs,
                multi_costs=[costs] * No)
    m = rng.uniform(0.5, 3.0, size=mos.L)
    X = mos.get_cleanup_matrices(m)
    ref = []
    for n in range(No):
        Xn = np.zeros((mos.N, mos.L))
        Xn[:, mos.mappings[n]] = mos.SAPS[n].get_cleanup_matrix(
            m[mos.mappings[n]])
        ref.append(Xn)
    np.testing.assert_allclose(X, np.vstack(ref), rtol=1e-12, atol=1e-14)


def test_eps_race_rejects_stalled_epigraph_point(monkeypatch):
    """Round-4 hardening: when the direct-eps solve dies (isolation
    worker infra crash) the dispatch falls to the scaled-budget-epigraph
    cross-check -- the form the direct one exists to dodge -- and a
    stalled 'inaccurate' iterate there passes every SELF-consistent
    check (its feasibility rescale is exact by homogeneity).  Observed
    once on the NS K=7 golden under pool stress: a 38%-low garbage cost.
    The independent first-order screen must reject such a point so the
    scipy NLP chain takes over."""
    from itertools import combinations

    from bluest_tpu.allocation import sap as sap_mod
    from bluest_tpu.allocation.sap import SAP
    from bluest_tpu.solvers import sdp

    rng = np.random.default_rng(3)
    M, K = 4, 2
    B = rng.standard_normal((M, M))
    C = B @ B.T + 0.1 * np.eye(M)
    groups = [[list(c) for c in combinations(range(M), k)]
              for k in range(1, K + 1)]
    flat = [g for gk in groups for g in gk]
    costs = np.sort(np.exp(rng.uniform(0.0, np.log(200.0), M)))[::-1]
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    eps = float(np.sqrt(C[0, 0]) * 0.03)

    # true optimum for reference (untouched solver)
    s_ref = SAP(C, K, groups, gcosts)
    m_ref = s_ref.solve(eps=eps, continuous_relaxation=True)
    c_ref = float(np.asarray(m_ref, float) @ gcosts)

    calls = []
    real = sdp.solve_cone_lp

    def fake(c, Gl, hl, As, Hs, **kw):
        calls.append(1)
        if len(calls) == 1:
            # direct-eps: simulated worker-infra failure
            return sdp.ConeLPResult(np.full(len(c), np.nan), "failed",
                                    0, np.inf, np.inf, np.inf, np.nan)
        # epigraph cross-check: a stalled iterate far from stationarity
        # that still looks 'inaccurate'-acceptable
        return sdp.ConeLPResult(np.ones(len(c)), "inaccurate", 7,
                                1e-3, 1e-6, 1e-4, 1.0)

    monkeypatch.setattr(sap_mod, "solve_cone_lp", fake)
    s = SAP(C, K, groups, gcosts)
    m = s.solve(eps=eps, continuous_relaxation=True)
    monkeypatch.setattr(sap_mod, "solve_cone_lp", real)
    assert len(calls) >= 2          # both cone forms were actually tried
    # the garbage point must NOT have been accepted: either the NLP
    # fallback produced a near-optimal point, or the solve failed honestly
    if m is not None:
        assert s.n_nlp_fallbacks == 1
        mv = float(np.asarray(m, float) @ gcosts)
        assert abs(mv - c_ref) <= 0.05 * c_ref
        assert s._variance_of(np.asarray(m, float)) <= 1.05 * eps ** 2
