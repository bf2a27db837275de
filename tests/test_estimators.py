"""MLMC/MFMC closed forms and the integer corner search."""

import numpy as np
import pytest
from itertools import combinations

from bluest_tpu.estimators.closed_forms import (
    mlmc_allocation, mfmc_allocation, mfmc_check, mfmc_low_budget)
from bluest_tpu.solvers.integer import (
    feasible_integer_bounds, corner_matrix, best_integer_generic,
    best_integer_blue)
from bluest_tpu.core import GroupStructure, psi as psimod


def test_mlmc_continuous_matches_analytic():
    v = np.array([1.0, 0.25, 0.0625])
    w = np.array([8.0, 2.0, 0.5])
    budget = 1000.0
    ok, data = mlmc_allocation(v, w, budget=budget, continuous_relaxation=True)
    assert ok
    q = np.sum(np.sqrt(v * w))
    m_ref = np.maximum(budget / q * np.sqrt(v / w), 1)
    np.testing.assert_allclose(data["samples"], m_ref, rtol=1e-12)
    assert data["total_cost"] <= budget * (1 + 1e-12)


def test_mlmc_eps_mode_hits_tolerance():
    v = np.array([1.0, 0.25])
    w = np.array([4.0, 1.0])
    eps = 0.05
    ok, data = mlmc_allocation(v, w, eps=eps)
    assert ok
    assert data["error"] <= eps * (1 + 1e-6)


def test_mlmc_infeasible_on_nonfinite():
    ok, data = mlmc_allocation(np.array([1.0, np.inf]), np.array([1.0, 1.0]),
                               budget=10.0)
    assert not ok and data is None


def test_mfmc_allocation_budget():
    sigmas = np.array([1.0, 0.9, 0.8])
    rhos = np.array([1.0, 0.95, 0.7])
    costs = np.array([100.0, 10.0, 1.0])
    ok, data = mfmc_allocation(sigmas, rhos, costs, budget=10000.0)
    assert ok
    m = data["samples"]
    assert np.all(np.diff(m) >= 0) and m[0] >= 1
    assert data["total_cost"] <= 10000.0 * 1.0001
    # variance formula sanity: single-model limit (m equal) gives sigma0^2/m0
    var_eq = data["variance"](np.array([50.0, 50.0, 50.0]))
    np.testing.assert_allclose(var_eq, sigmas[0] ** 2 / 50.0, rtol=1e-12)


def test_mfmc_infeasible_cost_ratio():
    # equal costs cannot beat the correlation gain ratio between models 1,2
    sigmas = np.array([1.0, 1.0, 1.0])
    rhos = np.array([1.0, 0.99, 0.98])
    costs = np.array([1.0, 1.0, 1.0])
    ok, data = mfmc_allocation(sigmas, rhos, costs, budget=100.0)
    assert not ok


def test_mfmc_check_prescribed():
    sigmas = np.array([1.0, 0.9])
    rhos = np.array([1.0, 0.9])
    costs = np.array([50.0, 1.0])
    ok, data = mfmc_check(sigmas, rhos, costs, [10, 100])
    assert ok
    assert data["total_cost"] == 10 * 50 + 100 * 1


def test_mfmc_low_budget_recursion():
    rhos = np.array([1.0, 0.95, 0.8])
    costs = np.array([100.0, 10.0, 1.0])
    m = mfmc_low_budget(rhos, costs, budget=150.0)
    assert m[0] >= 1 and np.all(m >= 0)
    assert m @ costs <= 150.0 + costs[0]


def test_mfmc_low_budget_forced_order_inversion():
    """small_budget + the forced-common-order rescue: an inverted
    near-tie makes a level gain negative; the unclamped Gruber formula
    fed it into a sqrt and returned a NaN-derived degenerate schedule
    (with feasible=True -- the small_budget branch skips the corner
    search's validation).  The clamped path must return a finite,
    nested, >= 1 schedule, and an untouched naturally-sorted input must
    be bit-identical with clamp on or off."""
    from bluest_tpu.estimators.closed_forms import mfmc_allocation
    sigmas = np.array([2.0, 1.5, 1.2, 1.0])
    rhos = np.array([1.0, 0.95, 0.90, 0.96])     # |rho| NOT descending
    costs = np.array([100.0, 10.0, 5.0, 1.0])
    ok, data = mfmc_allocation(sigmas, rhos, costs, budget=1e4,
                               small_budget=True,
                               order=np.array([0, 1, 2, 3]))
    assert ok
    m = np.asarray(data["samples"], dtype=float)
    assert np.all(np.isfinite(m)) and m[0] >= 1
    assert np.all(m[:-1] <= m[1:])               # nesting
    assert np.isfinite(data["error"])
    # natural order: clamp must be a no-op
    r1 = mfmc_low_budget(np.array([1.0, 0.95, 0.8]),
                         np.array([100.0, 10.0, 1.0]), 150.0)
    r2 = mfmc_low_budget(np.array([1.0, 0.95, 0.8]),
                         np.array([100.0, 10.0, 1.0]), 150.0, clamp=True)
    np.testing.assert_array_equal(r1, r2)


def test_feasible_integer_bounds_ordering():
    sol = np.array([0.3, 7.6, 2.1, 0.0, 5.2])
    lb, ub, idx = feasible_integer_bounds(sol, N=3)
    # idx sorted by floor descending
    assert list(lb) == sorted(lb, reverse=True)
    for l, u, i in zip(lb, ub, idx):
        assert l == np.floor(sol[i]) and u == np.ceil(sol[i])


def test_corner_matrix_enumerates_all():
    lb = np.array([1, 3]); ub = np.array([2, 4])
    ms = corner_matrix(lb, ub)
    cols = {tuple(ms[:, i]) for i in range(ms.shape[1])}
    assert cols == {(1, 3), (2, 3), (1, 4), (2, 4)}


def test_best_integer_generic_simple():
    # minimize sum within budget; optimum is the floor everywhere
    sol = np.array([2.4, 3.6, 1.2])
    w = np.ones(3)
    obj = lambda m: float(np.sum((m - sol) ** 2))
    constr = lambda m: m @ w <= 8
    best, fval = best_integer_generic(sol, obj, constr, N=3)
    assert best @ w <= 8
    np.testing.assert_array_equal(best, np.array([2, 4, 1]))


def test_best_integer_blue_vs_bruteforce(rng):
    M, K = 4, 2
    A = rng.standard_normal((M, M)); C = A @ A.T + M * np.eye(M)
    groups = [[list(c) for c in combinations(range(M), k)] for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.linspace(3, 1, gs.L)
    sol = rng.uniform(0.2, 6.0, gs.L)
    budget = float(np.ceil(sol) @ w)  # generous budget

    best, fval = best_integer_blue(sol, psi, w, gs.e, budget=budget)
    assert best is not None
    assert best @ w <= 1.0001 * budget
    assert best @ gs.e >= 1
    v_best = np.linalg.pinv((psi @ best).reshape(M, M), hermitian=True)[0, 0]
    np.testing.assert_allclose(v_best, fval, rtol=1e-6)

    # brute force over the same bounds must not beat it
    lb, ub, idx = feasible_integer_bounds(sol, M, e=gs.e)
    ms = corner_matrix(lb, ub)
    val = np.round(sol).astype(int)
    vals = []
    for i in range(ms.shape[1]):
        val2 = val.copy(); val2[idx] = ms[:, i]
        if val2 @ w <= 1.0001 * budget and val2 @ gs.e >= 1:
            vals.append(np.linalg.pinv((psi @ val2).reshape(M, M),
                                       hermitian=True)[0, 0])
    assert fval <= min(vals) * (1 + 1e-9)


def _mk_problem(C, costs, **kw):
    from bluest_tpu.models.analytic import ExpSeriesProblem
    return ExpSeriesProblem(C.shape[0], C=C.copy(), costs=costs,
                            verbose=False, **kw)


def test_mfmc_rho_order_differs_from_index_order():
    """When |rho| ordering differs from the model-index ordering, the
    schedule must follow the CORRELATION order end-to-end: the reference
    silently prices sorted-order sample counts with clique-order costs
    (blue_models.py:849-856).  Here the emitted group itself is in
    |rho|-descending order, so counts, costs and alphas stay aligned."""
    # model 2 more correlated with 0 than model 1 is
    C = np.array([[1.00, 0.60, 0.95],
                  [0.60, 1.00, 0.55],
                  [0.95, 0.55, 1.00]])
    costs = np.array([16.0, 4.0, 1.0])
    p = _mk_problem(C, costs)
    data = p.setup_mfmc(eps=0.05)
    if len(data["models"]) == 3:
        assert list(data["models"]) == [0, 2, 1]
    m = np.asarray(data["samples"], dtype=float)
    assert np.all(m[:-1] <= m[1:])          # nesting in the emitted order
    w = costs[list(data["models"])]
    assert abs(float(m @ w) - data["total_cost"]) <= 1e-9 * data["total_cost"]
    # the full pipeline runs on the reordered group
    mu, errs, cost = p.solve_mfmc(mfmc_data=data)
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(errs))


def test_solve_mc_budget_below_one_sample():
    """A budget below one high-fidelity sample must clamp to one sample
    instead of dividing the estimator by zero."""
    C = np.eye(2) + 0.5
    p = _mk_problem(C, np.array([4.0, 1.0]))
    mu, errs, cost = p.solve_mc(budget=0.5)
    assert np.isfinite(mu[0]) and np.isfinite(errs[0])
    assert cost == 4.0                       # exactly one sample


def test_problem_pickle_roundtrip_resolves():
    """_mosap_key survives pickling but the MOSAP does not; the structure
    cache must rebuild instead of handing back MOSAP=None."""
    import pickle
    C = np.eye(3) + 0.5
    p = _mk_problem(C, np.array([4.0, 2.0, 1.0]),
                    covariance_estimation_samples=256)
    p.setup_solver(K=2, budget=500.0)
    q = pickle.loads(pickle.dumps(p))
    blue = q.setup_solver(K=2, budget=500.0)   # used to AttributeError
    assert blue["samples"] is not None


def test_reorder_refreshes_clique_universe():
    """reorder_all_graph_nodes must remap SG (the clique-enumeration
    universe) along with the graph labels."""
    C = np.eye(3) + 0.5
    C[0, 2] = C[2, 0] = np.inf            # model 2 uncouplable: pruned
    C[1, 2] = C[2, 1] = np.inf
    p = _mk_problem(C, np.array([4.0, 2.0, 1.0]))
    assert sorted(p.SG[0]) == [0, 1]
    p.reorder_all_graph_nodes([2, 1, 0])  # model 0 -> label 2
    assert sorted(p.SG[0]) == [1, 2]
    assert sorted(p.G[0].component) == sorted(p.SG[0])


def test_dv_fold_lower_triangle_and_reorder():
    """dV is consumed at (min, max); a lower-triangle user matrix or a
    permutation that moves finite entries below the diagonal must still
    be visible to MLMC level data."""
    C = np.eye(3) + 0.5
    dv = np.full((3, 3), np.nan)
    dv[2, 0] = 0.123                       # lower triangle only
    p = _mk_problem(C, np.array([4.0, 2.0, 1.0]), mlmc_variances=[dv])
    assert p.dV[0][0, 2] == 0.123          # folded up at construction
    v, w = p._mlmc_level_data([0, 2], 0)
    assert v[0] == 0.123                   # override actually consumed
    # a reorder moving the entry across the diagonal must re-fold
    p.reorder_all_graph_nodes([2, 1, 0])   # old 0 -> label 2, old 2 -> 0
    assert p.dV[0][0, 2] == 0.123


def test_compute_mlmc_mfmc_data_consistent_with_setup():
    """compute_ml(f)mc_data on setup_*'s own group/schedule must
    reproduce the setup's RMSE errors (same units: the reference returns
    the VARIANCE from compute_mlmc_data but the RMSE from setup_mlmc,
    blue_models.py:633 vs :732 -- documented divergence)."""
    C = np.array([[1.00, 0.60, 0.95],
                  [0.60, 1.00, 0.55],
                  [0.95, 0.55, 1.00]])
    costs = np.array([16.0, 4.0, 1.0])
    p = _mk_problem(C, costs)

    mlmc = p.setup_mlmc(eps=0.05)
    d = p.compute_mlmc_data(mlmc["models"], mlmc["samples"])
    np.testing.assert_allclose(d["errors"], mlmc["errors"], rtol=1e-12)
    assert d["total_cost"] == pytest.approx(mlmc["total_cost"])

    mfmc = p.setup_mfmc(eps=0.05)
    # compute_mfmc_data takes the clique in model-index order and returns
    # it re-sorted; feed the sorted group's index-ordered counterpart
    models = list(mfmc["models"])
    samples_by_model = dict(zip(models, np.asarray(mfmc["samples"])))
    clique = sorted(models)
    d2 = p.compute_mfmc_data(clique, [samples_by_model[m] for m in clique])
    assert list(d2["models"]) == models
    np.testing.assert_allclose(d2["errors"],
                               np.max(np.atleast_2d(mfmc["errors"]), axis=0)
                               if np.ndim(mfmc["errors"]) else mfmc["errors"],
                               rtol=1e-9)


def test_mfmc_randomized_order_consistency_and_optimality():
    """Seeded random 4-model instances: setup_mfmc must (a) emit the
    group in |rho|-descending order, (b) price it consistently, (c) keep
    the nested schedule, and (d) pick the cheapest feasible consistent
    clique (verified against exhaustive clique enumeration through the
    same closed form)."""
    from itertools import combinations
    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(25):
        M = 4
        A = rng.normal(size=(M, M + 2))
        C = A @ A.T
        d = np.sqrt(np.diag(C))
        C = C / np.outer(d, d)                  # correlation matrix
        scale = 1.0 + rng.random(M)
        C = C * np.outer(scale, scale)
        costs = np.sort(rng.uniform(1.0, 100.0, size=M))[::-1].copy()
        p = _mk_problem(C.copy(), costs)
        try:
            data = p.setup_mfmc(eps=0.05)
        except Exception:
            continue                            # infeasible instance
        models = list(data["models"])
        m = np.asarray(data["samples"], dtype=float)
        rho0 = np.abs(p.get_correlation(0)[0, :])
        # (a) |rho| descending along the emitted group
        r = rho0[models]
        assert np.all(r[:-1] >= r[1:] - 1e-12)
        # (b) cost consistency in the emitted order
        assert data["total_cost"] == pytest.approx(
            float(m @ costs[models]), rel=1e-9)
        # (c) nesting
        assert np.all(m[:-1] <= m[1:] + 1e-9)
        # (d) optimality among consistent cliques containing model 0
        from bluest_tpu.estimators.closed_forms import mfmc_allocation
        sig = np.sqrt(np.diag(p.get_covariance(0)))
        rho = p.get_correlation(0)[0, :]
        best = np.inf
        for k in (2, 3, 4):
            for cl in combinations(range(1, M), k - 1):
                clique = [0] + list(cl)
                okc, d2 = mfmc_allocation(sig[clique], rho[clique],
                                          costs[clique], eps=0.05)
                if okc:
                    best = min(best, d2["total_cost"])
        assert data["total_cost"] <= best * 1.0001
        checked += 1
    assert checked >= 10                        # tier must really exercise


def test_mlmc_randomized_chain_pruning_exact():
    """Seeded random instances: the batched bound-ordered chain pruning
    in setup_mlmc (and its raw-cost eps-mode bounds) must return exactly
    the best chain found by brute-force enumeration through the same
    closed form."""
    from itertools import combinations
    from bluest_tpu.estimators.closed_forms import mlmc_allocation
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(20):
        M = 5
        A = rng.normal(size=(M, M + 2))
        C = A @ A.T
        d = np.sqrt(np.diag(C))
        C = C / np.outer(d, d) * np.outer(np.linspace(2, 1, M),
                                          np.linspace(2, 1, M))
        costs = np.sort(rng.uniform(1.0, 200.0, size=M))[::-1].copy()
        p = _mk_problem(C.copy(), costs)
        for mode in ({"eps": 0.05}, {"budget": 5000.0}):
            try:
                data = p.setup_mlmc(**mode)
            except Exception:
                continue
            # brute force: every cost-descending chain starting at 0
            w = p.get_costs()
            best = np.inf
            for k in range(1, M + 1):
                for cl in combinations(range(1, M), k - 1):
                    chain = [0] + sorted(cl)      # costs sorted descending
                    v, subw = p._mlmc_level_data(chain, 0)
                    ok, dd = mlmc_allocation(v, subw, **mode)
                    if not ok:
                        continue
                    if "eps" in mode:
                        obj = np.asarray(dd["samples"]) @ w[chain]
                    else:
                        obj = dd["error"]
                    best = min(best, obj)
            if not np.isfinite(best):
                continue
            if "eps" in mode:
                assert data["total_cost"] <= best * 1.001
            else:
                assert max(np.atleast_1d(data["errors"])) <= best * 1.01
            checked += 1
    assert checked >= 15
