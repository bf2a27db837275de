"""Property-level invariants of the budget-mode dispatch (VERDICT r3 #8).

The budget-mode cone dispatch (sap.py sdp_solve budget branch,
mosap.py:393-) is a race of three candidate paths -- homogeneity ray,
t-epigraph, direct-eps bisection rescue -- with subtle guards
(solve-scale vs budget-scale ``e.m`` thresholds, tightness checks,
certified-cap-floor acceptance).  The 120-instance stress corpus
exercises it broadly but lives outside the quick loop; this module is
the fast guard that fails IMMEDIATELY when a future edit to those
guards breaks an invariant:

  * returned allocation is nonnegative and covers every output
    (``e . m >= 1``);
  * budget-feasible: spend <= budget (up to solver tolerance);
  * no caps -> the budget is actually SPENT (cost(v) is continuous in
    the variance level, so the true optimum never underspends);
  * caps -> every cap row holds;
  * frontier optimality: the achieved worst variance is within a few
    percent of the best point ANY independent solver family (scipy NLP,
    SPG) finds at the same budget.

All instances share ONE problem shape (M=4, K=2, L=10) so the whole
module compiles a handful of cone programs once and re-runs them across
seeds -- this keeps it inside the quick loop (<~30 s warm).
"""

from itertools import combinations

import numpy as np
import pytest

from bluest_tpu.allocation.mosap import MOSAP
from bluest_tpu.allocation.sap import SAP, caps_satisfied

M = 4
K = 2


def _groups():
    return [[list(c) for c in combinations(range(M), k)]
            for k in range(1, K + 1)]


def _instance(seed):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((M, M))
    C = B @ B.T + 0.1 * np.eye(M)
    # descending costs, ~2 decades
    costs = np.sort(np.exp(rng.uniform(0.0, np.log(100.0), M)))[::-1]
    groups = _groups()
    flat = [g for gk in groups for g in gk]
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    budget = float(10 ** rng.uniform(2.5, 4.5)) * gcosts.min() \
        + 3 * float(min(c for g, c in zip(flat, gcosts) if 0 in g))
    return rng, C, groups, gcosts, budget


def _check_common(m, sap_or_mos, gcosts, budget):
    m = np.asarray(m, dtype=float)
    assert np.all(m >= -1e-12)
    assert float(sap_or_mos.e @ m) >= 1.0 - 1e-9 if hasattr(
        sap_or_mos, "e") else True
    spent = float(m @ gcosts)
    assert spent <= 1.0002 * budget
    return m, spent


@pytest.mark.parametrize("seed", range(6))
def test_sap_budget_no_caps_invariants(seed):
    _, C, groups, gcosts, budget = _instance(seed)
    sap = SAP(C, K, groups, gcosts)
    m = sap.solve(budget=budget, continuous_relaxation=True)
    assert m is not None and sap.n_nlp_fallbacks == 0
    m, spent = _check_common(m, sap, gcosts, budget)
    # no caps: the optimum spends the budget
    assert spent >= 0.99 * budget
    v_sdp = sap._variance_of(m)
    assert np.isfinite(v_sdp) and v_sdp > 0

    # frontier: no independent family may beat the dispatch's point by
    # more than solver tolerance at the same budget
    rivals = []
    for solver in ("scipy", "spg"):
        s2 = SAP(C, K, groups, gcosts)
        m2 = s2.solve(budget=budget, continuous_relaxation=True,
                      solver=solver)
        if m2 is not None:
            m2 = np.asarray(m2, dtype=float)
            if float(m2 @ gcosts) <= 1.001 * budget:
                rivals.append(s2._variance_of(m2))
    assert rivals, "no rival solver produced a feasible point"
    assert v_sdp <= 1.02 * min(rivals) + 1e-300


@pytest.mark.parametrize("seed", range(3))
def test_sap_budget_caps_invariants(seed):
    rng, C, groups, gcosts, budget = _instance(100 + seed)
    caps = np.full(M, np.inf)
    # cap the two cheapest models (where the optimizer wants volume)
    caps[M - 1] = float(10 ** rng.uniform(2, 3))
    caps[M - 2] = float(10 ** rng.uniform(2, 3))
    sap = SAP(C, K, groups, gcosts)
    m = sap.solve(budget=budget, continuous_relaxation=True,
                  max_model_samples=caps)
    assert m is not None and sap.n_nlp_fallbacks == 0
    m, spent = _check_common(m, sap, gcosts, budget)
    es, rhs = sap.get_max_sample_constraints(caps)
    assert caps_satisfied(m, es, rhs)
    v_sdp = sap._variance_of(m)

    # underspend is legal only when a cap binds (the cap floor); if all
    # cap rows are slack the budget must be spent
    slack = all(float(e @ m) <= 0.95 * r for e, r in zip(es, rhs))
    if slack:
        assert spent >= 0.99 * budget

    # rival: the scipy NLP path under the same caps
    s2 = SAP(C, K, groups, gcosts)
    m2 = s2.solve(budget=budget, continuous_relaxation=True,
                  solver="scipy", max_model_samples=caps)
    if m2 is not None:
        m2 = np.asarray(m2, dtype=float)
        if (float(m2 @ gcosts) <= 1.001 * budget
                and caps_satisfied(m2, es, rhs)):
            assert v_sdp <= 1.02 * s2._variance_of(m2) + 1e-300


@pytest.mark.parametrize("seed", range(3))
def test_mosap_budget_invariants(seed):
    rng = np.random.default_rng(300 + seed)
    Cs = []
    for _ in range(2):
        B = rng.standard_normal((M, M))
        Cs.append(B @ B.T + 0.1 * np.eye(M))
    groups = _groups()
    flat = [g for gk in groups for g in gk]
    costs = np.sort(np.exp(rng.uniform(0.0, np.log(100.0), M)))[::-1]
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    budget = float(10 ** rng.uniform(2.5, 4.5)) * gcosts.min() \
        + 3 * float(min(c for g, c in zip(flat, gcosts) if 0 in g))
    mos = MOSAP(Cs, K, [K] * 2, groups, [groups] * 2, gcosts,
                [gcosts] * 2, verbose=False)
    m = mos.solve(budget=budget, continuous_relaxation=True)
    assert m is not None and mos.n_nlp_fallbacks == 0
    m = np.asarray(m, dtype=float)
    assert np.all(m >= -1e-12)
    spent = float(m @ gcosts)
    assert spent <= 1.0002 * budget
    assert spent >= 0.99 * budget           # no caps: spend it
    # every output covered
    es_all = mos.get_max_sample_constraints(None)
    for n in range(2):
        en = np.zeros(len(flat))
        en[mos.mappings[n]] = mos.e[mos.mappings[n]]
        assert float(en @ m) >= 1.0 - 1e-9
    del es_all
    Vs = np.asarray(mos.variances(m), dtype=float)
    assert np.all(np.isfinite(Vs)) and np.all(Vs > 0)

    # frontier: feed the achieved variances back as eps tolerances; the
    # eps-mode solve must not do the same job for (meaningfully) less
    mos2 = MOSAP(Cs, K, [K] * 2, groups, [groups] * 2, gcosts,
                 [gcosts] * 2, verbose=False)
    m2 = mos2.solve(eps=np.sqrt(Vs), continuous_relaxation=True)
    assert m2 is not None
    assert spent >= 0.98 * float(np.asarray(m2, float) @ gcosts)
