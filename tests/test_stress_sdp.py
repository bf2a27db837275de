"""Randomized degenerate-instance stress corpus for the allocation stack.

The HSD interior-point solver plus the greedy integer projection must
handle rho -> 0.999 covariances, near-singular C (rank M/2 + 1e-6 ridge),
heterogeneous eps, and per-model caps WITHOUT ever falling back to the
scipy NLP (the round-1 crutch).  Acceptance:

  * zero NLP fallbacks across the corpus (asserted via n_nlp_fallbacks);
  * eps mode: every output's variance within 1.01 * eps^2;
  * budget mode: cost within the tolerance ladder's bound.  On very tight
    budgets the *nominal* integer problem can be infeasible -- flooring
    the continuous optimum frees less than one sample of the cheapest
    model-0 group -- and the ladder (reference mosap.py:238-287)
    correctly relaxes the budget by <= 10% before the round-up fallback.

The reference runs cvxopt at reltol 1e-4 on these problems (sap.py:37-43);
the corpus median relgap here is ~1e-7.
"""

from itertools import combinations

import numpy as np
import pytest

from bluest_tpu.allocation.mosap import MOSAP

N_INSTANCES = 120  # ~8 min on the 8-device CPU mesh (the round-2 gate:
                   # 100+ degenerate instances, zero NLP fallbacks)


def make_cov(rng, M, kind):
    if kind == "nearsing":
        r = max(1, M // 2)
        B = rng.standard_normal((M, r))
        return B @ B.T + 1e-6 * np.diag(rng.random(M) + 0.1)
    if kind == "rho999":
        s = rng.random(M) + 0.5
        return 0.999 * np.outer(s, s) + 0.001 * np.diag(s ** 2)
    B = rng.standard_normal((M, M))
    return B @ B.T + 0.1 * np.eye(M)


def build_instance(seed):
    rng = np.random.default_rng(seed)
    M = int(rng.choice([3, 5, 8]))
    No = int(rng.choice([1, 3]))
    K = int(rng.choice([2, 3]))
    kind = str(rng.choice(["nearsing", "rho999", "generic"]))
    Cs = [make_cov(rng, M, kind) for _ in range(No)]
    groups = [[list(c) for c in combinations(range(M), k)]
              for k in range(1, K + 1)]
    flat = [g for gk in groups for g in gk]
    costs = np.sort(np.exp(rng.uniform(0.0, np.log(50.0), M)))[::-1]
    gcosts = np.array([sum(costs[i] for i in g) for g in flat])
    mos = MOSAP(Cs, K, [K] * No, groups, [groups] * No, gcosts,
                [gcosts] * No, verbose=False)
    return rng, mos, Cs, flat, gcosts


@pytest.mark.parametrize("seed", range(N_INSTANCES))
def test_degenerate_instance_no_fallback(seed):
    rng, mos, Cs, flat, gcosts = build_instance(seed)
    No = mos.n_outputs
    M = mos.N
    cheapest_cover = min(c for g, c in zip(flat, gcosts) if 0 in g)
    mode = seed % 3

    if mode == 0:
        budget = float(10 ** rng.uniform(2, 6)) * gcosts.min() \
            + 3 * cheapest_cover
        m = mos.solve(budget=budget)
        assert m is not None
        # ladder bound: <= 10% relaxation rungs before round-up
        assert float(m @ gcosts) <= 1.1001 * budget
    elif mode == 1:
        eps = np.array([float(np.sqrt(Cs[n][0, 0]))
                        * 10 ** rng.uniform(-3, -1) for n in range(No)])
        m = mos.solve(eps=eps)
        assert m is not None
        Vs = mos.variances(np.asarray(m, float))
        assert all(v <= 1.01 * e ** 2 for v, e in zip(Vs, eps))
    else:
        eps = float(np.sqrt(max(C[0, 0] for C in Cs))) \
            * 10 ** rng.uniform(-3, -1)
        caps = np.full(M, np.inf)
        caps[0] = 3.0 * max(C[0, 0] for C in Cs) / eps ** 2 \
            * 10 ** rng.uniform(0, 2)
        m = mos.solve(eps=eps, max_model_samples=caps)
        assert m is not None
        assert all(np.asarray(ees) @ m <= rr for ees, rr in
                   zip(*mos.get_max_sample_constraints(caps)))

    # the round-1 scipy crutch must stay cold
    assert mos.n_nlp_fallbacks == 0
    # and the accepted cone solve must carry a certificate at least as
    # tight as the reference's cvxopt operating point (reltol 1e-4,
    # sap.py:37-43); median here is ~1e-7
    assert mos.certificates, "no cone-solve certificate recorded"
    best = min(mos.certificates,
               key=lambda c: max(c["relgap"], c["pres"], c["dres"]))
    assert best["status"] in ("optimal", "inaccurate")
    assert best["relgap"] <= 1e-4 and best["pres"] <= 1e-5


@pytest.mark.parametrize("seed", range(24))
def test_budget_with_caps_on_frontier(seed):
    """Budget mode under per-model caps (the mode the three-way corpus
    above does not reach): the continuous solution must spend the budget
    (or be cap-floored), respect the caps, stay IPM-only, and sit on the
    eps-mode frontier -- re-solving eps mode at the achieved max variance
    must cost no less than what was spent (up to solver accuracy).  This
    regime used to stall the t-epigraph IPM on degenerate instances and
    silently hand back grossly suboptimal NLP points (caught by the
    Matern golden); the direct-eps bisection rescue owns it now."""
    rng, mos, Cs, flat, gcosts = build_instance(1000 + seed)
    No = mos.n_outputs
    M = mos.N
    cheapest_cover = min(c for g, c in zip(flat, gcosts) if 0 in g)
    budget = float(10 ** rng.uniform(2.5, 5)) * gcosts.min() \
        + 3 * cheapest_cover
    caps = np.full(M, np.inf)
    # cap the two cheapest models (where the optimizer wants volume)
    for j in (M - 1, M - 2):
        caps[j] = float(10 ** rng.uniform(2, 4))
    m = mos.solve(budget=budget, max_model_samples=caps,
                  continuous_relaxation=True)
    assert m is not None
    assert mos.n_nlp_fallbacks == 0
    m = np.asarray(m, dtype=float)
    spent = float(m @ gcosts)
    assert spent <= 1.0002 * budget
    es, rhs = mos.get_max_sample_constraints(caps)
    for ees, rr in zip(es, rhs):
        assert float(ees @ m) <= 1.001 * rr + 1e-9
    # frontier consistency: the achieved worst variance, fed back as an
    # eps-mode tolerance with the same caps, costs what was spent
    Vs = mos.variances(m)
    eps_back = np.sqrt(np.maximum(np.asarray(Vs, dtype=float), 1e-300))
    mos2 = build_instance(1000 + seed)[1]
    m2 = mos2.solve(eps=eps_back, max_model_samples=caps,
                    continuous_relaxation=True)
    assert m2 is not None
    assert spent >= 0.98 * float(np.asarray(m2, float) @ gcosts)
