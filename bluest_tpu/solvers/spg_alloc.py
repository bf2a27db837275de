"""Projected-gradient continuous allocation solver (third solver family).

The reference ships four interchangeable continuous solvers and its
examples cross-check them (cvxopt/cvxpy SDPs + scipy/ipopt NLPs;
reference sap.py:242-456, solver_test blocks in bluest_NS.py:124-140).
bluest_tpu's first two families are the JAX interior-point cone solver
(solvers/sdp.py) and the scipy trust-constr NLP; this module adds a
third, algorithmically unrelated family: nonmonotone spectral projected
gradient (linalg/spg.py -- the optimizer the reference uses for
covariance projection) on the budget-constrained variance objective.
Eps-mode solves reduce to budget mode by homogeneity in the callers,
exactly like the NLP path (allocation/sap.py scipy_solve).

Two design points keep SPG honest on this objective:

* ``variance`` via pseudo-inverse is 0 at m = 0 (empty PHI), a spurious
  attractor inside the feasible set {m >= 0, w.m <= B}.  The objective
  here is the *regularized* variance ((PHI + delta0 I)^{-1})_00 with
  delta0 fixed from the starting point's PHI scale: it blows up like
  1/delta0 as m -> 0 (removing the attractor) and perturbs the optimum
  only at relative O(delta0 / ||PHI||) ~ 1e-10.  Solved with Cholesky
  (TPU f64 has no LU kernel).
* Projection onto {m >= 0, w.m <= B} is exact: clip, then if over
  budget a 64-step bisection on the KKT shift theta with
  m(theta) = max(x - theta w, 0).

Multi-output: smoothed max over per-output variances (log-sum-exp with
temperature continuation); the bias of the final temperature is below
the cross-validation tolerance this path exists to provide.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import psi as psimod
from ..linalg.spg import spg


def budget_projection(w, budget):
    """Exact Euclidean projection onto {m >= 0, w.m <= budget}."""
    w = jnp.asarray(w, dtype=jnp.float64)

    def proj(x):
        xp = jnp.maximum(x, 0.0)

        def fix(xp):
            hi0 = jnp.max(xp / jnp.maximum(w, 1e-300))

            def body(_, st):
                lo, hi = st
                mid = 0.5 * (lo + hi)
                over = w @ jnp.maximum(xp - mid * w, 0.0) > budget
                return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

            lo, hi = jax.lax.fori_loop(0, 64, body, (0.0, hi0))
            return jnp.maximum(xp - hi * w, 0.0)

        return jax.lax.cond(w @ xp > budget, fix, lambda v: v, xp)

    return proj


def _reg_variance(data, m, delta0):
    """((PHI(m) + delta0 I)^{-1})_00 via Cholesky (jax-traceable in m)."""
    PHI = psimod.phi_of_m(data.psi, m, 0.0) + delta0 * jnp.eye(data.M)
    cf = jax.scipy.linalg.cho_factor(PHI, lower=True)
    e0 = jnp.zeros(data.M).at[0].set(1.0)
    return jax.scipy.linalg.cho_solve(cf, e0)[0]


def _delta0_for(data, x0):
    PHI0 = np.asarray(psimod.phi_of_m(data.psi, jnp.asarray(x0), 0.0))
    return 1e-10 * float(np.mean(np.diag(PHI0)))


@partial(jax.jit, static_argnames=("data",))
def _spg_budget_single(data, w, budget, x0, f0, delta0, gtol):
    feval = lambda m: _reg_variance(data, m, delta0) / f0
    geval = jax.grad(feval)
    proj = budget_projection(w, budget)
    res = spg(feval, geval, proj, x0, eps=gtol, maxit=3000)
    return res.x, res.f, res.it


def solve_budget_spg(data, costs, budget):
    """Single-output budget-mode solve; returns the allocation (L,)."""
    w = np.asarray(costs, dtype=float)
    L = data.L
    x0 = np.full(L, 0.95 * budget / w.sum())
    delta0 = _delta0_for(data, x0)
    f0 = float(_reg_variance(data, jnp.asarray(x0), delta0))
    if not np.isfinite(f0) or f0 <= 0:
        return None
    # gradient scale: |grad of normalized objective| ~ 1/m-scale
    gtol = 1e-10 / (budget / w.sum())
    x, f, it = _spg_budget_single(data, jnp.asarray(w), budget,
                                  jnp.asarray(x0), f0, delta0, gtol)
    x = np.asarray(x)
    if not np.all(np.isfinite(x)) or int(it) == 0:
        # it == 0: the very first line search failed (NaN objective near
        # a singular PHI) and SPG returned the projected start -- finite
        # but not a solve
        return None
    return np.maximum(x, 0.0)


@partial(jax.jit, static_argnames=("datas", "temp"))
def _spg_budget_multi(datas, mappings, w, budget, x0, wts, delta0s,
                      temp, gtol):
    def feval(m):
        vs = jnp.stack([
            _reg_variance(d, m[mp], dd) / wt
            for d, mp, dd, wt in zip(datas, mappings, delta0s, wts)])
        return jax.scipy.special.logsumexp(temp * vs) / temp

    geval = jax.grad(feval)
    proj = budget_projection(w, budget)
    res = spg(feval, geval, proj, x0, eps=gtol, maxit=3000)
    return res.x, res.f, res.it


def solve_budget_spg_multi(datas: Sequence, mappings: Sequence,
                           L: int, costs, budget, weights=None):
    """Multi-output budget mode: min (smoothed) max_n V_n(m)/weights_n
    over the union allocation, with temperature continuation 16 -> 1024.

    ``weights`` (default all-ones) make the eps-mode homogeneity
    reduction correct for heterogeneous tolerances: minimizing
    max_n V_n/eps_n^2 at a fixed budget and rescaling lands on the
    min-cost point for the *per-output* tolerances, whereas the
    unweighted max would over-serve the loosest output (same role as
    eps_weights on the NLP path)."""
    w = np.asarray(costs, dtype=float)
    No = len(datas)
    weights = (np.ones(No) if weights is None
               else np.asarray(weights, dtype=float))
    x0 = np.full(L, 0.95 * budget / w.sum())
    delta0s = tuple(_delta0_for(d, x0[mp])
                    for d, mp in zip(datas, mappings))
    v0 = [float(_reg_variance(d, jnp.asarray(x0[mp]), dd)) / wt
          for d, mp, dd, wt in zip(datas, mappings, delta0s, weights)]
    s0 = float(max(v0))
    if not np.isfinite(s0) or s0 <= 0:
        return None
    # normalize so the smoothed objective is O(1) at the start
    wts = tuple(float(wt * s0) for wt in weights)
    gtol = 1e-10 / (budget / w.sum())
    mapp = tuple(jnp.asarray(mp) for mp in mappings)
    x = jnp.asarray(x0)
    for temp in (16.0, 128.0, 1024.0):
        # a failed stage returns its (finite) warm start unchanged, so
        # continuation degrades gracefully rather than losing progress
        x, f, it = _spg_budget_multi(tuple(datas), mapp, jnp.asarray(w),
                                     budget, x, wts, delta0s, temp, gtol)
    x = np.asarray(x)
    if not np.all(np.isfinite(x)):
        return None
    return np.maximum(x, 0.0)
