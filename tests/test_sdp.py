"""Interior-point cone solver tests: analytic optima, KKT residuals, and a
real MLBLUE allocation cross-checked against scipy trust-constr."""

import numpy as np
import pytest
from itertools import combinations

from bluest_tpu.solvers.sdp import solve_cone_lp
from bluest_tpu.core import GroupStructure, psi as psimod


def test_pure_lp():
    # min -x1 - 2 x2  s.t. 0 <= x <= 1  ->  x* = (1, 1)
    c = np.array([-1.0, -2.0])
    Gl = np.vstack([np.eye(2), -np.eye(2)])
    hl = np.array([1.0, 1.0, 0.0, 0.0])
    res = solve_cone_lp(c, Gl, hl)
    assert res.status in ("optimal", "inaccurate")
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-8)


def test_min_eig_sdp():
    # min x  s.t.  [[x, 1], [1, x]] >= 0  ->  x* = 1
    c = np.array([1.0])
    As = np.array([[[[-1.0, 0.0], [0.0, -1.0]]]])  # (nb=1, nx=1, 2, 2)
    Hs = np.array([[[0.0, 1.0], [1.0, 0.0]]])
    res = solve_cone_lp(c, None, None, As, Hs)
    assert res.status in ("optimal", "inaccurate")
    np.testing.assert_allclose(res.x, [1.0], atol=1e-7)


def test_lp_plus_sdp_blocks():
    # min x1 + x2 s.t. x >= 0, diag(x1, x2) >= I (two 1x1-ish blocks in one
    # 2x2 block): optimum (1, 1)
    c = np.array([1.0, 1.0])
    Gl = -np.eye(2)
    hl = np.zeros(2)
    A1 = np.zeros((2, 2, 2)); A1[0, 0, 0] = -1.0; A1[1, 1, 1] = -1.0
    As = A1[None]
    Hs = -np.eye(2)[None]
    res = solve_cone_lp(c, Gl, hl, As, Hs)
    assert res.status in ("optimal", "inaccurate")
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-7)


def _blue_sdp_budget(gs, psi, w, budget):
    """Budget-mode MLBLUE SDP in solver form (reference sap.py:260-275):
    x = (t, m_tilde), m_tilde = m / budget."""
    L = gs.L
    M = gs.M
    scale = 1.0 / np.abs(psi).sum(axis=0).mean()
    c = np.zeros(L + 1); c[0] = 1.0
    # LP: -x <= 0 ; w@m_tilde <= 1 ; -e@m_tilde <= -1/budget
    Gl = np.vstack([-np.eye(L + 1),
                    np.concatenate([[0.0], w]),
                    np.concatenate([[0.0], -gs.e])])
    hl = np.concatenate([np.zeros(L + 1), [1.0], [-1.0 / budget]])
    # PSD block: S = [[scale*PHI(m), sqrt(scale) e0], [., t]] >= 0
    As = np.zeros((1, L + 1, M + 1, M + 1))
    As[0, 0, M, M] = -1.0
    for g in range(L):
        As[0, 1 + g, :M, :M] = -scale * psi[:, g].reshape(M, M)
    Hs = np.zeros((1, M + 1, M + 1))
    Hs[0, M, 0] = Hs[0, 0, M] = np.sqrt(scale)
    return c, Gl, hl, As, Hs, scale


def test_single_model_budget_allocation():
    """M=1: V(m) = C00/m, optimum m = budget / w."""
    C = np.array([[2.5]])
    gs = GroupStructure(1, [[[0]]], C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.array([3.0])
    budget = 300.0
    c, Gl, hl, As, Hs, scale = _blue_sdp_budget(gs, psi, w, budget)
    res = solve_cone_lp(c, Gl, hl, As, Hs)
    assert res.status in ("optimal", "inaccurate")
    m = res.x[1:] * budget
    np.testing.assert_allclose(m, [100.0], rtol=1e-7)


@pytest.mark.parametrize("M,K", [(4, 2), (5, 3)])
def test_blue_budget_matches_scipy(M, K, rng):
    """Full MLBLUE budget allocation: SDP vs scipy trust-constr NLP on the
    smooth variance objective (reference sap.py:387-418 pathway)."""
    from scipy.optimize import minimize, LinearConstraint, Bounds
    import jax.numpy as jnp

    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(cc) for cc in combinations(range(M), k)]
              for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.linspace(2.0, 1.0, gs.L)
    budget = 100.0 * w.sum()

    c, Gl, hl, As, Hs, scale = _blue_sdp_budget(gs, psi, w, budget)
    res = solve_cone_lp(c, Gl, hl, As, Hs)
    assert res.status in ("optimal", "inaccurate")
    m_sdp = np.maximum(res.x[1:], 0) * budget
    v_sdp = float(psimod.variance(data, jnp.asarray(m_sdp)))

    def fg(m):
        v, g, _ = psimod.variance_grad_hess(data, jnp.asarray(m), nohess=True)
        return float(v), np.asarray(g)

    x0 = np.full(gs.L, budget / w.sum() / gs.L * 10)
    r = minimize(fg, x0, jac=True,
                 bounds=Bounds(1e-10 * np.ones(gs.L), np.inf * np.ones(gs.L)),
                 constraints=[LinearConstraint(w, -np.inf, budget)],
                 method="trust-constr",
                 options={"maxiter": 3000}, tol=1e-12)
    v_nlp = fg(r.x)[0]

    # SDP must be at least as good as the NLP local solve (convex problem:
    # both should agree to high accuracy)
    assert v_sdp <= v_nlp * (1 + 1e-5)
    np.testing.assert_allclose(v_sdp, v_nlp, rtol=1e-4)
    # budget respected
    assert m_sdp @ w <= budget * (1 + 1e-6)


def test_eps_mode_scaling_identity(rng):
    """eps-mode optimum is a scaled budget-mode optimum (variance is
    homogeneous of degree -1): check cost(eps) * V(budget-run) consistency."""
    M, K = 4, 2
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(cc) for cc in combinations(range(M), k)]
              for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.linspace(2.0, 1.0, gs.L)
    budget = 1000.0

    import jax.numpy as jnp
    c, Gl, hl, As, Hs, scale = _blue_sdp_budget(gs, psi, w, budget)
    res = solve_cone_lp(c, Gl, hl, As, Hs)
    m_b = np.maximum(res.x[1:], 0) * budget
    v_b = float(psimod.variance(data, jnp.asarray(m_b)))

    # scaled solution: m' = m * (v_b / eps^2) achieves variance eps^2 at
    # cost budget * v_b / eps^2
    eps2 = v_b / 7.0
    m_scaled = m_b * (v_b / eps2)
    v_scaled = float(psimod.variance(data, jnp.asarray(m_scaled)))
    np.testing.assert_allclose(v_scaled, eps2, rtol=1e-9)
