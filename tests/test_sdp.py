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


def test_wood_factor_matches_dense(rng):
    """_wood_factor/_wood_apply solve diag + W W^T systems to near
    machine precision across the d0 scale spread the IPM produces
    (~mu .. 1/mu), matching a dense Cholesky reference."""
    import jax.numpy as jnp
    from bluest_tpu.solvers.sdp import _wood_factor, _wood_apply

    nx, r = 120, 17
    W = rng.standard_normal((nx, r))
    # IPM-like diagonal: 12 decades of spread
    d0 = 10.0 ** rng.uniform(-6, 6, nx)
    H = np.diag(d0) + W @ W.T
    B = rng.standard_normal((nx, 3))
    X_ref = np.linalg.solve(H, B)
    fac = _wood_factor(jnp.asarray(d0), jnp.asarray(W))
    X = np.asarray(_wood_apply(fac, jnp.asarray(B)))
    resid = np.linalg.norm(H @ X - B) / np.linalg.norm(B)
    assert resid < 1e-8, resid
    np.testing.assert_allclose(X, X_ref, rtol=1e-6, atol=1e-9)
    # 1-D RHS path
    x1 = np.asarray(_wood_apply(fac, jnp.asarray(B[:, 0])))
    np.testing.assert_allclose(x1, X_ref[:, 0], rtol=1e-6, atol=1e-9)


def test_woodbury_solver_matches_dense_path(rng):
    """Forcing woodbury=True on a small MLBLUE program must reproduce
    the dense path's optimum (same solve_cone_lp contract)."""
    from itertools import combinations
    from bluest_tpu.core.groups import GroupStructure
    from bluest_tpu.core import psi as psimod

    M, K = 5, 2
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(cc) for cc in combinations(range(M), k)]
              for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.linspace(2.0, 1.0, gs.L)
    budget = 1000.0
    c, Gl, hl, As, Hs, scale = _blue_sdp_budget(gs, psi, w, budget)
    res_d = solve_cone_lp(c, Gl, hl, As, Hs, woodbury=False)
    res_w = solve_cone_lp(c, Gl, hl, As, Hs, woodbury=True)
    assert res_d.status in ("optimal", "inaccurate")
    assert res_w.status in ("optimal", "inaccurate")
    np.testing.assert_allclose(res_w.pobj, res_d.pobj, rtol=1e-5)
    # the optimum's zero entries carry solver-noise tails at ~1e-7 of the
    # budget scale; the objective comparison above is the real gate
    np.testing.assert_allclose(res_w.x, res_d.x, rtol=1e-3, atol=1e-6)


def test_woodbury_auto_rule():
    """Auto mode: on only when the structured form exists AND the rank
    gap pays (nx >= max(256, 1.5*rank)); explicit woodbury=True without
    the structured Gl raises."""
    from bluest_tpu.solvers.sdp import solve_cone_lp as scl
    import pytest as _pytest
    nx = 6
    c = np.ones(nx)
    Gl = np.vstack([np.ones((1, nx))])   # NOT the [-diag; rows] form
    hl = np.array([1.0])
    As = np.zeros((1, nx, 2, 2))
    As[0, :, 0, 0] = -1.0
    Hs = np.eye(2)[None]
    with _pytest.raises(ValueError):
        scl(c, Gl, hl, As, Hs, woodbury=True)


def test_structured_gl_zero_diag(rng):
    """A zero entry in the diag block is legal input: the structured
    hmat_lp assembly handles it (no dense fallback needed), Woodbury
    auto stays off, and explicit woodbury=True raises (its capacitance
    factorization divides by the diagonal)."""
    M, K = 4, 2
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(cc) for cc in combinations(range(M), k)]
              for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.linspace(2.0, 1.0, gs.L)
    budget = 500.0
    c, Gl, hl, As, Hs, scale = _blue_sdp_budget(gs, psi, w, budget)
    res_ref = solve_cone_lp(c, Gl, hl, As, Hs)
    # drop the (inactive) t >= 0 row: s_0 = 0 - 0 >= 0 is vacuous, the
    # optimum is unchanged, and the diag block now has a zero entry
    Gl0 = Gl.copy()
    hl0 = hl.copy()
    Gl0[0] = 0.0
    hl0[0] = 0.0
    res0 = solve_cone_lp(c, Gl0, hl0, As, Hs)
    assert res0.status in ("optimal", "inaccurate")
    np.testing.assert_allclose(res0.pobj, res_ref.pobj, rtol=1e-6)
    # zero entries carry ~1e-8 solver-noise tails; pobj is the real gate
    np.testing.assert_allclose(res0.x, res_ref.x, rtol=1e-4, atol=1e-6)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        solve_cone_lp(c, Gl0, hl0, As, Hs, woodbury=True)


def test_prewarm_retries_after_failed_warmup(monkeypatch):
    """A warm-up that fails through the worker-infra path RETURNS
    status='failed' (it does not raise), so the shape key must be
    un-marked or the first real solve silently pays the full trace."""
    from bluest_tpu.solvers import sdp

    calls = []

    def fake(c, Gl, hl, As, Hs, **kw):
        calls.append(1)
        return sdp.ConeLPResult(np.full(len(c), np.nan), "failed", 0,
                                np.inf, np.inf, np.inf, np.nan)

    monkeypatch.setattr(sdp, "solve_cone_lp", fake)
    key = (977, 1, 4, False, 0)          # unique L: avoid cross-test hits
    sdp._WARMED.discard(key)
    sdp.prewarm_mlblue(977, 1, 4)
    assert key not in sdp._WARMED
    sdp.prewarm_mlblue(977, 1, 4)
    assert len(calls) == 2               # retried, not no-opped


def test_corner_matrix_bit_order():
    """Row-by-row int32 generation must reproduce the reference
    unpackbits bit order exactly (the native corner filter and the
    randomized fallback both assume it)."""
    from bluest_tpu.solvers.integer import corner_matrix
    lb = np.array([1, 2, 3], dtype=np.int64)
    ub = np.array([2, 3, 4], dtype=np.int64)
    ms = corner_matrix(lb, ub)
    bits = ((np.arange(8)[:, None] >> np.arange(3)[None, :]) & 1)
    ref = np.vstack([lb, ub])[bits, np.arange(3)[None, :]].T
    np.testing.assert_array_equal(ms, ref)


def test_generic_covering_sdp_conservative_retry():
    """Generic (non-MLBLUE-shaped) covering SDPs can wedge the 0.99
    fraction-to-boundary off-center near the PSD boundary (clean descent
    to gap ~4e-3, then step collapse).  solve_cone_lp retries once at
    0.85 on a 'failed' status -- same compiled program, production
    instances unaffected -- and must then solve these."""
    from bluest_tpu.solvers.sdp import solve_cone_lp
    for seed in (1, 2, 3):               # the documented stalling seeds
        rng = np.random.default_rng(seed)
        nx, n = 6, 3
        B = rng.standard_normal((nx, n, n))
        S = B @ np.swapaxes(B, -1, -2) + 0.5 * np.eye(n)
        r = solve_cone_lp(np.ones(nx), -np.eye(nx), np.zeros(nx),
                          (-S)[None], (-np.eye(n))[None])
        assert r.status in ("optimal", "inaccurate"), (seed, r.status)
        assert r.gap < 1e-6


def test_tau_collapse_discriminates_unbounded_from_infeasible():
    """A tau collapse (done == 4) is discriminated by the final
    iterate's ray: a primal ray (Gx + s ~ 0, c'x < 0) certifies
    UNBOUNDED, a dual ray (G'z ~ 0, h'z < 0) certifies INFEASIBLE.
    Every collapse used to be labeled 'infeasible' -- wrong on
    unbounded programs, and a false 'certified' bound for
    budget_level_bisection's underspend acceptance."""
    from bluest_tpu.solvers.sdp import solve_cone_lp
    # unbounded LP: min -x  s.t.  x >= 0
    r = solve_cone_lp(np.array([-1.0]), np.array([[-1.0]]),
                      np.array([0.0]))
    assert r.status == "unbounded", r.status
    # unbounded SDP: min -x  s.t.  diag(x, 1) >= 0
    r2 = solve_cone_lp(np.array([-1.0]), None, None,
                       np.array([[[[-1.0, 0.0], [0.0, 0.0]]]]),
                       np.array([[[1.0, 0.0], [0.0, 1.0]]]))
    assert r2.status == "unbounded", r2.status
    # infeasible LP: x <= -1 and x >= 0 (dual-ray certificate)
    r3 = solve_cone_lp(np.array([1.0]), np.array([[1.0], [-1.0]]),
                       np.array([-1.0, 0.0]))
    assert r3.status == "infeasible", r3.status


def _random_mlblue_like(seed, L=40, No=2, n=4):
    rng = np.random.default_rng(seed)
    c = rng.random(L) + 0.5
    Gl = np.vstack([-np.eye(L), -rng.random((No, L))])
    hl = np.concatenate([np.zeros(L), -np.ones(No)])
    v = rng.standard_normal((No, L, n))
    As = -v[..., None] * v[..., None, :]
    Hs = np.tile(np.eye(n), (No, 1, 1)) * 5.0
    return c, Gl, hl, As, Hs


def test_warm_start_equivalent_and_faster():
    """Re-solving the identical cone program warm-starts from the cached
    HSD iterate (VERDICT r5 item 3): the returned point must agree with
    the cold solve to solver precision, in strictly fewer iterations."""
    from bluest_tpu.solvers import sdp as sdpmod
    c, Gl, hl, As, Hs = _random_mlblue_like(7)
    with sdpmod._WARM_LOCK:
        sdpmod._WARM_CACHE.clear()
    r_cold = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r_cold.status in ("optimal", "inaccurate")
    assert r_cold.dims["warm_start"] is False
    r_warm = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r_warm.status in ("optimal", "inaccurate")
    assert r_warm.dims["warm_start"] is True
    assert r_warm.iterations < r_cold.iterations
    scale = float(np.max(np.abs(r_cold.x))) + 1e-300
    assert np.max(np.abs(r_warm.x - r_cold.x)) / scale < 1e-6
    assert abs(r_warm.pobj - r_cold.pobj) <= 1e-8 * abs(r_cold.pobj)


def test_warm_start_no_cross_seeding():
    """Two different instances of the SAME shape must not share warm
    iterates (the cache key is a content hash, not a shape key)."""
    from bluest_tpu.solvers import sdp as sdpmod
    cA, GlA, hlA, AsA, HsA = _random_mlblue_like(11)
    cB, GlB, hlB, AsB, HsB = _random_mlblue_like(12)
    with sdpmod._WARM_LOCK:
        sdpmod._WARM_CACHE.clear()
    rA = solve_cone_lp(cA, GlA, hlA, AsA, HsA)
    assert rA.status in ("optimal", "inaccurate")
    rB = solve_cone_lp(cB, GlB, hlB, AsB, HsB)
    assert rB.status in ("optimal", "inaccurate")
    assert rB.dims["warm_start"] is False      # different content hash


def test_warm_start_disabled_by_env(monkeypatch):
    """BLUEST_TPU_IPM_WARM=0 must force every solve down the historical
    cold path (bit-exact wlam = 0 program)."""
    from bluest_tpu.solvers import sdp as sdpmod
    c, Gl, hl, As, Hs = _random_mlblue_like(13)
    with sdpmod._WARM_LOCK:
        sdpmod._WARM_CACHE.clear()
    monkeypatch.setenv("BLUEST_TPU_IPM_WARM", "0")
    r1 = solve_cone_lp(c, Gl, hl, As, Hs)
    r2 = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r1.dims["warm_start"] is False
    assert r2.dims["warm_start"] is False
    assert r1.iterations == r2.iterations
    with sdpmod._WARM_LOCK:
        assert not sdpmod._WARM_CACHE


def test_mixed_precision_woodbury_boundary(monkeypatch):
    """Mixed-precision experiment record (VERDICT r4 item 5): with
    BLUEST_TPU_IPM_GEMM_DTYPE=f32 the capacitance GEMM + apply matvecs
    run in f32 under f64 iterative refinement (symmetric D^{-1/2} split).
    Measured boundary: residuals refine to ~1e-13 while diag(d0) spans
    <= ~1e4, degrade at 1e8, and DIVERGE at the IPM endgame's ~1e12 span
    -- so f32 is fundamentally insufficient for the late-IPM normal
    matrix and the knob stays an off-by-default diagnostic (the f64
    default is bit-exact the historical path; see test_wood_factor_
    matches_dense).  This test pins both sides of that boundary so a
    future 'just flip it on' is caught."""
    import jax.numpy as jnp
    from bluest_tpu.solvers import sdp as sdpmod
    monkeypatch.setattr(sdpmod, "_GEMM_DTYPE_NAME", "f32")
    rng = np.random.default_rng(0)
    nx, r, k = 400, 60, 3
    W = rng.standard_normal((nx, r))
    B = rng.standard_normal((nx, k))
    H_of = lambda d0: np.diag(d0) + W @ W.T

    def resid(span):
        d0 = 10.0 ** rng.uniform(-span / 2, span / 2, nx)
        fac = sdpmod._wood_factor(jnp.asarray(d0), jnp.asarray(W))
        X = np.asarray(sdpmod._wood_apply(fac, jnp.asarray(B)))
        return float(np.linalg.norm(H_of(d0) @ X - B)
                     / np.linalg.norm(B))

    assert resid(4) <= 1e-9          # benign spans: refinement converges
    assert resid(12) > 1e-2          # endgame spans: diverges (measured
    #                                  ~1e6 -- NOT production-usable)
