"""Core kernel tests: psi/PHI assembly, variance, gradient, Hessian.

Oracles: (a) dense numpy construction of PHI = sum_S m_S R_S^T C_S^-1 R_S,
(b) jax autodiff of the variance itself (the reference's closed forms
misc.py:479-505 must match d/dm of (PHI^+)_{00}).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from itertools import combinations

from bluest_tpu.core import GroupStructure, psi as psimod


def make_problem(M=6, K=3, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(c) for c in combinations(range(M), k)] for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    return gs, C


def dense_phi(gs, C, m):
    M = gs.M
    PHI = np.zeros((M, M))
    for gidx, g in enumerate(gs.flat_groups):
        R = np.zeros((len(g), M))
        R[np.arange(len(g)), g] = 1.0
        Cs = C[np.ix_(g, g)]
        PHI += m[gidx] * (R.T @ np.linalg.inv(Cs) @ R)
    return PHI


def test_psi_matches_dense_oracle(rng):
    gs, C = make_problem()
    data = psimod.GroupData.build(gs)
    m = rng.uniform(0.5, 3.0, gs.L)
    PHI = np.asarray(psimod.phi_of_m(data.psi, jnp.asarray(m)))
    np.testing.assert_allclose(PHI, dense_phi(gs, C, m), rtol=1e-10, atol=1e-10)
    # PHI is symmetric
    np.testing.assert_allclose(PHI, PHI.T, atol=1e-12)


def test_variance_matches_inverse(rng):
    gs, C = make_problem()
    data = psimod.GroupData.build(gs)
    m = rng.uniform(0.5, 3.0, gs.L)
    PHI = dense_phi(gs, C, m)
    v = float(psimod.variance(data, jnp.asarray(m)))
    np.testing.assert_allclose(v, np.linalg.inv(PHI)[0, 0], rtol=1e-9)
    # host version with nnz restriction agrees
    vh = psimod.host_variance(gs, np.asarray(data.psi), m)
    np.testing.assert_allclose(v, vh, rtol=1e-9)


def test_grad_hess_match_autodiff(rng):
    gs, C = make_problem(M=5, K=2)
    data = psimod.GroupData.build(gs)
    m = jnp.asarray(rng.uniform(0.5, 3.0, gs.L))

    def var_fn(mm):
        PHI = psimod.phi_of_m(data.psi, mm)
        return jnp.linalg.inv(PHI)[0, 0]

    v, g, H = psimod.variance_grad_hess(data, m)
    g_ad = jax.grad(var_fn)(m)
    H_ad = jax.hessian(var_fn)(m)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(float(v), float(var_fn(m)), rtol=1e-10)


def test_variance_with_sparse_m_matches_restricted_solve(rng):
    """Groups with m=0 leave uncovered models as zero rows; the Hermitian
    pinv must agree with the reference's restricted solve."""
    M = 6
    gs, C = make_problem(M=M, K=2)
    data = psimod.GroupData.build(gs)
    m = np.zeros(gs.L)
    # activate only groups covering models {0,1,2}
    for gidx, g in enumerate(gs.flat_groups):
        if max(g) <= 2:
            m[gidx] = 1.0 + gidx * 0.1
    v = float(psimod.variance(data, jnp.asarray(m)))
    vh = psimod.host_variance(gs, np.asarray(data.psi), m)
    np.testing.assert_allclose(v, vh, rtol=1e-8)


def test_cleanup_matrix_is_W(rng):
    """Cleanup matrix X (M,L) must satisfy X^T phi0 = -grad (both are W-based)."""
    gs, C = make_problem(M=5, K=3)
    data = psimod.GroupData.build(gs)
    m = jnp.asarray(rng.uniform(0.5, 2.0, gs.L))
    X = np.asarray(psimod.cleanup_matrix(data, m))
    PHI = np.asarray(psimod.phi_of_m(data.psi, m))
    phi0 = np.linalg.inv(PHI)[:, 0]
    _, g, _ = psimod.variance_grad_hess(data, m, nohess=True)
    np.testing.assert_allclose(X.T @ phi0, -np.asarray(g), rtol=1e-9, atol=1e-12)


def test_estimator_from_sums(rng):
    gs, C = make_problem(M=4, K=2)
    data = psimod.GroupData.build(gs)
    m = rng.integers(1, 10, gs.L).astype(float)
    sums = [rng.standard_normal(len(g)) * m[i] for i, g in enumerate(gs.flat_groups)]
    y = psimod.scatter_group_sums(data, sums)
    mu, var = psimod.estimator_from_sums(data, jnp.asarray(m), y)
    # oracle: y_i = sum over groups containing i of (C_S^-1 sums_S)_i
    y_ref = np.zeros(gs.M)
    for gidx, g in enumerate(gs.flat_groups):
        u = np.linalg.pinv(C[np.ix_(g, g)]) @ sums[gidx]
        for j, model in enumerate(g):
            y_ref[model] += u[j]
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-9)
    PHI = dense_phi(gs, C, m)
    np.testing.assert_allclose(float(mu), np.linalg.pinv(PHI)[0, :] @ y_ref, rtol=1e-9)
    mu_h, var_h = psimod.host_estimator(gs, np.asarray(data.psi), m, y_ref)
    np.testing.assert_allclose(float(mu), mu_h, rtol=1e-9)
    np.testing.assert_allclose(float(var), var_h, rtol=1e-9)
