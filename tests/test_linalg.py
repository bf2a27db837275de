"""SPG and SPD projection tests (reference spec: spg.py:134-165 self-test)."""

import numpy as np
import jax.numpy as jnp

from bluest_tpu.linalg.spg import spg
from bluest_tpu.linalg.spd import (clip_spd, project_covariance_full,
                                   project_covariance_masked, mark_uncorrelated)


def test_spg_quadratic():
    """Unconstrained quadratic: SPG must find the exact minimizer."""
    rng = np.random.default_rng(1)
    A = rng.standard_normal((8, 8))
    A = A @ A.T + 8 * np.eye(8)
    b = rng.standard_normal(8)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    res = spg(lambda x: 0.5 * x @ (Aj @ x) - bj @ x,
              lambda x: Aj @ x - bj,
              lambda x: x,
              jnp.zeros(8), eps=1e-10, maxit=500)
    assert int(res.solver_info) == 0
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               rtol=1e-7, atol=1e-8)


def test_spg_projected_box():
    """min ||x - c||^2 over x >= 0: solution is clip(c, 0)."""
    c = jnp.asarray(np.array([1.0, -2.0, 3.0, -0.5]))
    res = spg(lambda x: 0.5 * ((x - c) @ (x - c)),
              lambda x: x - c,
              lambda x: jnp.maximum(x, 0.0),
              jnp.ones(4), eps=1e-12, maxit=200)
    np.testing.assert_allclose(np.asarray(res.x), np.maximum(np.asarray(c), 0),
                               atol=1e-10)


def test_clip_spd():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((10, 10))
    A = (A + A.T) / 2
    P = np.asarray(clip_spd(jnp.asarray(A), 1e-12))
    w = np.linalg.eigvalsh(P)
    assert w.min() >= 1e-13
    # projection property: P is the nearest PSD matrix in Frobenius norm
    wA, V = np.linalg.eigh(A)
    ref = (V * np.maximum(wA, 1e-12)) @ V.T
    np.testing.assert_allclose(P, ref, atol=1e-10)


def test_project_covariance_full_identity_on_spd():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((6, 6))
    C = A @ A.T + 6 * np.eye(6)
    C_new, err = project_covariance_full(C)
    assert err < 1e-10
    np.testing.assert_allclose(C_new, C, atol=1e-9)


def test_project_covariance_masked():
    """Reference spg.py:134-165 scenario: indefinite matrix with a mask;
    result must be SPD and fit the known entries as well as possible."""
    rng = np.random.default_rng(4)
    N = 8
    A = rng.standard_normal((N, N)); A = A @ A.T
    w, V = np.linalg.eigh(A)
    w[N // 2] *= -1  # make indefinite
    A = (V * w) @ V.T

    mask = (rng.random((N, N)) > 0.15)
    mask = mask & mask.T
    np.fill_diagonal(mask, True)

    C_new, err, res = project_covariance_masked(A, mask.astype(float),
                                                spg_eps=1e-8)
    assert np.linalg.eigvalsh(C_new).min() >= -1e-10
    assert int(res.solver_info) in (0, 1)
    # fit error should be comparable to the unmasked projection distance
    full_proj_err = 0.5 * np.sum(
        (np.maximum(-w, 0)) ** 2)  # energy removed by clipping
    assert err <= full_proj_err + 1e-8


def test_mark_uncorrelated():
    C = np.array([[1.0, 1e-9, 0.5],
                  [1e-9, 1.0, 0.2],
                  [0.5, 0.2, 1.0]])
    keep = np.zeros_like(C, dtype=bool); keep[0, 2] = True
    out = mark_uncorrelated(C, keep_nan_mask=keep)
    assert np.isinf(out[0, 1]) and np.isinf(out[1, 0])
    assert np.isnan(out[0, 2])
    assert out[1, 2] == 0.2
