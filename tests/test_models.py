"""Model-family sanity tests: correctness of the solvers underlying the
flagship multi-fidelity hierarchies."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bluest_tpu.models.diffusion import (thomas_solve, solve_diffusion,
                                          solve_diffusion_outputs, DiffusionProblem)
from bluest_tpu.models.hodgkin_huxley import (_integrate, _outputs,
                                              HodgkinHuxleyProblem)


def test_thomas_solve_matches_dense(rng):
    n = 40
    lower = rng.uniform(0.5, 1.0, n); lower[0] = 0
    upper = rng.uniform(0.5, 1.0, n); upper[-1] = 0
    diag = 4.0 + rng.uniform(0, 1, n)
    rhs = rng.standard_normal(n)
    A = np.diag(diag) + np.diag(lower[1:], -1) + np.diag(upper[:-1], 1)
    x_ref = np.linalg.solve(A, rhs)
    x = thomas_solve(jnp.asarray(lower), jnp.asarray(diag),
                     jnp.asarray(upper), jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-10)


def test_diffusion_deterministic_limit():
    """xi = 0 => a = 1 => u = x(1-x)/2, integral = 1/12."""
    for n in (64, 256):
        q = float(solve_diffusion(jnp.zeros(8), n))
        assert abs(q - 1.0 / 12.0) < 2.0 / n ** 2 + 1e-10


def test_diffusion_fidelity_convergence():
    """Fidelities converge to the same QoI as the grid refines."""
    xi = jnp.asarray(np.random.default_rng(0).standard_normal(16))
    qs = [float(solve_diffusion(xi, n)) for n in (32, 64, 128, 256)]
    errs = np.abs(np.diff(qs))
    assert errs[-1] < errs[0]  # refinement reduces increments


def test_hh_integrator_spikes():
    params = jnp.array([10.0, 120.0, 36.0])
    traj = _integrate(0, 0.01, params)
    V = np.asarray(traj[:, 0])
    assert V.max() > 0.0      # at least one action potential
    assert V.min() > -90.0    # stays physiological
    out = np.asarray(_outputs(0, traj))
    assert out.shape == (5,)
    # dt refinement converges
    o1 = np.asarray(_outputs(0, _integrate(0, 0.01, params)))
    o2 = np.asarray(_outputs(0, _integrate(0, 0.02, params)))
    o4 = np.asarray(_outputs(0, _integrate(0, 0.04, params)))
    assert np.abs(o1 - o2)[0] < np.abs(o1 - o4)[0] + 1e-8


@pytest.mark.slow
def test_diffusion_problem_pipeline():
    p = DiffusionProblem(grids=(64, 32, 16), n_kl=8,
                         covariance_estimation_samples=2048, verbose=False)
    C = p.get_covariance()
    assert np.isfinite(np.diag(C)).all()
    rho = p.get_correlation()
    assert rho[0, 1] > 0.9
    eps = 0.05 * np.sqrt(C[0, 0])
    blue = p.setup_solver(K=3, eps=eps)
    mu, errs, cost = p.solve(K=3, eps=eps)
    assert np.isfinite(mu[0])
    # plain-MC cost comparison
    assert cost <= C[0, 0] / eps ** 2 * p.get_costs()[0] * 1.01


@pytest.mark.slow
def test_hodgkin_huxley_problem_small():
    """HH model family end-to-end with a reduced model set."""
    p = HodgkinHuxleyProblem(models=((0, 0.08), (1, 0.08), (2, 0.08)),
                             covariance_estimation_samples=256,
                             device_batch_size=256, verbose=False)
    C = p.get_covariance(0)
    assert np.all(np.isfinite(np.diag(C)))
    rho = p.get_correlation(0)
    assert abs(rho[0, 1]) > 0.5   # RK4 vs Euler on same dt correlate
    assert p.n_outputs == 5
    budget = 50 * p.get_costs()[0]
    blue = p.setup_solver(K=2, budget=budget)
    assert blue["total_cost"] <= budget * 1.001


@pytest.mark.slow
def test_diffusion_multioutput_variance_test():
    """Statistical acceptance on the PDE family, 3 outputs: empirical
    estimator spread must match the predicted errors (the reference's
    gold-standard check, blue_models.py:944-978)."""
    p = DiffusionProblem(grids=(32, 16, 8), n_kl=8, sigma=0.8, nu=0.8,
                         multi_output=True,
                         covariance_estimation_samples=4096, verbose=False)
    eps = [0.1 * np.sqrt(p.get_covariance(n)[0, 0]) for n in range(3)]
    err_ex, err = p.variance_test(eps=eps, K=2, N=40)
    for n in range(3):
        assert err[n] < 3.0 * err_ex[n]
        assert err[n] > err_ex[n] / 3.0


def test_batched_solver_matches_vmap(rng):
    from bluest_tpu.models.diffusion import solve_diffusion_outputs_batched
    X = jnp.asarray(rng.standard_normal((8, 16)))
    a = np.asarray(jax.vmap(lambda x: solve_diffusion_outputs(x, 64))(X))
    b = np.asarray(solve_diffusion_outputs_batched(X, 64))
    np.testing.assert_allclose(a, b, rtol=1e-12)
    # non power-of-two grid exercises the axis-0 Thomas path
    c = np.asarray(solve_diffusion_outputs_batched(X, 48))
    d = np.asarray(jax.vmap(lambda x: solve_diffusion_outputs(x, 48))(X))
    np.testing.assert_allclose(c, d, rtol=1e-12)


def test_matern2d_field_properties(rng):
    """SPDE-sampled field: zero boundary-ish mean, spectral restriction
    coupling makes coarse fields the low-pass of fine ones."""
    from bluest_tpu.models.matern2d import sample_matern2d

    key = jax.random.key(3)
    w = jax.random.normal(key, (32, 32))
    z32 = np.asarray(sample_matern2d(w, 32))
    z16 = np.asarray(sample_matern2d(w, 16))
    assert z32.shape == (32, 32) and np.all(np.isfinite(z32))
    # same white noise: the coarse field correlates strongly with the
    # fine field's energy
    e32 = float(np.mean(z32 ** 2))
    e16 = float(np.mean(z16 ** 2))
    assert e16 <= e32 * 1.5  # truncation removes energy (up to noise)


@pytest.mark.slow
def test_matern2d_problem_pipeline():
    from bluest_tpu.models.matern2d import Matern2DProblem

    p = Matern2DProblem(grids=(32, 16, 8), covariance_estimation_samples=2048,
                        device_batch_size=512, verbose=False)
    C0 = p.get_covariance(0)
    assert np.isfinite(np.diag(C0)).all()
    rho = p.get_correlation(0)
    assert rho[0, 1] > 0.5
    eps = [0.1 * np.sqrt(p.get_covariance(n)[0, 0]) for n in range(3)]
    blue = p.setup_solver(K=2, eps=eps)
    mus, errs, cost = p.solve(K=2, eps=eps)
    assert all(np.isfinite(m) for m in mus)
    Vs = p.MOSAP_output["variances"]
    assert all(v <= (e ** 2) * 1.05 for v, e in zip(Vs, eps))


@pytest.mark.slow
def test_matern2d_model_axis_sharded_matches_single():
    """Production model-parallel path: Matern2D with spectral modes sharded
    over the 'model' mesh axis must reproduce the single-device pilot
    covariance to rounding (the psum-assembled field equals the dense
    synthesis; the nested-MPI analog, restrictions_matern.py:19-37)."""
    from bluest_tpu.models.matern2d import Matern2DProblem
    from bluest_tpu.parallel import sample_model_mesh

    kw = dict(grids=(16, 8), covariance_estimation_samples=256,
              device_batch_size=64, verbose=False, seed=11)
    p1 = Matern2DProblem(**kw)
    p2 = Matern2DProblem(mesh=sample_model_mesh(4, 2), **kw)
    assert p2._model_shards == 2
    np.testing.assert_allclose(p2.get_covariance(0), p1.get_covariance(0),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(p2.get_covariance(2), p1.get_covariance(2),
                               rtol=1e-9, atol=1e-12)
