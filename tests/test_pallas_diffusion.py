"""Fused Pallas diffusion kernel (ops/pallas_diffusion.py): correctness
against the library's own XLA model path and the f64 oracle, run in
interpret mode (the suite's CPU backend has no Mosaic)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bluest_tpu.ops.pallas_diffusion import diffusion_outputs_pallas
from bluest_tpu.models.diffusion import (DiffusionProblem,
                                         solve_diffusion_outputs)


@pytest.mark.parametrize("n", [2, 8, 64, 100, 256])
def test_kernel_matches_f64_oracle(n):
    """The kernel is an f32 Thomas solve; its error against the f64
    oracle must match the f32 cyclic-reduction path's own error class
    (measured: medians ~2e-3 at n=1024 for BOTH -- the lognormal
    coefficient's conditioning, not algorithm error)."""
    rng = np.random.default_rng(0)
    B = 200
    xis = rng.standard_normal((B, 32)).astype(np.float32)
    ref64 = jax.vmap(lambda x: solve_diffusion_outputs(x, n, 1.0, 0.6))(
        jnp.asarray(xis, jnp.float64))
    got = diffusion_outputs_pallas(xis, n, 1.0, 0.6, interpret=True)
    cr32 = jax.vmap(lambda x: solve_diffusion_outputs(x, n, 1.0, 0.6))(
        jnp.asarray(xis))
    ref64 = np.asarray(ref64, np.float64)
    err_pal = np.abs(np.asarray(got, np.float64) - ref64) \
        / (np.abs(ref64) + 1e-9)
    err_cr = np.abs(np.asarray(cr32, np.float64) - ref64) \
        / (np.abs(ref64) + 1e-9)
    # same error class as the incumbent f32 path (generous 10x + floor)
    assert np.median(err_pal) <= 10 * np.median(err_cr) + 1e-6
    assert np.max(err_pal) <= 10 * np.max(err_cr) + 1e-5


def test_kernel_handles_batch_padding():
    """B not a multiple of the tile: padded lanes must not leak."""
    rng = np.random.default_rng(1)
    n = 16
    xis = rng.standard_normal((77, 16)).astype(np.float32)
    got = diffusion_outputs_pallas(xis, n, 0.5, 1.5, interpret=True)
    assert got.shape == (77, 3)
    ref = jax.vmap(lambda x: solve_diffusion_outputs(x, n, 0.5, 1.5))(
        jnp.asarray(xis))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-6)


def test_batched_hook_fallback_on_cpu():
    """On the suite's CPU backend the Pallas path is disabled and the
    batched hook must reproduce the per-sample vmap exactly, so the
    engine's sums are unchanged by the hook's existence."""
    p = DiffusionProblem(grids=(32, 16, 8), n_kl=8, sigma=0.5, nu=1.5,
                         multi_output=True, verbose=False,
                         covariance_estimation_samples=32,
                         dtype=jnp.float32)
    assert p._pallas_enabled() is False        # cpu backend
    rng = np.random.default_rng(2)
    xis = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    hook = p.evaluate_model_jax_batched(0, xis)
    ref = jax.vmap(lambda t: jnp.asarray(
        p.evaluate_model_jax(0, t)))(xis)
    np.testing.assert_array_equal(np.asarray(hook), np.asarray(ref))
