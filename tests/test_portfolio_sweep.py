"""Portfolio fan-out sampling (kernel_engine.portfolio_sums, VERDICT r5
item 1a): the multi-request sweep must be BIT-IDENTICAL to the per-group
dispatch path -- same fold_in(key, global_index) streams, same combiner
math -- while dispatching ~#models programs instead of ~sum(len(group))."""

import os
from itertools import combinations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bluest_tpu.models.diffusion import DiffusionProblem


@pytest.fixture(scope="module")
def problem():
    return DiffusionProblem(
        grids=(64, 32, 16, 8), n_kl=8, sigma=1.0, nu=0.6,
        multi_output=True, covariance_estimation_samples=128,
        verbose=False, device_batch_size=256, dtype=jnp.float32)


def _assert_sums_equal(a, b, ctx):
    for x, y, name in zip(a, b, ("se", "sc", "d1", "d2", "nf")):
        d = float(jnp.max(jnp.abs(jnp.asarray(x, jnp.float64)
                                  - jnp.asarray(y, jnp.float64))))
        assert d == 0.0, (ctx, name, d)


def test_portfolio_bit_identical_to_sequential(problem, monkeypatch):
    """Mixed portfolio: several groups, a zero-N group, >_MULTI_R
    requests for one (model, tier), and a multi-bucket group (N beyond
    the largest tier) -- every group's sums must match the legacy
    per-group path bit for bit."""
    eng = problem._kernel_engine()
    R = eng._MULTI_R
    big = eng._tiers()[-1] * eng.n_sample_shards
    reqs = [((0, 1), jax.random.key(1), 1000),
            ((1, 2, 3), jax.random.key(2), 5000),
            ((2,), jax.random.key(3), 300),
            ((0,), jax.random.key(4), 0),
            ((3,), jax.random.key(5), 2 * big + 17)]   # multi-bucket
    # force > R requests for model 3 at the smallest tier
    reqs += [((3,), jax.random.key(10 + i), 64 + i)
             for i in range(R + 2)]
    outs = eng.portfolio_sums(reqs)
    monkeypatch.setenv("BLUEST_TPU_PORTFOLIO_SWEEP", "0")
    for (ls, key, N), s in zip(reqs, outs):
        s0 = eng.sample_sums(list(ls), key, N)
        _assert_sums_equal(s, s0, (ls, N))


def test_solve_identical_with_and_without_portfolio(monkeypatch):
    """End-to-end: BLUEProblem.solve estimates must be identical under
    both dispatch paths (keys are allocated per group in list order in
    both, so the sample streams coincide exactly)."""
    mus = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("BLUEST_TPU_PORTFOLIO_SWEEP", knob)
        p = DiffusionProblem(
            grids=(64, 32, 16, 8), n_kl=8, sigma=1.0, nu=0.6,
            multi_output=True, covariance_estimation_samples=128,
            verbose=False, device_batch_size=256, dtype=jnp.float32)
        m, errs, _cost = p.solve(K=3, budget=200.0, verbose=False)
        mus[knob] = np.asarray(m, dtype=float)
        assert np.all(np.isfinite(mus[knob]))
    np.testing.assert_array_equal(mus["1"], mus["0"])
