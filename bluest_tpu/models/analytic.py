"""Analytic multi-fidelity hierarchy from the reference tutorial
(tutorials/01_tutorial.py:10-35): estimate E[e^Z] for Z ~ N(0,1), model i
truncating the exponential series after n_models - i terms; model 0 exact.

Ready-made BLUEProblem subclasses used by the test-suite, bench harness
and docs, with both the device (jax) and black-box (host) entry points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import BLUEProblem

TRUE_MEAN = float(np.exp(0.5))


def default_costs(n_models: int) -> np.ndarray:
    return np.array([2.0 ** (n_models - i) for i in range(n_models)])


def _series(x, n_terms: int):
    ii = jnp.arange(n_terms + 1, dtype=jnp.float64)
    fact = jnp.exp(jax.lax.lgamma(ii + 1.0))
    return jnp.sum(x ** ii / fact)


class ExpSeriesProblem(BLUEProblem):
    """Single-output tutorial hierarchy (device path)."""

    def __init__(self, n_models: int = 5, **params):
        self.n_models = n_models
        params.setdefault("costs", default_costs(n_models))
        super().__init__(n_models, **params)

    def sample_input_jax(self, key):
        return jax.random.normal(key)

    def evaluate_model_jax(self, l, z):
        if l == 0:
            return jnp.exp(z)[None]
        return _series(z, self.n_models - l)[None]


class ExpSeriesMultiProblem(BLUEProblem):
    """Two outputs: e^Z and e^{2Z} (tutorial part 4)."""

    def __init__(self, n_models: int = 5, **params):
        self.n_models = n_models
        params.setdefault("costs", default_costs(n_models))
        super().__init__(n_models, n_outputs=2, **params)

    def sample_input_jax(self, key):
        return jax.random.normal(key)

    def evaluate_model_jax(self, l, z):
        v = jnp.exp(z) if l == 0 else _series(z, self.n_models - l)
        return jnp.stack([v, v * v])
