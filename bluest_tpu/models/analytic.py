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

    def sampler_jax(self, key, ls):
        z = jax.random.normal(key)
        return jnp.full((len(ls),), z)

    def evaluate_jax(self, ls, samples):
        outs = []
        for i, l in enumerate(ls):
            x = samples[i]
            if l == 0:
                outs.append(jnp.exp(x))
            else:
                outs.append(_series(x, self.n_models - l))
        return jnp.stack(outs)[None, :]


class ExpSeriesMultiProblem(BLUEProblem):
    """Two outputs: e^Z and e^{2Z} (tutorial part 4)."""

    def __init__(self, n_models: int = 5, **params):
        self.n_models = n_models
        params.setdefault("costs", default_costs(n_models))
        super().__init__(n_models, n_outputs=2, **params)

    def sampler_jax(self, key, ls):
        z = jax.random.normal(key)
        return jnp.full((len(ls),), z)

    def evaluate_jax(self, ls, samples):
        r0, r1 = [], []
        for i, l in enumerate(ls):
            x = samples[i]
            v = jnp.exp(x) if l == 0 else _series(x, self.n_models - l)
            r0.append(v)
            r1.append(v * v)
        return jnp.stack([jnp.stack(r0), jnp.stack(r1)])
