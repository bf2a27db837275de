"""Input-validation behavior at the BLUEProblem boundary.

The reference mostly lets malformed input crash wherever numpy first
notices (or, worse, silently produce nonsense: a negative eps squares
into a valid tolerance, budget=0 yields an empty allocation with NaN
savings).  These are clean ValueErrors here; behaviors the reference
defines (silently filtering non-clique user groups) are preserved.
"""

import numpy as np
import pytest

from bluest_tpu import BLUEProblem


class P(BLUEProblem):
    def sampler_jax(self, key, ls):
        import jax
        import jax.numpy as jnp
        return jnp.full((len(ls),), jax.random.normal(key))

    def evaluate_jax(self, ls, samples):
        import jax.numpy as jnp
        return jnp.stack([samples[i] * (1.0 + l)
                          for i, l in enumerate(ls)])[None, :]


def make():
    return P(3, C=np.eye(3) + 1.0, costs=np.array([4.0, 2.0, 1.0]),
             verbose=False)


def test_wrong_C_shape_raises():
    with pytest.raises(ValueError, match="expected \\(M, M\\)"):
        P(3, C=np.eye(4), costs=np.ones(3), verbose=False)


def test_wrong_costs_shape_raises():
    with pytest.raises(ValueError, match="expected \\(M,\\)"):
        P(3, C=np.eye(3), costs=np.ones(5), verbose=False)


def test_nonpositive_costs_raise():
    with pytest.raises(ValueError, match="finite and positive"):
        P(3, C=np.eye(3), costs=np.array([-1.0, 1, 1]), verbose=False)


def test_negative_eps_raises():
    # a negative eps would silently square into a valid tolerance
    with pytest.raises(ValueError, match="eps tolerances"):
        make().setup_solver(K=2, eps=-0.1)


def test_zero_budget_raises():
    with pytest.raises(ValueError, match="budget"):
        make().setup_solver(K=2, budget=0.0)


def test_zero_K_raises():
    with pytest.raises(ValueError, match="K must be"):
        make().setup_solver(K=0, eps=0.1)


def test_eps_list_length_checked():
    with pytest.raises(ValueError):
        make().setup_solver(K=2, eps=[0.1, 0.2])


def test_noncliquegroups_filtered_like_reference(capsys):
    """Reference semantics preserved (blue_models.py:484-486): invalid
    user groups are filtered, not fatal -- but now announced."""
    C = np.array([[1.0, np.inf, 0.1],
                  [np.inf, 1.0, 0.1],
                  [0.1, 0.1, 1.0]])
    p = P(3, C=C, costs=np.array([4.0, 2.0, 1.0]), verbose=True)
    out = p.setup_solver(groups=[[0], [2], [0, 1]], eps=0.5)
    assert all(sorted(g) != [0, 1] for g in out["models"])
    assert "dropped user groups" in capsys.readouterr().out
