"""Multi-fidelity 1D stochastic diffusion: the PDE flagship model family.

Plays the role of the reference's FEniCS PDE examples (the Matern
restriction study, restrictions_matern.py, and the mesh-hierarchy pattern
of bluest_NS.py): a lognormal-coefficient elliptic problem

    -(a(x, xi) u')' = 1  on (0, 1),  u(0) = u(1) = 0,
    log a = sum_k  xi_k * sigma * k^-nu * sqrt(2) sin(k pi x)

solved by finite differences on a hierarchy of grids (fidelity = grid
resolution), with the SAME random coefficients xi shared across
fidelities.  QoI = trapezoidal integral of u.

Everything is jax-native: the per-sample tridiagonal Thomas solve is a
``lax.scan`` whose steps become batch-wide VPU ops under ``vmap`` -- one
batched solve per group evaluation, no host round trips.  This is the
bench.py workhorse for the 1e6-sample throughput target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..problem import BLUEProblem


def thomas_solve(lower, diag, upper, rhs):
    """Tridiagonal solve via the Thomas algorithm as a double scan.

    All args length n (lower[0], upper[-1] ignored).  Sequential in n, but
    vectorizes across the sample batch under vmap: each scan step is a
    batch-wide fused multiply-add on the VPU.
    """
    n = diag.shape[0]

    def fwd(carry, t):
        cp_prev, dp_prev = carry
        a, b, c, d = t
        denom = b - a * cp_prev
        cp = c / denom
        dp = (d - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (jnp.zeros(()), jnp.zeros(())),
        (lower, diag, upper, rhs))

    def bwd(x_next, t):
        cp, dp = t
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros(()), (cps, dps), reverse=True)
    return xs


def solve_diffusion(xi, n_cells: int, sigma: float = 1.0, nu: float = 1.5):
    """QoI for one sample: xi (n_kl,) -> integral of u over (0,1)."""
    n_kl = xi.shape[0]
    # coefficient at the n_cells+1 interior faces x_j = j*h, j=0..n_cells
    h = 1.0 / n_cells
    xf = (jnp.arange(n_cells) + 0.5) * h          # cell midpoints
    k = jnp.arange(1, n_kl + 1, dtype=jnp.float64)
    ck = sigma * k ** (-nu) * jnp.sqrt(2.0)
    modes = jnp.sin(jnp.pi * xf[:, None] * k[None, :])   # (n_cells, n_kl)
    log_a = modes @ (ck * xi)
    a = jnp.exp(log_a)                            # (n_cells,) face/mid values

    # interior unknowns u_1..u_{n-1}; flux form: -(a_{i+1/2}(u_{i+1}-u_i)
    #  - a_{i-1/2}(u_i - u_{i-1}))/h^2 = 1
    am = a[:-1]   # a_{i-1/2} for i=1..n-1
    ap = a[1:]    # a_{i+1/2}
    diag = (am + ap) / h ** 2
    lower = jnp.concatenate([jnp.zeros(1), -am[1:] / h ** 2])
    upper = jnp.concatenate([-ap[:-1] / h ** 2, jnp.zeros(1)])
    rhs = jnp.ones(n_cells - 1)
    u = thomas_solve(lower, diag, upper, rhs)
    # trapezoid with u_0 = u_n = 0
    return h * jnp.sum(u)


class DiffusionProblem(BLUEProblem):
    """Fidelity hierarchy over grid resolutions.

    Parameters: ``grids`` (cells per fidelity, finest first), ``n_kl``
    Karhunen-Loeve-style modes, field amplitude ``sigma`` and decay ``nu``.
    Costs default to the FD solve's O(n) work.
    """

    def __init__(self, grids=(256, 128, 64, 32, 16), n_kl: int = 16,
                 sigma: float = 0.5, nu: float = 1.5, **params):
        self.grids = tuple(int(g) for g in grids)
        self.n_kl = n_kl
        self.sigma = sigma
        self.nu = nu
        params.setdefault("costs", np.array([g / grids[-1]
                                             for g in self.grids]))
        super().__init__(len(self.grids), **params)

    def sampler_jax(self, key, ls):
        xi = jax.random.normal(key, (self.n_kl,))
        return xi  # shared across coupled fidelities

    def evaluate_jax(self, ls, xi):
        outs = [solve_diffusion(xi, self.grids[l], self.sigma, self.nu)
                for l in ls]
        return jnp.stack(outs)[None, :]
