"""MLBLUE information-matrix kernels as batched XLA linear algebra.

Replaces the reference's native scatter kernels (cmisc.cpp:10-97, with the
numba duplicates in misc.py:548-598 as the executable spec).  The key
algebraic reduction: with per-size-class one-hot selectors
``E_k (Lk, k, M)`` and inverse covariance blocks ``ic_k (Lk, k, k)``,

    psi_k           = einsum('gjm,gjl,gln->g(mn)', E, ic, E)
    PHI(m)          = reshape(psi @ m, (M, M))       (misc.py:459-461)
    variance(m)     = PHI(m)^+ [0, 0]                (misc.py:463-477)
    W[g, m]         = scatter_g(ic_g @ phi0|_g)      ("influence" rows)
    grad(m)         = -W @ phi0                      (== cmisc gradK_c)
    hess(m)         = 2 * W @ PHI^+ @ W^T            (== cmisc hessKQ_c + sym)
    cleanup matrix  = W^T                            (== intended cleanupK_c*)

where phi0 = PHI^+[:, 0].  (*) cmisc.cpp:51 overwrites instead of
accumulating inside its inner loop -- a latent reference bug; we implement
the mathematically correct accumulation (see SURVEY.md section 2.2).

Everything here is a pure jittable function of ``m``; group structure is
closed over as static data, so XLA sees fixed shapes and fuses the chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .groups import GroupStructure


@dataclass(frozen=True, eq=False)  # identity hash: one jit cache per instance
class GroupData:
    """Device-resident static arrays for one SAP, keyed by size class.

    Passed to the jitted kernels below as a *static* argument: the arrays are
    closed over at trace time, so XLA sees fixed shapes and constant-folds
    the group structure.  Built once per allocation problem.
    """
    M: int
    L: int
    onehots: tuple          # k-1 -> (Lk, k, M)
    invcovs: tuple          # k-1 -> (Lk, k, k)
    cumsizes: tuple
    psi: jnp.ndarray        # (M*M, L)

    @classmethod
    def build(cls, gs: GroupStructure) -> "GroupData":
        if gs.invcovs is None:
            raise ValueError("GroupStructure has no covariance set")
        onehots = tuple(jnp.asarray(E) for E in gs.onehots)
        invcovs = tuple(jnp.asarray(ic) for ic in gs.invcovs)
        psi = assemble_psi(gs.M, onehots, invcovs)
        return cls(M=gs.M, L=gs.L, onehots=onehots, invcovs=invcovs,
                   cumsizes=tuple(int(c) for c in gs.cumsizes), psi=psi)


def assemble_psi(M: int, onehots, invcovs) -> jnp.ndarray:
    """psi matrix (M^2, L): column g is vec(R_g^T C_g^{-1} R_g)
    (reference assemble_psi, misc.py:591-604 / cmisc.cpp:10-23).

    Computed in numpy: this runs eagerly at SAP construction and the
    arrays are tiny (M <= tens), so a jitted version only adds one
    compile/cache-load per size class to the allocation cold start."""
    cols = []
    for E, ic in zip(onehots, invcovs):
        E = np.asarray(E)
        ic = np.asarray(ic)
        if E.shape[0] == 0:
            continue
        slab = np.einsum('gjm,gjl,gln->gmn', E, ic, E)
        cols.append(slab.reshape(E.shape[0], M * M).T)
    if not cols:
        return jnp.zeros((M * M, 0))
    return jnp.asarray(np.concatenate(cols, axis=1))


def phi_of_m(psi: jnp.ndarray, m: jnp.ndarray, delta: float = 0.0) -> jnp.ndarray:
    M = int(round(np.sqrt(psi.shape[0])))
    PHI = (psi @ m).reshape(M, M)
    return PHI + delta * jnp.eye(M, dtype=PHI.dtype)


def _pinv_h(A: jnp.ndarray, rcond: float = 1.0e-12) -> jnp.ndarray:
    """Hermitian pseudo-inverse via eigendecomposition (cheaper + more
    accurate than SVD-based pinv for our symmetric PHIs)."""
    w, V = jnp.linalg.eigh(A)
    cutoff = rcond * jnp.max(jnp.abs(w))
    inv_w = jnp.where(jnp.abs(w) > cutoff, 1.0 / w, 0.0)
    return (V * inv_w) @ V.T


@partial(jax.jit, static_argnames=("data",))
def variance(data: GroupData, m: jnp.ndarray, delta: float = 0.0) -> jnp.ndarray:
    """Estimator variance (PHI(m)^+)_{00}.

    Equivalent to the reference's nnz-row-restricted solve
    (misc.py:463-477): groups with m_g = 0 contribute zero rows/columns, so
    the Hermitian pseudo-inverse restricted entry coincides whenever the
    covered block is nonsingular.
    """
    PHI = phi_of_m(data.psi, m, delta)
    return _pinv_h(PHI)[0, 0]


def _influence_rows(data: GroupData, phi0: jnp.ndarray) -> jnp.ndarray:
    """W (L, M): row g scatters C_g^{-1} phi0|_g back to model space."""
    rows = []
    for E, ic in zip(data.onehots, data.invcovs):
        if E.shape[0] == 0:
            continue
        pg = jnp.einsum('gjm,m->gj', E, phi0)
        u = jnp.einsum('gjl,gl->gj', ic, pg)
        rows.append(jnp.einsum('gj,gjm->gm', u, E))
    return jnp.concatenate(rows, axis=0)


@partial(jax.jit, static_argnames=("data", "nohess"))
def variance_grad_hess(data: GroupData, m: jnp.ndarray, delta: float = 0.0,
                       nohess: bool = False):
    """(variance, gradient, Hessian) of m -> (PHI(m)^+)_{00}
    (reference variance_GH_full, misc.py:479-505)."""
    PHI = phi_of_m(data.psi, m, delta)
    invPHI = _pinv_h(PHI)
    var = invPHI[0, 0]
    phi0 = invPHI[:, 0]
    W = _influence_rows(data, phi0)
    grad = -(W @ phi0)
    if nohess:
        return var, grad, None
    hess = 2.0 * (W @ invPHI @ W.T)
    return var, grad, hess


@partial(jax.jit, static_argnames=("data",))
def cleanup_matrix(data: GroupData, m: jnp.ndarray, delta: float = 0.0) -> jnp.ndarray:
    """X (M, L) = W^T used by the null-space sparsifier
    (reference assemble_cleanup_matrix, misc.py:507-516)."""
    PHI = phi_of_m(data.psi, m, delta)
    invPHI = _pinv_h(PHI)
    return _influence_rows(data, invPHI[:, 0]).T


@partial(jax.jit, static_argnames=("data",))
def estimator_from_sums(data: GroupData, m: jnp.ndarray, y: jnp.ndarray):
    """BLUE estimator (mu, var) from the model-space sum vector y
    (reference PHIinvY0, misc.py:518-544):  mu = (PHI^+ y)_0."""
    PHI = phi_of_m(data.psi, m)
    invPHI = _pinv_h(PHI)
    return invPHI[0, :] @ y, invPHI[0, 0]


def scatter_group_sums(data: GroupData, sums_flat: List) -> jnp.ndarray:
    """y in R^M with y_i = sum_{S ni i} (C_S^{-1} sums_S)_i
    (reference SAP.compute_BLUE_estimator scatter, sap.py:111-117).

    ``sums_flat[g]`` is the per-model sample-sum vector of group g (length =
    group size; entries may be arrays for vector outputs -- here scalars).
    """
    y = jnp.zeros((data.M,))
    gidx = 0
    for E, ic in zip(data.onehots, data.invcovs):
        Lk = E.shape[0]
        if Lk == 0:
            continue
        k = E.shape[1]
        s = jnp.asarray(np.array(sums_flat[gidx:gidx + Lk],
                                 dtype=np.float64).reshape(Lk, k))
        u = jnp.einsum('gjl,gl->gj', ic, s)
        y = y + jnp.einsum('gj,gjm->m', u, E)
        gidx += Lk
    return y


# ----------------------------------------------------------------------- #
# Host-side (numpy) reference versions with the exact nnz-restriction
# semantics of misc.py:463-477 and misc.py:518-544; used for final
# estimator assembly and in tests as the oracle.
# ----------------------------------------------------------------------- #

def host_variance(gs: GroupStructure, psi: np.ndarray, m: np.ndarray,
                  delta: float = 0.0) -> float:
    m = np.asarray(m, dtype=float)
    if np.abs(m).max() < 0.05:
        return np.inf
    M = gs.M
    PHI = delta * np.eye(M) + (psi @ m).reshape(M, M)
    idx = gs.covered_models(m)
    if len(idx) == 0 or idx[0] != 0:
        raise AssertionError("model 0 must always be sampled")
    sub = PHI[np.ix_(idx, idx)]
    rhs = np.zeros(len(idx)); rhs[0] = 1.0
    return float(np.linalg.solve(sub, rhs)[0])


def host_estimator(gs: GroupStructure, psi: np.ndarray, m: np.ndarray, y):
    """(mu, var) with nnz restriction; supports array-valued y entries."""
    m = np.asarray(m, dtype=float)
    M = gs.M
    PHI = (psi @ m).reshape(M, M)
    idx = gs.covered_models(m)
    if len(idx) == 0 or idx[0] != 0:
        raise AssertionError("model 0 must always be sampled")
    sub = np.linalg.pinv(PHI[np.ix_(idx, idx)])
    var = sub[0, 0]
    mu = 0
    for col, i in enumerate(idx):
        mu = mu + sub[0, col] * y[i]
    return mu, var
