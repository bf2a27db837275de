"""SPD projections for model covariance matrices.

Replaces the reference's covariance projection pipeline
(blue_models.py:348-433): a plain eigenvalue-clip projection when the
covariance is fully known, and a masked least-squares projection onto the
SPD cone (solved with SPG) when only some entries are known.  Runs entirely
on device via jit; the nearest-SPD subproblem is exactly the reference's
``feval/geval/proj`` triple (blue_models.py:366-382).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SPD_THRESHOLD, UNCORRELATED_RHO_TOL
from .spg import spg, SPGResult


@partial(jax.jit, static_argnames=())
def clip_spd(C: jnp.ndarray, eps: float = SPD_THRESHOLD) -> jnp.ndarray:
    """Symmetrize and clip eigenvalues at ``eps`` (blue_models.py:366-371)."""
    S = (C + C.T) / 2
    w, V = jnp.linalg.eigh(S)
    w = jnp.maximum(w, eps)
    return (V * w) @ V.T


def project_covariance_full(C: np.ndarray, eps: float = SPD_THRESHOLD):
    """Fully-known covariance: single eigh clip (blue_models.py:385-392).

    Returns (C_new, frobenius projection error).
    """
    C_new = np.asarray(clip_spd(jnp.asarray(C, dtype=jnp.float64), eps))
    err = float(np.linalg.norm(C - C_new, "fro"))
    return C_new, err


def project_covariance_masked(C: np.ndarray, mask: np.ndarray,
                              spd_eps: float = SPD_THRESHOLD,
                              spg_eps: float = 1.0e-10,
                              maxit: int = 10000,
                              max_fevals: int = 10 ** 8,
                              lmbda_min: float = 1e-30,
                              lmbda_max: float = 1e30,
                              history: int = 10):
    """Nearest SPD matrix to the known entries of ``C``.

    ``mask`` is 1 where C is known, 0 where free (NaN in the reference's
    encoding).  Minimizes 0.5*||mask*(X - C)||_F^2 over the eps-SPD cone via
    SPG with eigh-clip projection (blue_models.py:373-396).

    Returns (C_new, error, SPGResult).
    """
    M = C.shape[0]
    maskf = jnp.asarray(mask, dtype=jnp.float64).ravel()
    target = jnp.where(maskf > 0, jnp.nan_to_num(jnp.asarray(C).ravel()), 0.0)

    def proj(x):
        return clip_spd(x.reshape(M, M), spd_eps).ravel()

    def feval(x):
        r = maskf * (x - target)
        return 0.5 * (r @ r)

    def geval(x):
        return maskf * (x - target)

    x0 = proj(maskf * target)
    res = spg(feval, geval, proj, x0, eps=spg_eps, maxit=maxit,
              max_fevals=max_fevals, lmbda_min=lmbda_min,
              lmbda_max=lmbda_max, history=history)
    C_new = np.asarray(res.x).reshape(M, M)
    return C_new, float(res.f), res


def mark_uncorrelated(C_new: np.ndarray, keep_nan_mask: np.ndarray | None = None,
                      rho_tol: float = UNCORRELATED_RHO_TOL) -> np.ndarray:
    """Post-projection sentinel pass (blue_models.py:410-414): entries with
    |rho| < tol become inf (uncorrelated marker); ``keep_nan_mask`` entries
    are reset to NaN (uncoupled pairs stay uncoupled)."""
    out = C_new.copy()
    s = np.sqrt(np.diag(out))
    rho = out / np.outer(s, s)
    off = ~np.eye(out.shape[0], dtype=bool)
    out[(np.abs(rho) < rho_tol) & off] = np.inf
    if keep_nan_mask is not None:
        out[keep_nan_mask] = np.nan
    return out
