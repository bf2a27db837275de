"""JAX-native primal-dual interior-point solver for cone programs
with a nonnegative-orthant block and dense PSD blocks.

Replaces cvxopt ``solvers.sdp`` (the reference's default allocation solver,
sap.py:242-307, mosap.py:395-463) with an on-device implementation.  Solves
the inequality-form cone program

    minimize    c^T x
    subject to  Gl x <= hl                           (componentwise)
                sum_i x_i * As[b, i]  <=  Hs[b]      (PSD order, per block b)

via an infeasible-start path-following method with Nesterov-Todd scaling
and a Mehrotra predictor-corrector.  Design notes:

* MLBLUE allocation SDPs are small (x-dim <= ~400, PSD blocks of size
  M+1 <= ~20, one per output and all the same size), so PSD blocks are kept
  as one stacked (nb, n, n) array and every cone operation is vmapped.
* NT scaling for a PSD block only needs the metric geometric mean
  T = S^1/2 (S^1/2 Z S^1/2)^-1/2 S^1/2  (T Z T = S): the Newton system
  reduces to normal equations
      Hmat dx = rhs,   Hmat = Gl^T diag(z/s) Gl + sum_b tr(A_i T^-1 A_k T^-1)
  and the scaling square-root R is never needed.
* TPU f64 has no LU kernel; every solve is Cholesky or eigh based.

Newton system derivation (per iteration, cones handled blockwise):
    rd = c + G^T z,   rp = h - G x - s,   t = s - sigma*mu*z^{-1} + corr
    Hmat dx = -rd + G^T (W^T W)^{-1} (rp + t)
    dz = (W^T W)^{-1} (G dx - rp - t),    ds = rp - G dx
with (W^T W)^{-1} u = (z/s) u for the LP cone and T^{-1} U T^{-1} for PSD.
The Mehrotra correction is applied on the LP cone (corr = ds_aff*dz_aff/z);
the PSD second-order correction is omitted -- on these small, well-scaled
problems the sigma = (gap_aff/gap)^3 heuristic converges in a few tens of
iterations to ~1e-12 relative gap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ConeLPResult", "solve_cone_lp"]


class ConeLPResult(NamedTuple):
    x: np.ndarray
    status: str          # "optimal" | "max_iter" | "failed"
    iterations: int
    gap: float
    pres: float
    dres: float
    pobj: float


def _sym(A):
    return (A + jnp.swapaxes(A, -1, -2)) / 2


def _chol_solve(H, rhs, jitter=1e-14):
    """SPD solve with symmetric diagonal equilibration.

    The IPM normal matrix mixes (W^T W)^{-1} scales spanning ~1/mu^2, so a
    trace-proportional ridge would wipe out the small-curvature directions
    (exactly the active-constraint information).  Equilibrating to unit
    diagonal first makes a ~1e-14 ridge scale-invariant and harmless.
    """
    n = H.shape[0]
    d = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-300, None))
    Hs = H / d[:, None] / d[None, :]
    L = jnp.linalg.cholesky(Hs + jitter * jnp.eye(n, dtype=H.dtype))

    def solve(b):
        bs = b / d
        y = jax.scipy.linalg.solve_triangular(L, bs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False) / d

    x = solve(rhs)
    return x + solve(rhs - H @ x)  # one step of iterative refinement


# --------------------- batched PSD cone primitives ----------------------- #

def _psd_inv(A):
    w, V = jnp.linalg.eigh(A)
    w = jnp.maximum(w, 1e-300)
    return jnp.einsum('bij,bj,bkj->bik', V, 1.0 / w, V)


def _nt_scaling(S, Z):
    """Batched NT scaling via the Todd-Toh-Tutuncu recipe.

    With L_s = chol(S), L_z = chol(Z) and SVD L_s^T L_z = U Sig V^T, the
    factor R = L_s U Sig^{-1/2} satisfies R^T Z R = R^{-1} S R^{-T} = Sig
    (the diagonal scaled point lambda).  Returns (Tinv, R, Rinv, lam) with
    T = R R^T the metric geometric mean (T Z T = S).
    """
    Ls = jnp.linalg.cholesky(S)
    Lz = jnp.linalg.cholesky(Z)
    M = jnp.swapaxes(Ls, -1, -2) @ Lz
    U, sig, Vt = jnp.linalg.svd(M)
    sig = jnp.maximum(sig, 1e-300)
    R = (Ls @ U) / jnp.sqrt(sig)[:, None, :]
    # R^{-1} = Sig^{1/2} U^T L_s^{-1}: compute U^T L_s^{-1} as (L_s^{-T} U)^T
    LsTinvU = jax.vmap(lambda l, u: jax.scipy.linalg.solve_triangular(
        l.T, u, lower=False))(Ls, U)
    Rinv = jnp.sqrt(sig)[:, :, None] * jnp.swapaxes(LsTinvU, -1, -2)
    Tinv = jnp.swapaxes(Rinv, -1, -2) @ Rinv
    return _sym(Tinv), R, Rinv, sig


def _max_step_psd(S, dS):
    """Batched sup {a : S + a dS >= 0} (min over blocks)."""
    L = jnp.linalg.cholesky(S)
    M1 = jax.vmap(lambda l, d: jax.scipy.linalg.solve_triangular(l, d, lower=True))(L, dS)
    M2 = jax.vmap(lambda l, m: jax.scipy.linalg.solve_triangular(l, m.T, lower=True))(L, M1)
    lam_min = jnp.min(jnp.linalg.eigvalsh(_sym(M2))[:, 0])
    return jnp.where(lam_min >= 0, jnp.inf, -1.0 / jnp.minimum(lam_min, -1e-300))


def _max_step_lp(s, ds):
    ratio = jnp.where(ds < 0, -s / jnp.where(ds < 0, ds, -1.0), jnp.inf)
    return jnp.min(ratio) if s.shape[0] else jnp.asarray(jnp.inf)




# ------------------- module-level jitted IPM kernels --------------------- #
# Problem data are ARGUMENTS (not closure constants): XLA then caches the
# compiled step per problem shape instead of re-tracing -- and re-constant-
# folding large dot products -- on every solve_cone_lp call.

@jax.jit
def _ipm_init(cj, Glj, hlj, Aj, Hj, Gall, GtG):
    p = Glj.shape[0]
    nb, nx, n, _ = Aj.shape
    hall = jnp.concatenate([hlj, Hj.reshape(nb * n * n)]
                           if nb else [hlj], axis=0)
    x0 = _chol_solve(GtG, Gall.T @ hall)
    z_all = Gall @ _chol_solve(GtG, -cj)
    s_lp = hlj - Glj @ x0
    S = Hj - jnp.einsum('i,binm->bnm', x0, Aj) if nb else Hj
    z_lp = z_all[:p]
    Z = _sym(z_all[p:].reshape(nb, n, n)) if nb else Hj
    return x0, s_lp, S, z_lp, Z


@jax.jit
def _ipm_iteration(cj, Glj, hlj, Aj, Hj, _Gall_j, _GtG_j, cnorm, step_frac,
                   x, s_lp, S, z_lp, Z):
    p = Glj.shape[0]
    nb, nx, n, _ = Aj.shape
    nu = p + nb * n
    rd = cj + (Glj.T @ z_lp if p else 0.0)
    if nb:
        rd = rd + jnp.einsum('binm,bnm->i', Aj, Z)
    rp_lp = hlj - Glj @ x - s_lp
    Rp = (Hj - jnp.einsum('i,binm->bnm', x, Aj) - S) if nb else Hj

    gap = (s_lp @ z_lp if p else 0.0)
    if nb:
        gap = gap + jnp.sum(S * Z)
    mu = gap / nu

    d_lp = z_lp / s_lp if p else s_lp
    if nb:
        Tinv, Rnt, Rinv, lam = _nt_scaling(S, Z)
        Zinv = _psd_inv(Z)
        Y = jnp.einsum('bij,bkjl,blm->bkim', Tinv, Aj, Tinv)
        Hmat = jnp.einsum('binm,bknm->ik', Aj, Y)
        if p:
            Hmat = Hmat + (Glj.T * d_lp) @ Glj
    else:
        Hmat = (Glj.T * d_lp) @ Glj

    def direction(sigma_mu, corr_lp, corr_psd):
        rhs = -rd
        if p:
            t_lp = s_lp - sigma_mu / z_lp + corr_lp
            rhs = rhs + Glj.T @ (d_lp * (rp_lp + t_lp))
        else:
            t_lp = s_lp
        if nb:
            t_psd = S - sigma_mu * Zinv + corr_psd
            U = _sym(jnp.einsum('bij,bjl,blm->bim', Tinv, Rp + t_psd, Tinv))
            rhs = rhs + jnp.einsum('binm,bnm->i', Aj, U)
        dx = _chol_solve(Hmat, rhs)
        if p:
            ds_lp = rp_lp - Glj @ dx
            dz_lp = d_lp * (Glj @ dx - rp_lp - t_lp)
        else:
            ds_lp = s_lp
            dz_lp = z_lp
        if nb:
            Adx = jnp.einsum('i,binm->bnm', dx, Aj)
            dS = Rp - Adx
            dZ = _sym(jnp.einsum('bij,bjl,blm->bim', Tinv,
                                 Adx - Rp - t_psd, Tinv))
        else:
            dS = S
            dZ = Z
        return dx, ds_lp, dS, dz_lp, dZ

    def max_steps(ds_lp, dS, dz_lp, dZ):
        ap = ad = jnp.asarray(jnp.inf)
        if p:
            ap = _max_step_lp(s_lp, ds_lp)
            ad = _max_step_lp(z_lp, dz_lp)
        if nb:
            ap = jnp.minimum(ap, _max_step_psd(S, dS))
            ad = jnp.minimum(ad, _max_step_psd(Z, dZ))
        return ap, ad

    # predictor (affine)
    zero_psd = jnp.zeros_like(S) if nb else S
    zero_lp = jnp.zeros_like(s_lp)
    dxa, dsa_lp, dSa, dza_lp, dZa = direction(0.0, zero_lp, zero_psd)
    ap_a, ad_a = max_steps(dsa_lp, dSa, dza_lp, dZa)
    ap_a = jnp.minimum(1.0, ap_a)
    ad_a = jnp.minimum(1.0, ad_a)

    gap_aff = ((s_lp + ap_a * dsa_lp) @ (z_lp + ad_a * dza_lp) if p else 0.0)
    if nb:
        gap_aff = gap_aff + jnp.sum((S + ap_a * dSa) * (Z + ad_a * dZa))
    sigma = jnp.clip((gap_aff / gap) ** 3, 1e-8, 1.0)

    # Mehrotra second-order correction, LP cone
    corr_lp = dsa_lp * dza_lp / z_lp if p else zero_lp
    # ... and PSD cones: corr = W^T( lam o^{-1} [(W^-T dS) o (W dZ)] )
    # with lam diagonal so (lam o X)_{ij} = (lam_i + lam_j)/2 X_{ij}
    if nb:
        dSs = Rinv @ dSa @ jnp.swapaxes(Rinv, -1, -2)       # W^{-T} dS
        dZs = jnp.swapaxes(Rnt, -1, -2) @ dZa @ Rnt         # W dZ
        Q = _sym(dSs @ dZs)
        denom = (lam[:, :, None] + lam[:, None, :]) / 2.0
        X = Q / denom
        corr_psd = _sym(Rnt @ X @ jnp.swapaxes(Rnt, -1, -2))
    else:
        corr_psd = zero_psd

    dx, ds_lp, dS, dz_lp, dZ = direction(sigma * mu, corr_lp, corr_psd)
    ap, ad = max_steps(ds_lp, dS, dz_lp, dZ)

    # Mehrotra safeguard: on ill-conditioned problems the second-order
    # correction can overshoot the cone and collapse the step; fall
    # back to the pure centering direction when that happens.
    a_corr = jnp.minimum(ap, ad)
    a_affm = jnp.minimum(ap_a, ad_a)
    use_fallback = a_corr < 0.2 * a_affm
    dx2, ds_lp2, dS2, dz_lp2, dZ2 = direction(
        jnp.maximum(sigma, 0.5) * mu, zero_lp, zero_psd)
    ap2, ad2 = max_steps(ds_lp2, dS2, dz_lp2, dZ2)

    def pick(a, b):
        return jnp.where(use_fallback, b, a)

    dx = pick(dx, dx2)
    ds_lp = pick(ds_lp, ds_lp2)
    dS = pick(dS, dS2)
    dz_lp = pick(dz_lp, dz_lp2)
    dZ = pick(dZ, dZ2)
    ap = pick(ap, ap2)
    ad = pick(ad, ad2)

    # equal primal/dual step: with an infeasible start, unequal steps
    # let the duality gap wander (grow) while residuals are large
    a = jnp.minimum(1.0, step_frac * jnp.minimum(ap, ad))

    x_n = x + a * dx
    s_lp_n = s_lp + a * ds_lp
    z_lp_n = z_lp + a * dz_lp
    S_n = _sym(S + a * dS) if nb else S
    Z_n = _sym(Z + a * dZ) if nb else Z

    # dual cleanup: minimum-norm correction restoring G^T z = -c,
    # applied only when it keeps z strictly inside the cone
    rd_n = cj + (Glj.T @ z_lp_n if p else 0.0)
    if nb:
        rd_n = rd_n + jnp.einsum('binm,bnm->i', Aj, Z_n)
    delta = -(_Gall_j @ _chol_solve(_GtG_j, rd_n))
    # polish only once the dual residual is already small relative to
    # the data -- a large projection mid-run throws the iterate off the
    # central path and stalls the method
    beta = jnp.where(jnp.linalg.norm(rd_n) < 1e-4 * cnorm, 1.0, 0.0)
    if p:
        beta = jnp.minimum(beta, 0.99 * _max_step_lp(z_lp_n, delta[:p]))
    if nb:
        dZc = _sym(delta[p:].reshape(nb, n, n))
        beta = jnp.minimum(beta, 0.99 * _max_step_psd(Z_n, dZc))
    beta = jnp.maximum(beta, 0.0)
    z_lp_n = z_lp_n + beta * delta[:p]
    if nb:
        Z_n = _sym(Z_n + beta * dZc)

    pres = jnp.sqrt((rp_lp @ rp_lp if p else 0.0)
                    + (jnp.sum(Rp * Rp) if nb else 0.0))
    dres = jnp.linalg.norm(rd)
    return x_n, s_lp_n, S_n, z_lp_n, Z_n, gap, pres, dres, a


# ------------------------------- solver ---------------------------------- #

def solve_cone_lp(c: np.ndarray,
                  Gl: Optional[np.ndarray],
                  hl: Optional[np.ndarray],
                  As: Optional[np.ndarray] = None,
                  Hs: Optional[np.ndarray] = None,
                  tol: float = 1.0e-8,
                  feastol: float = 1.0e-8,
                  max_iter: int = 200,
                  step_frac: float = 0.99,
                  equilibrate: bool = True,
                  verbose: bool = False) -> ConeLPResult:
    """Solve  min c^T x  s.t.  Gl x <= hl,  sum_i x_i As[b,i] <= Hs[b].

    ``As``: (nb, nx, n, n) symmetric coefficient slices; ``Hs``: (nb, n, n).
    Host numpy in, host numpy out; the per-iteration work is jitted.
    """
    c_np = np.asarray(c, dtype=np.float64)
    nx = c_np.shape[0]
    if Gl is None:
        Gl = np.zeros((0, nx))
        hl = np.zeros((0,))
    Gl_np = np.asarray(Gl, dtype=np.float64).reshape(-1, nx)
    hl_np = np.asarray(hl, dtype=np.float64).ravel()
    p = Gl_np.shape[0]
    if As is None:
        As = np.zeros((0, nx, 1, 1))
        Hs = np.zeros((0, 1, 1))
    As_np = np.asarray(As, dtype=np.float64)
    As_np = (As_np + np.swapaxes(As_np, -1, -2)) / 2
    Hs_np = np.asarray(Hs, dtype=np.float64)
    Hs_np = (Hs_np + np.swapaxes(Hs_np, -1, -2)) / 2
    nb, _, n, _ = As_np.shape

    # Column (variable) equilibration: x = colscale * x_tilde.  MLBLUE
    # LMI coefficient columns span many orders of magnitude when model
    # correlations approach 1 (group inverse-covariance blocks ~1/(1-rho^2))
    # and the IPM normal matrix would square that range.
    colscale = np.ones(nx)
    if equilibrate:
        norms = np.sqrt((Gl_np ** 2).sum(axis=0)
                        + (As_np ** 2).sum(axis=(0, 2, 3)))
        colscale = 1.0 / np.maximum(norms, 1e-300)
        Gl_np = Gl_np * colscale[None, :]
        As_np = As_np * colscale[None, :, None, None]
        c_np = c_np * colscale
    nu = p + nb * n
    if nu == 0:
        raise ValueError("empty cone")

    cj = jnp.asarray(c_np)
    Glj = jnp.asarray(Gl_np)
    hlj = jnp.asarray(hl_np)
    Aj = jnp.asarray(As_np)
    Hj = jnp.asarray(Hs_np)
    eye_n = jnp.eye(n, dtype=jnp.float64)

    hnorm = max(1.0, float(np.linalg.norm(hl_np)) + float(np.linalg.norm(Hs_np)))
    cnorm = max(1.0, float(np.linalg.norm(c_np)))

    # ------------------------- initialization ------------------------- #
    # The stacked constraint matrix and its Gram factor are also reused by
    # the per-iteration dual cleanup: correcting z by the minimum-norm
    # solution of G^T dz = -rd keeps the dual residual at machine
    # precision; late IPM iterations otherwise lose dual feasibility to
    # cancellation when recovering dz through (W^T W)^{-1}.
    if nb:
        _Gall = np.concatenate(
            [Gl_np, As_np.reshape(nb, nx, n * n).transpose(0, 2, 1)
             .reshape(nb * n * n, nx)], axis=0)
    else:
        _Gall = Gl_np
    _GtG_j = jnp.asarray(_Gall.T @ _Gall)
    _Gall_j = jnp.asarray(_Gall)

    x, s_lp, S, z_lp, Z = _ipm_init(cj, Glj, hlj, Aj, Hj, _Gall_j, _GtG_j)

    # shift initial points into the cone interior (cvxopt-style)
    def _shift_lp(v):
        if p == 0:
            return v
        m = float(jnp.min(v))
        return v + max(0.0, -m) + 1.0 if m < 1e-8 else v

    def _shift_psd(V):
        if nb == 0:
            return V
        lam = float(jnp.min(jnp.linalg.eigvalsh(V)))
        if lam < 1e-8:
            V = V + (1.0 - min(lam, 0.0)) * eye_n[None]
        return V

    s_lp = _shift_lp(s_lp)
    z_lp = _shift_lp(z_lp)
    S = _shift_psd(S)
    Z = _shift_psd(Z)

    def iteration(x, s_lp, S, z_lp, Z):
        return _ipm_iteration(cj, Glj, hlj, Aj, Hj, _Gall_j, _GtG_j,
                              jnp.asarray(float(cnorm)),
                              jnp.asarray(float(step_frac)),
                              x, s_lp, S, z_lp, Z)


    # main loop with best-iterate tracking: on small problems the iteration
    # can stall (or blow up) once the duality gap hits f64 floor while a
    # residual sits just above tolerance -- keep the best point seen.
    def merit(g, pr, dr, po):
        return max(g / max(1.0, abs(po)), pr, dr)

    best = None  # (merit, x, gap, pres, dres, pobj, it)
    stall = 0
    it = 0
    for it in range(1, max_iter + 1):
        x_n, s_lp_n, S_n, z_lp_n, Z_n, gap_j, pres_j, dres_j, a_j = iteration(
            x, s_lp, S, z_lp, Z)
        gap = float(gap_j)
        pres = float(pres_j) / hnorm
        dres = float(dres_j) / cnorm
        if not (np.isfinite(gap) and np.isfinite(pres) and np.isfinite(dres)):
            break
        x, s_lp, S, z_lp, Z = x_n, s_lp_n, S_n, z_lp_n, Z_n
        pobj = float(cj @ x)
        relgap = gap / max(1.0, abs(pobj))
        m = merit(gap, pres, dres, pobj)
        if verbose:
            print("ipm %3d: gap=%9.2e pres=%9.2e dres=%9.2e step=%.3f"
                  % (it, relgap, pres, dres, float(a_j)))
        if best is None or m < best[0]:
            best = (m, np.asarray(x).copy(), gap, pres, dres, pobj, it)
            stall = 0
        else:
            stall += 1
        if pres < feastol and dres < feastol and relgap < tol:
            break
        # the pre-feasibility phase routinely wanders in gap while the
        # residuals shrink steadily; only count stall once near-feasible
        if pres < 1e-6 and dres < 1e-6:
            stall_limit = 12
        else:
            stall_limit = 40
        if stall >= stall_limit or float(a_j) < 1e-10:
            break

    if best is None:
        return ConeLPResult(x=np.full(nx, np.nan), status="failed",
                            iterations=it, gap=np.inf, pres=np.inf,
                            dres=np.inf, pobj=np.nan)
    m, xb, gap, pres, dres, pobj, itb = best
    xb = xb * colscale
    relgap = gap / max(1.0, abs(pobj))
    if pres < feastol and dres < feastol and relgap < tol:
        status = "optimal"
    elif pres < 1e3 * feastol and dres < 1e3 * feastol and relgap < 1e4 * tol:
        # the reference's cvxopt defaults run at reltol 1e-4 (sap.py:37-43);
        # on degenerate optimal faces the f64 gap floor sits well above the
        # nominal tol while feasibility is at machine precision
        status = "inaccurate"
    elif it >= max_iter:
        status = "max_iter"
    else:
        status = "failed"
    return ConeLPResult(x=xb, status=status, iterations=it,
                        gap=gap, pres=pres, dres=dres, pobj=pobj)
