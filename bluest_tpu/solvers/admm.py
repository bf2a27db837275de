"""Operator-splitting (ADMM / SCS-style) cone solver: the second,
algorithmically independent SDP backend.

Solves the same inequality-form cone program as solvers.sdp.solve_cone_lp

    minimize    c^T x
    subject to  Gl x <= hl                          (componentwise)
                sum_i x_i As[b, i]  <=  Hs[b]       (PSD order, per block)

but by a completely different algorithm: Douglas-Rachford splitting on
the homogeneous self-dual embedding (the SCS method of O'Donoghue,
Chu, Parikh & Boyd, "Conic optimization via operator splitting and
homogeneous self-dual embedding", JOTA 2016).  Where the interior-point
solver takes ~60 Newton steps each requiring a factorization of the
iteration-dependent normal matrix, this method takes thousands of cheap
first-order steps against ONE fixed factorization of I + A^T A and a
cone projection (clip for the orthant, eigenvalue clipping for PSD
blocks).  No step of the two solvers is shared -- different embedding
variables, different linear systems, different convergence mechanisms --
which is exactly what makes it a genuine cross-check: agreement between
the two is evidence about the *problem*, not about shared code.

Role in bluest_tpu: the reference cross-validates allocations across
cvxopt/cvxpy/scipy/ipopt (solver_test blocks, e.g. reference
bluest_NS.py:124-140); cvxopt/cvxpy are not installable here, so this
module supplies the missing *independent SDP* family next to the IPM
(solvers/sdp.py), the scipy NLP, and the SPG family.  First-order cone
solvers converge linearly at best, so this backend targets validation
accuracy (~1e-6 residuals), not the IPM's 1e-9: use it through
``SAP.solve(solver="admm")`` / ``MOSAP.solve(solver="admm")``, not as
the production default.  The diagonal+capacitance factorization below
makes the linear algebra scale to L in the thousands; what does NOT
scale is first-order convergence on near-degenerate correlation
ladders (rho -> 1-1e-5), where the splitting stalls and the IPM
remains the only solver -- see tests/test_admm.py for the regimes the
cross-check actually covers.

In SCS notation the problem is  min c'x  s.t.  Ax + s = b, s in K  with
A = [Gl; svec rows of the PSD blocks], b = [hl; svec(Hs)].  The HSD
embedding variable is u = (x, z, tau), v = (0, s, kappa) with the
skew-symmetric KKT operator

    Q = [[0,  A', c], [-A, 0, b], [-c', -b', 0]],

and the iteration (over-relaxation alpha in (0, 2))

    u~    = (I + Q)^{-1} (u + v)
    t     = alpha u~ + (1 - alpha) u
    u^+   = Pi_C(t - v),      C = R^nx x K* x R_+   (K self-dual here)
    v^+   = v - t + u^+

The (I + Q) solve reduces to one Cholesky solve with the cached factor
of I + A'A plus O(m + nx) vector work (paper, section 4).  The whole
iteration -- linear solve, cone projection, residual tracking, best-
iterate bookkeeping -- runs inside one jitted ``lax.while_loop`` (same
O(1)-dispatch design as the IPM).

Large-L structure exploitation (round 3, mirrors the IPM's Woodbury):
MLBLUE cone programs lead with the ``m >= 0`` block, a full -I whose
rows have a single nonzero each.  Those rows are split out of A into a
scatter operator (matvec O(pd) instead of O(pd*nx)) and contribute only
a DIAGONAL to A'A, so  I + A'A = D + Ar' Ar  with Ar just the dense
remainder (budget/e/caps rows + the svec'd LMI slabs) of rank
mr ~ nb*(M+1)^2/2 << nx = L+1.  When ``nx >= max(256, 1.5*mr)`` the
solver factors the mr x mr capacitance  I + Ar D^-1 Ar'  instead of the
dense nx x nx matrix -- unlike the IPM's Woodbury there is no 1/mu^2
span to guard against (D >= 1 and the capacitance is I + PSD), so no
refinement is needed.  This removes both the O(nx^3) factorization and
the O(nx^2) per-iteration triangular solves (previously L ~ 3300 meant
an 87 MB dense factor and nx^2 solves per iteration).  The remaining
large-L limit is the first-order iteration count itself, which grows
with conditioning: L ~ 640 generic instances converge to 1e-6 in ~10k
iterations (~3s), while L ~ 2500 with costs spanning 3 decades reaches
only ~1e-3 agreement within 60k iterations -- use the IPM's own
certificates there.

Scaling: Ruiz equilibration of A with per-row scalars on the LP block
and ONE scalar per PSD block (per-coordinate scaling of svec rows would
break the cone), diagonal column scaling on x, then b/c norm balancing
-- the standard SCS normalization, without which the splitting crawls
on MLBLUE's badly-scaled LMIs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sdp import ConeLPResult

__all__ = ["solve_cone_lp_admm"]


# ------------------------------ svec helpers ------------------------------ #

def _svec_indices(n: int):
    iu0, iu1 = np.triu_indices(n)
    wts = np.where(iu0 == iu1, 1.0, np.sqrt(2.0))
    return iu0, iu1, wts


def _svec_np(X: np.ndarray, iu0, iu1, wts) -> np.ndarray:
    """Symmetric vectorization of (..., n, n) -> (..., ns) with the
    sqrt(2) off-diagonal weights that make <X,Y>_F = svec(X).svec(Y)."""
    return X[..., iu0, iu1] * wts


def _mat_factory(n: int, iu0, iu1, wts):
    """jax svec^{-1}: (ns,) -> (n, n) symmetric."""
    iu0_j = jnp.asarray(iu0)
    iu1_j = jnp.asarray(iu1)
    inv_w = jnp.asarray(1.0 / wts)

    def mat(v):
        h = v * inv_w
        X = jnp.zeros((n, n), dtype=v.dtype)
        X = X.at[iu0_j, iu1_j].set(h)
        return X + X.T - jnp.diag(jnp.diag(X))

    return mat


# ------------------------------ core solver ------------------------------- #

@partial(jax.jit, static_argnames=("p", "nb", "n", "max_iter", "wood"))
def _admm_run(cols, coefs, Ar, D, bh, ch, p, nb, n, max_iter, tol, alpha,
              wood):
    """Scaled-space SCS loop over the ROW-SPLIT constraint matrix
    A = [S; Ar]: S the single-nonzero LP rows as a scatter
    (``S x = coefs * x[cols]``), Ar the dense remainder, with
    D = diag(I + S'S) precomputed on the host.  ``wood`` (static)
    selects the capacitance factorization of I + A'A = diag(D) + Ar'Ar.
    bh/ch are the equilibrated rhs/objective (rows permuted so the S
    block leads).  Returns the best iterate (by worst-of residuals) and
    its diagnostics."""
    pd = cols.shape[0]
    mr, nx = Ar.shape
    m = pd + mr
    ns = (n * (n + 1)) // 2
    iu0, iu1, wts = _svec_indices(n)
    mat = _mat_factory(n, iu0, iu1, wts)
    svec_w = jnp.asarray(wts)
    iu0_j = jnp.asarray(iu0)
    iu1_j = jnp.asarray(iu1)

    def Amul(x):
        return jnp.concatenate([coefs * x[cols], Ar @ x])

    def ATmul(z):
        out = jnp.zeros(nx, Ar.dtype).at[cols].add(coefs * z[:pd])
        return out + Ar.T @ z[pd:]

    # cached factorization of I + A'A = diag(D) + Ar'Ar (the only
    # linear algebra the method ever factors; A is fixed so this
    # happens once per solve)
    if wood and mr:
        # capacitance form: (D + Ar'Ar)^-1 r
        #   = D^-1 r - D^-1 Ar' (I + Ar D^-1 Ar')^-1 Ar D^-1 r
        Di = 1.0 / D
        ArDi = Ar * Di[None, :]
        capF = jnp.linalg.cholesky(jnp.eye(mr) + ArDi @ Ar.T)

        def hsolve(r):
            y = Di * r
            t = jax.scipy.linalg.cho_solve((capF, True), Ar @ y)
            return y - ArDi.T @ t
    elif mr:
        F = jnp.linalg.cholesky(jnp.diag(D) + Ar.T @ Ar)

        def hsolve(r):
            return jax.scipy.linalg.cho_solve((F, True), r)
    else:
        def hsolve(r):
            return r / D

    def msolve(rx, rz):
        """[[I, A'], [-A, I]] (x, y) = (rx, rz)."""
        x = hsolve(rx - ATmul(rz))
        return x, rz + Amul(x)

    qx, qz = msolve(ch, bh)
    denom0 = 1.0 + ch @ qx + bh @ qz

    def iq_solve(wx, wz, wt):
        px, pz = msolve(wx, wz)
        t = (wt + ch @ px + bh @ pz) / denom0
        return px - t * qx, pz - t * qz, t

    def proj_cone(z):
        """Projection onto K = R_+^p x PSD^nb (self-dual)."""
        z_lp = jnp.maximum(z[:p], 0.0) if p else z[:p]
        if nb:
            Zs = jax.vmap(mat)(z[p:].reshape(nb, ns))
            lam, V = jnp.linalg.eigh(Zs)
            lam = jnp.maximum(lam, 0.0)
            Zp = jnp.einsum('bij,bj,bkj->bik', V, lam, V)
            z_psd = (Zp[:, iu0_j, iu1_j] * svec_w).reshape(-1)
            return jnp.concatenate([z_lp, z_psd])
        return z_lp

    bnorm = jnp.linalg.norm(bh)
    cnorm = jnp.linalg.norm(ch)

    def residuals(ux, uz, ut, vz):
        """Scaled-space SCS termination metrics at the tau-normalized
        candidate (x, z, s) = (ux, uz, vz) / ut."""
        tau = jnp.maximum(ut, 1e-300)
        Ax = Amul(ux)
        ATz = ATmul(uz)
        ctx = ch @ ux / tau
        btz = bh @ uz / tau
        pres = jnp.linalg.norm(Ax + vz - bh * ut) / tau / (1.0 + bnorm)
        dres = jnp.linalg.norm(ATz + ch * ut) / tau / (1.0 + cnorm)
        gap = jnp.abs(ctx + btz) / (1.0 + jnp.abs(ctx) + jnp.abs(btz))
        return pres, dres, gap, Ax, ATz, ctx, btz

    u0 = jnp.zeros(nx + m + 1).at[-1].set(1.0)
    v0 = jnp.zeros(nx + m + 1).at[-1].set(1.0)

    st0 = {
        "u": u0, "v": v0, "it": jnp.asarray(0),
        "done": jnp.asarray(0),
        "best_err": jnp.asarray(jnp.inf),
        "best_u": u0, "best_v": v0,
        "pres": jnp.asarray(jnp.inf), "dres": jnp.asarray(jnp.inf),
        "gap": jnp.asarray(jnp.inf),
    }

    def cond(st):
        return (st["it"] < max_iter) & (st["done"] == 0)

    def body(st):
        u, v = st["u"], st["v"]
        w = u + v
        tx, tz, tt = iq_solve(w[:nx], w[nx:nx + m], w[-1])
        ut = jnp.concatenate([tx, tz, tt[None]])
        t = alpha * ut + (1.0 - alpha) * u
        r = t - v
        un = jnp.concatenate([
            r[:nx],                                  # x block: free
            proj_cone(r[nx:nx + m]),                 # z block: K*
            jnp.maximum(r[-1:], 0.0),                # tau: R_+
        ])
        vn = v - t + un

        pres, dres, gap, Ax, ATz, ctx, btz = residuals(
            un[:nx], un[nx:nx + m], un[-1], vn[nx:nx + m])
        err = jnp.maximum(jnp.maximum(pres, dres), gap)
        improved = err < st["best_err"]
        best_err = jnp.where(improved, err, st["best_err"])
        best_u = jnp.where(improved, un, st["best_u"])
        best_v = jnp.where(improved, vn, st["best_v"])

        # certificates (SCS section 3.4): tau -> 0 with a cone-feasible
        # ray, tested scale-invariantly on the NORMALIZED ray (the
        # iterate grows along the certificate direction as tau
        # collapses).  z with A'z ~ 0, b'z < 0: primal infeasible.
        # (x, s) with Ax + s ~ 0, c'x < 0: unbounded.
        tau = un[-1]
        kappa = vn[-1]
        tiny_tau = tau < 1e-12 * jnp.maximum(1.0, kappa)
        uz_n = jnp.linalg.norm(un[nx:nx + m])
        ux_n = jnp.linalg.norm(un[:nx])
        raw_btz = bh @ un[nx:nx + m]
        raw_ctx = ch @ un[:nx]
        z_inf = ((uz_n > 1e-12)
                 & (jnp.linalg.norm(ATz) <= 1e-9 * uz_n)
                 & (raw_btz < -1e-9 * uz_n))
        x_unb = ((ux_n > 1e-12)
                 & (jnp.linalg.norm(Ax + vn[nx:nx + m]) <= 1e-9 * ux_n)
                 & (raw_ctx < -1e-9 * ux_n))
        done = jnp.where(err < tol, 1, 0)
        done = jnp.where(tiny_tau & x_unb, 4, done)
        done = jnp.where(tiny_tau & z_inf, 3, done)   # infeasible wins
        # non-finite data/iterates: every comparison above is False on
        # NaN, which would otherwise grind through all max_iter batched
        # eigh iterations before reporting -- exit now (status 'failed')
        done = jnp.where(jnp.isfinite(err), done, 2)

        return {
            "u": un, "v": vn, "it": st["it"] + 1, "done": done,
            "best_err": best_err, "best_u": best_u, "best_v": best_v,
            "pres": pres, "dres": dres, "gap": gap,
        }

    st = jax.lax.while_loop(cond, body, st0)
    bu, bv = st["best_u"], st["best_v"]
    pres, dres, gap, _, _, ctx, _ = residuals(
        bu[:nx], bu[nx:nx + m], bu[-1], bv[nx:nx + m])
    return (bu[:nx], bu[-1], st["it"], st["done"],
            pres, dres, gap, ctx, st["best_err"])


def solve_cone_lp_admm(c: np.ndarray,
                       Gl: Optional[np.ndarray] = None,
                       hl: Optional[np.ndarray] = None,
                       As: Optional[np.ndarray] = None,
                       Hs: Optional[np.ndarray] = None,
                       max_iter: int = 60000,
                       tol: float = 1e-6,
                       alpha: float = 1.8,
                       ruiz_iters: int = 10,
                       woodbury: Optional[bool] = None,
                       verbose: bool = False) -> ConeLPResult:
    """Solve the cone program with the operator-splitting method.

    Same contract as :func:`solvers.sdp.solve_cone_lp` (argument layout,
    ConeLPResult, status vocabulary) so callers can swap backends.
    ``woodbury`` forces the capacitance factorization on/off; the
    default auto-enables it when nx >= max(256, 1.5 * (dense rows))."""
    c_np = np.asarray(c, dtype=np.float64)
    nx = c_np.shape[0]
    Gl_np = (np.zeros((0, nx)) if Gl is None
             else np.asarray(Gl, dtype=np.float64).reshape(-1, nx))
    hl_np = (np.zeros(0) if hl is None
             else np.asarray(hl, dtype=np.float64).ravel())
    p = Gl_np.shape[0]
    if As is None or np.size(As) == 0:
        As_np = np.zeros((0, nx, 1, 1))
        Hs_np = np.zeros((0, 1, 1))
    else:
        # symmetrize like solve_cone_lp does: _svec_np keeps only the
        # upper triangle, so an asymmetric input would otherwise make the
        # two 'same contract' backends solve DIFFERENT LMIs -- fatal for
        # the cross-validation role
        As_np = np.asarray(As, dtype=np.float64)
        As_np = (As_np + np.swapaxes(As_np, -1, -2)) / 2.0
        Hs_np = np.asarray(Hs, dtype=np.float64)
        Hs_np = (Hs_np + np.swapaxes(Hs_np, -1, -2)) / 2.0
    nb, _, n, _ = As_np.shape
    ns = (n * (n + 1)) // 2
    m = p + nb * ns
    if m == 0:
        raise ValueError("empty cone")

    # stack A = [Gl; svec(As)] and b = [hl; svec(Hs)]
    iu0, iu1, wts = _svec_indices(n)
    if nb:
        Apsd = np.transpose(_svec_np(As_np, iu0, iu1, wts),
                            (0, 2, 1)).reshape(nb * ns, nx)
        bpsd = _svec_np(Hs_np, iu0, iu1, wts).reshape(-1)
        A = np.vstack([Gl_np, Apsd])
        b = np.concatenate([hl_np, bpsd])
    else:
        A, b = Gl_np, hl_np

    # --- Ruiz equilibration: per-row scalars on the LP block, one scalar
    # per PSD block (cone invariance), diagonal column scaling on x
    d = np.ones(m)
    e = np.ones(nx)
    for _ in range(max(int(ruiz_iters), 0)):
        Asc = A / d[:, None] / e[None, :]
        rn = np.abs(Asc).max(axis=1)
        if nb:
            # uniform within each PSD block (cone invariance): block max
            rpsd = rn[p:].reshape(nb, ns).max(axis=1)
            rn = np.concatenate([rn[:p], np.repeat(rpsd, ns)])
        cn = np.abs(Asc).max(axis=0)
        d *= np.sqrt(np.where(rn > 0, rn, 1.0))
        e *= np.sqrt(np.where(cn > 0, cn, 1.0))
    Ah = A / d[:, None] / e[None, :]
    bh = b / d
    ch = c_np / e
    # balance ||b|| against ||c|| (SCS normalization): the splitting's
    # progress on tau couples the two scales
    bn, cn_ = np.linalg.norm(bh), np.linalg.norm(ch)
    sc_b = np.clip((cn_ + 1.0) / (bn + 1.0), 1e-6, 1e6)
    bh = bh * sc_b

    # --- row split: single-nonzero LP rows (the m >= 0 block and any
    # box rows) become a scatter S and a diagonal contribution to A'A;
    # everything else stays a dense (mr, nx) slab.  LP rows may be
    # permuted among themselves freely (R_+^p is coordinate-symmetric)
    # as long as bh moves with them; equilibration preserves the
    # sparsity pattern, so detection on Ah is detection on A.
    nnz_rows = np.count_nonzero(Ah, axis=1)
    diag_lp = np.flatnonzero((np.arange(m) < p) & (nnz_rows == 1))
    rest = np.setdiff1d(np.arange(m), diag_lp)   # sorted: keeps order
    cols = Ah[diag_lp].nonzero()[1]
    coefs = Ah[diag_lp, cols]
    Ar = Ah[rest]
    bh = np.concatenate([bh[diag_lp], bh[rest]])
    D = np.ones(nx)
    np.add.at(D, cols, coefs ** 2)
    mr = Ar.shape[0]
    wood = (nx >= max(256, int(1.5 * mr)) if woodbury is None
            else bool(woodbury))

    xh, tau, it, done, pres, dres, gap, ctx, best_err = [
        np.asarray(v) for v in _admm_run(
            jnp.asarray(cols), jnp.asarray(coefs), jnp.asarray(Ar),
            jnp.asarray(D), jnp.asarray(bh), jnp.asarray(ch),
            p, nb, n, int(max_iter), float(tol), float(alpha), wood)]

    tau_f = float(tau)
    if int(done) == 2 or tau_f <= 0 or not np.isfinite(tau_f):
        status = {3: "infeasible", 4: "unbounded"}.get(int(done), "failed")
        return ConeLPResult(np.full(nx, np.nan), status, int(it),
                            float(gap), float(pres), float(dres), np.nan)
    # unscale: x = E^{-1} x_hat / (tau * sc_b)
    x = np.asarray(xh) / e / tau_f / sc_b
    pobj = float(c_np @ x)
    err = float(best_err)
    if int(done) == 1 or err < tol:
        status = "optimal"
    elif int(done) == 3:
        status = "infeasible"
    elif int(done) == 4:
        status = "unbounded"
    elif err < 1e-4:
        status = "inaccurate"
    else:
        status = "max_iter"
    if verbose:
        print("admm: it=%d status=%s pres=%.2e dres=%.2e gap=%.2e"
              % (int(it), status, float(pres), float(dres), float(gap)))
    return ConeLPResult(x, status, int(it), float(gap),
                        float(pres), float(dres), pobj)
