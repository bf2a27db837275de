"""Fused Pallas TPU kernel for the diffusion flagship model.

Why this kernel exists (VERDICT r4 item 1a, the Pallas revisit): the
XLA-compiled sweep executes the model as a chain of ops over (batch,
grid) arrays -- the KL matmul materializes, every cyclic-reduction level
is its own small strided op, and the QoI reductions are separate passes.
Measured on the v5e at the SATURATED operating point (bench r5
``saturated_tier``: 23.4M evals in 1.55 s) that path achieves ~12.5 GB/s
of the chip's 819 GB/s -- 1.5% of the bandwidth roofline -- because the
per-level ops on small grids are microseconds of work each and the chip
idles between them.  The fix is not scheduling hints but FUSION: this
kernel keeps one batch tile's entire model -- mode synthesis (MXU
matmul), tridiagonal assembly, Thomas solve, and all three QoIs -- in
VMEM, touching HBM once for xi in (B x 32 f32) and once for the QoIs
out (3 x B f32).

Layout: the batch tile is shaped (S, 128) = (sublanes, lanes) and the
grid axis runs over rows of (m, S, 128) VMEM scratch, so every Thomas
step is a full-vreg VPU op and the per-step "dispatch" cost is a loop
iteration, not an XLA op launch.  The Thomas recurrence is sequential in
the grid dimension, but each step is 1024 lanes wide -- the classic
batched-tridiagonal layout (cuThomasBatch-style), which beats cyclic
reduction here because NO intermediate level arrays round-trip HBM.

The kernel is numerically the same algorithm as
models.diffusion.thomas_solve (oracle in tests/test_pallas_diffusion.py;
f32 agreement ~1e-6 relative, the dtype's own noise).  It is an opt-in
fast path: models/diffusion.py uses it only on the TPU backend
(BLUEST_TPU_PALLAS=0 disables; interpret=True runs it on CPU for tests).

Reference context: replaces the per-sample scipy ``solve_banded`` loop
of the reference's model scripts (e.g. restrictions_matern.py's FEniCS
solves) as the flagship's compute path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["diffusion_outputs_pallas"]

_LANES = 128


def _kernel(xiT_ref, mck_ref, qint_ref, qmid_ref, qeng_ref,
            a_ref, cp_ref, dp_ref, *, n_cells: int, S: int,
            inv_h2: float, h: float):
    m = n_cells - 1
    tile = S * _LANES
    # ---- mode synthesis on the MXU: (n, K) @ (K, tile) ----
    log_a = jnp.dot(mck_ref[:], xiT_ref[:],
                    preferred_element_type=jnp.float32)
    a_ref[:] = jnp.exp(log_a).reshape(n_cells, S, _LANES)

    inv_h2 = jnp.float32(inv_h2)
    one = jnp.ones((S, _LANES), jnp.float32)
    zero = jnp.zeros((S, _LANES), jnp.float32)

    def a_row(i):
        return a_ref[pl.ds(i, 1)].reshape(S, _LANES)

    # ---- Thomas forward sweep (carry (cp, dp); lower[0]/upper[m-1]
    # never used: zero carry / zero x_next make them inert, exactly as
    # in models.diffusion.thomas_solve) ----
    def fwd(i, carry):
        cp_prev, dp_prev = carry
        ai = a_row(i)
        ai1 = a_row(i + jnp.int32(1))
        diag = (ai + ai1) * inv_h2
        low = -ai * inv_h2
        up = -ai1 * inv_h2
        denom = diag - low * cp_prev
        cp = up / denom
        dp = (one - low * dp_prev) / denom
        cp_ref[pl.ds(i, 1)] = cp.reshape(1, S, _LANES)
        dp_ref[pl.ds(i, 1)] = dp.reshape(1, S, _LANES)
        return cp, dp

    # i32 bounds: under jax x64 a plain-int fori_loop carries an i64
    # index, which Mosaic's dynamic-slice lowering rejects/mis-lowers
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(m), fwd, (zero, zero))

    # ---- backward substitution + fused QoI accumulation ----
    mid_idx = n_cells // 2 - 1     # u index of uu[n_cells // 2]

    def bwd(t, carry):
        x_next, s_int, energy, x_mid = carry
        i = jnp.int32(m - 1) - t
        cp = cp_ref[pl.ds(i, 1)].reshape(S, _LANES)
        dp = dp_ref[pl.ds(i, 1)].reshape(S, _LANES)
        x = dp - cp * x_next
        s_int = s_int + x
        d = x_next - x
        energy = energy + a_row(i + jnp.int32(1)) * d * d
        x_mid = jnp.where(i == jnp.int32(mid_idx), x, x_mid)
        return x, s_int, energy, x_mid

    x0, s_int, energy, x_mid = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(m), bwd, (zero, zero, zero, zero))
    energy = energy + a_row(0) * x0 * x0
    h = jnp.float32(h)
    qint_ref[:] = (h * s_int).reshape(1, S, _LANES)
    qmid_ref[:] = x_mid.reshape(1, S, _LANES)
    # q_energy = h * sum_j a_j ((u_{j+1}-u_j)/h)^2 = (1/h) sum a (du)^2
    qeng_ref[:] = (energy / h).reshape(1, S, _LANES)


def _tile_rows(n_cells: int) -> int:
    """Batch-tile sublane count S (tile = S * 128 samples), sized so the
    kernel's VMEM residency (a + cp + dp ~ 3 * n * S * 128 * 4B) stays
    well under the ~16 MB budget."""
    budget = 6 << 20
    S = budget // max(3 * n_cells * _LANES * 4, 1)
    return int(max(1, min(8, S)))


@functools.partial(jax.jit, static_argnames=("n_cells", "sigma", "nu",
                                             "interpret"))
def diffusion_outputs_pallas(xis, n_cells: int, sigma: float = 1.0,
                             nu: float = 1.5, interpret: bool = False):
    """Batched three-QoI diffusion evaluation, fully fused in one Pallas
    kernel.  xis: (B, n_kl) float32 -> (B, 3) float32.  Matches
    models.diffusion.solve_diffusion_outputs (vmapped) to f32 accuracy."""
    xis = jnp.asarray(xis, jnp.float32)
    B, n_kl = xis.shape
    S = _tile_rows(n_cells)
    tile = S * _LANES
    Bp = -(-B // tile) * tile
    if Bp != B:
        xis = jnp.pad(xis, ((0, Bp - B), (0, 0)))

    h = 1.0 / n_cells
    xf = (np.arange(n_cells) + 0.5) * h
    k = np.arange(1, n_kl + 1)
    ck = sigma * k ** (-nu) * np.sqrt(2.0)
    mck = jnp.asarray(np.sin(np.pi * xf[:, None] * k[None, :])
                      * ck[None, :], jnp.float32)

    m = n_cells - 1
    grid = (Bp // tile,)
    # index maps use i32 zeros: under jax x64 a Python-int 0 becomes an
    # i64 constant and Mosaic rejects the mixed-type index-map return
    z = np.int32(0)
    out_block = pl.BlockSpec((1, S, _LANES), lambda i: (i, z, z))
    qint, qmid, qeng = pl.pallas_call(
        functools.partial(_kernel, n_cells=n_cells, S=S,
                          inv_h2=1.0 / h ** 2, h=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_kl, tile), lambda i: (z, i)),   # xi^T tile
            pl.BlockSpec((n_cells, n_kl), lambda i: (z, z)),
        ],
        out_specs=[out_block, out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((Bp // tile, S, _LANES),
                                        jnp.float32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((n_cells, S, _LANES), jnp.float32),   # a
            pltpu.VMEM((max(m, 1), S, _LANES), jnp.float32),  # cp
            pltpu.VMEM((max(m, 1), S, _LANES), jnp.float32),  # dp
        ],
        interpret=interpret,
    )(xis.T, mck)
    out = jnp.stack([qint.reshape(Bp), qmid.reshape(Bp),
                     qeng.reshape(Bp)], axis=1)
    return out[:B]
