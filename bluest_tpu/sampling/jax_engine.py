"""Device-side Monte Carlo sampling engine.

The performance story of the framework: the reference's per-sample Python
loop + MPI allreduce (blue_fn.py:115-187) becomes one jitted, vmapped,
optionally shard_mapped reduction.  For a fixed coupled-model group, the
user's sampler+evaluate pair is a pure function ``model_fn(key) -> (No, L)``;
the engine

  * fans the PRNG out per sample via ``jax.random.fold_in`` (the per-rank
    seed discipline of the reference, tutorials/01_tutorial.py:154-167,
    made deterministic and split-free),
  * rejects non-finite outputs with a bounded per-sample resample loop
    (reference: infinite retry, blue_fn.py:118-129),
  * accumulates sample sums, cross products and MLMC pairwise differences
    in float64 regardless of the model dtype,
  * shards the sample axis over a mesh with a psum merge (the MPI
    allreduce, blue_fn.py:179-187), and
  * masks padding lanes so the requested N is exact on any device count
    (the reference instead rounds pilot N up to the rank count,
    blue_models.py:97).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import SAMPLE_AXIS


class SampleSums(NamedTuple):
    sumse: jnp.ndarray        # (No, L, d)  sum of outputs (d = output dim)
    sumsc: jnp.ndarray        # (No, L, L) sum of pairwise inner products
    sumsd1: jnp.ndarray       # (No, L, L, d) sum of differences (i - j)
    sumsd2: jnp.ndarray       # (No, L, L) sum of squared difference norms
    n_failed: jnp.ndarray     # samples still non-finite after retries


def _one_sample(model_fn: Callable, key, max_resample: int):
    P0 = model_fn(key)
    ok0 = jnp.all(jnp.isfinite(P0))
    if max_resample == 0:
        # model guaranteed finite (or caller accepts drops): no retry loop,
        # which keeps the compiled program a straight-line batch computation
        return P0, ok0

    def cond(st):
        tries, P, ok = st
        return (~ok) & (tries < max_resample)

    def body(st):
        tries, P, ok = st
        k2 = jax.random.fold_in(key, tries + 1)
        P2 = model_fn(k2)
        ok2 = jnp.all(jnp.isfinite(P2))
        return tries + 1, jnp.where(ok2, P2, P), ok2

    _, P, ok = jax.lax.while_loop(cond, body, (jnp.asarray(0), P0, ok0))
    return P, ok


def build_group_engine(model_fn: Callable, No: int, L: int,
                       batch_size: int = 4096,
                       mesh: Optional[jax.sharding.Mesh] = None,
                       max_resample: int = 64):
    """Compile a sampling reduction for one coupled-model group.

    ``model_fn(key) -> (No, L)`` -- or ``(No, L, d)`` for vector-valued
    outputs, with the dot product as the inner product (the reference's
    array-output convention, blue_fn.py:159-167) -- must be jax-traceable.
    Returns ``engine(key, N) -> SampleSums``.  The compiled engine should
    be cached by the caller (one per group)."""

    # shard count comes from the SAMPLE axis, not the device count: on a
    # 2D (samples x model) mesh, devices.size would make every shard skip
    # to index ranges only devices.size/sample_shards of which are ever
    # computed -- silently biasing the sums low (the idx<N mask cannot
    # tell a skipped index from a finished one).  Mirrors KernelEngineV2.
    has_sample = mesh is not None and SAMPLE_AXIS in mesh.axis_names
    n_shards = mesh.shape[SAMPLE_AXIS] if has_sample else 1
    out_shape = jax.eval_shape(model_fn, jax.random.key(0)).shape
    d = out_shape[2] if len(out_shape) == 3 else 1

    def shard_sums(key, N, shard_idx, n_pad_per_shard):
        """Sums over this shard's index range [shard_idx*pad, ...)."""
        n_chunks = n_pad_per_shard // batch_size
        # dynamic loop bound: chunks entirely past the requested N are
        # skipped, so the pow2 bucket padding costs buffer shape only --
        # not model evaluations (N just above a bucket boundary used to
        # EVALUATE the model on up to 2x the requested samples, masked
        # out of the sums afterwards; mirrors KernelEngineV2's sweep)
        remaining = N - shard_idx * n_pad_per_shard
        n_active = jnp.clip(-(-remaining // batch_size), 0, n_chunks)

        def chunk(c, carry):
            se, sc, d1, d2, nf = carry
            base = shard_idx * n_pad_per_shard + c * batch_size
            idx = base + jnp.arange(batch_size)
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
            Ps, oks = jax.vmap(
                lambda k: _one_sample(model_fn, k, max_resample))(keys)
            Ps = Ps.astype(jnp.float64)
            # zero rejected rows: w masks them out of the sums, but
            # 0 * NaN = NaN would still poison every einsum below
            # (max_resample=0 drops, or a sample exhausting its retries)
            Ps = jnp.where(jnp.isfinite(Ps), Ps, 0.0)
            if Ps.ndim == 3:
                Ps = Ps[..., None]        # (B, No, L, d)
            w = ((idx < N) & oks).astype(jnp.float64)
            nf = nf + jnp.sum((idx < N) & ~oks)
            se = se + jnp.einsum('bnld,b->nld', Ps, w)
            sc = sc + jnp.einsum('bnid,bnjd,b->nij', Ps, Ps, w)
            D = Ps[:, :, :, None, :] - Ps[:, :, None, :, :]
            d1 = d1 + jnp.einsum('bnijd,b->nijd', D, w)
            d2 = d2 + jnp.einsum('bnijd,bnijd,b->nij', D, D, w)
            return (se, sc, d1, d2, nf)

        init = (jnp.zeros((No, L, d)), jnp.zeros((No, L, L)),
                jnp.zeros((No, L, L, d)), jnp.zeros((No, L, L)),
                jnp.asarray(0, jnp.int64))
        se, sc, d1, d2, nf = jax.lax.fori_loop(0, n_active, chunk, init)
        return SampleSums(se, sc, d1, d2, nf)

    def engine(key, N, n_pad: int):
        """N is dynamic (appears only in masks); n_pad is static."""
        if mesh is None:
            return shard_sums(key, N, 0, n_pad)

        from jax.sharding import PartitionSpec as P

        def shard_fn(key, N):
            # sample shards partition the index range; a model-only mesh
            # still runs under shard_map so model_fn may use collectives
            # over MODEL_AXIS (the nested-parallelism pattern)
            i = jax.lax.axis_index(SAMPLE_AXIS) if has_sample else 0
            sums = shard_sums(key, N, i, n_pad)
            if has_sample:
                sums = jax.tree.map(
                    lambda x: jax.lax.psum(x, SAMPLE_AXIS), sums)
            return sums

        f = jax.shard_map(shard_fn, mesh=mesh, in_specs=(P(), P()),
                          out_specs=P(), check_vma=False)
        return f(key, N)

    # One compilation per padded-size bucket (power-of-two number of
    # batches per shard): the sample count N itself is a dynamic argument,
    # so re-solving with different allocations does not recompile.
    cache = {}

    def compiled(key, N: int):
        N = int(N)
        per_shard = -(-N // n_shards)
        n_batches = max(1, -(-per_shard // batch_size))
        n_batches = 1 << (n_batches - 1).bit_length()      # pow2 bucket
        n_pad = n_batches * batch_size
        if n_pad not in cache:
            cache[n_pad] = jax.jit(partial(engine, n_pad=n_pad))
        return cache[n_pad](key, N)

    return compiled


def make_model_fn(sampler_jax: Callable, evaluate_jax: Callable, ls):
    """Compose the user's jax sampler/evaluate overloads into the engine's
    per-sample function for group ``ls``."""
    ls = tuple(int(l) for l in ls)

    def model_fn(key):
        samples = sampler_jax(key, ls)
        out = evaluate_jax(ls, samples)
        return jnp.asarray(out)

    return model_fn


# ----------------------- snapshot-collecting variant ---------------------- #

def make_collect_fn(sampler_jax: Callable, evaluate_jax: Callable, ls):
    """Like make_model_fn but also returns the flattened random inputs, so
    the engine can persist (input, outputs) snapshot pairs."""
    ls = tuple(int(l) for l in ls)

    def fn(key):
        samples = sampler_jax(key, ls)
        out = evaluate_jax(ls, samples)
        flat = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree.leaves(samples)])
        return jnp.asarray(out), flat

    return fn


def _one_sample_collect(fn: Callable, key, max_resample: int):
    """_one_sample keeping the accepted sample's raw inputs alongside."""
    P0, s0 = fn(key)
    ok0 = jnp.all(jnp.isfinite(P0))
    if max_resample == 0:
        return P0, s0, ok0

    def cond(st):
        tries, P, s, ok = st
        return (~ok) & (tries < max_resample)

    def body(st):
        tries, P, s, ok = st
        k2 = jax.random.fold_in(key, tries + 1)
        P2, s2 = fn(k2)
        ok2 = jnp.all(jnp.isfinite(P2))
        return (tries + 1, jnp.where(ok2, P2, P),
                jnp.where(ok2, s2, s), ok2)

    _, P, s, ok = jax.lax.while_loop(cond, body,
                                     (jnp.asarray(0), P0, s0, ok0))
    return P, s, ok


def build_group_collect_engine(collect_fn: Callable, No: int, L: int,
                               batch_size: int = 4096,
                               max_resample: int = 64):
    """Snapshot-collecting sibling of build_group_engine: same sums, but
    every accepted sample's outputs and raw inputs are returned for
    ``samplefile`` persistence (reference blue_fn.py:133-145; the
    factored-model path gets this from KernelEngineV2.sample_sums
    collect=True).  Runs single-device: snapshot streams are host-bound
    anyway, so sharding the collection buys nothing.

    ``collect_fn(key) -> ((No, L[, d]) outputs, (q,) flat inputs)``.
    Returns ``engine(key, N) -> (SampleSums, vals, inputs, valid)`` with
    ``vals (n_pad, No, L[, d])``, ``inputs (n_pad, q)`` and ``valid``
    the (n_pad,) mask of rows that are real (idx < N) and finite."""

    def engine(key, N, n_pad: int):
        n_chunks = n_pad // batch_size

        def chunk(carry, c):
            se, sc, d1, d2, nf = carry
            idx = c * batch_size + jnp.arange(batch_size)
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
            Ps, Ss, oks = jax.vmap(
                lambda k: _one_sample_collect(collect_fn, k,
                                              max_resample))(keys)
            P64 = Ps.astype(jnp.float64)
            P64 = jnp.where(jnp.isfinite(P64), P64, 0.0)  # see group engine
            if P64.ndim == 3:
                P64 = P64[..., None]       # (B, No, L, d)
            w = ((idx < N) & oks).astype(jnp.float64)
            nf = nf + jnp.sum((idx < N) & ~oks)
            se = se + jnp.einsum('bnld,b->nld', P64, w)
            sc = sc + jnp.einsum('bnid,bnjd,b->nij', P64, P64, w)
            D = P64[:, :, :, None, :] - P64[:, :, None, :, :]
            d1 = d1 + jnp.einsum('bnijd,b->nijd', D, w)
            d2 = d2 + jnp.einsum('bnijd,bnijd,b->nij', D, D, w)
            return (se, sc, d1, d2, nf), (Ps, Ss, (idx < N) & oks)

        d = jax.eval_shape(collect_fn, jax.random.key(0))[0].shape
        d = d[2] if len(d) == 3 else 1
        init = (jnp.zeros((No, L, d)), jnp.zeros((No, L, L)),
                jnp.zeros((No, L, L, d)), jnp.zeros((No, L, L)),
                jnp.asarray(0, jnp.int64))
        (se, sc, d1, d2, nf), (vals, inputs, valid) = jax.lax.scan(
            chunk, init, jnp.arange(n_chunks))
        vals = vals.reshape((n_pad,) + vals.shape[2:])
        inputs = inputs.reshape((n_pad,) + inputs.shape[2:])
        return (SampleSums(se, sc, d1, d2, nf), vals, inputs,
                valid.reshape(-1))

    cache = {}

    def compiled(key, N: int):
        N = int(N)
        n_batches = max(1, -(-N // batch_size))
        n_batches = 1 << (n_batches - 1).bit_length()      # pow2 bucket
        n_pad = n_batches * batch_size
        if n_pad not in cache:
            cache[n_pad] = jax.jit(partial(engine, n_pad=n_pad))
        return cache[n_pad](key, N)

    return compiled
