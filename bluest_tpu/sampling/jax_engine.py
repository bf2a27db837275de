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
import numpy as np

from ..parallel.mesh import MODEL_AXIS, SAMPLE_AXIS


class SampleSums(NamedTuple):
    sumse: jnp.ndarray        # (No, L)  sum of outputs
    sumsc: jnp.ndarray        # (No, L, L) sum of pairwise products
    sumsd1: jnp.ndarray       # (No, L, L) sum of differences (i - j)
    sumsd2: jnp.ndarray       # (No, L, L) sum of squared differences
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

    ``model_fn(key) -> (No, L)`` must be jax-traceable.  Returns
    ``engine(key, N) -> SampleSums`` where N is a static int.  The compiled
    engine should be cached by the caller (one per group)."""

    n_shards = 1 if mesh is None else mesh.devices.size

    def shard_sums(key, N, shard_idx, n_pad_per_shard):
        """Sums over this shard's index range [shard_idx*pad, ...)."""
        n_chunks = n_pad_per_shard // batch_size

        def chunk(carry, c):
            se, sc, d1, d2, nf = carry
            base = shard_idx * n_pad_per_shard + c * batch_size
            idx = base + jnp.arange(batch_size)
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
            Ps, oks = jax.vmap(
                lambda k: _one_sample(model_fn, k, max_resample))(keys)
            Ps = Ps.astype(jnp.float64)
            w = ((idx < N) & oks).astype(jnp.float64)
            nf = nf + jnp.sum((idx < N) & ~oks)
            se = se + jnp.einsum('bnl,b->nl', Ps, w)
            sc = sc + jnp.einsum('bni,bnj,b->nij', Ps, Ps, w)
            D = Ps[:, :, :, None] - Ps[:, :, None, :]
            d1 = d1 + jnp.einsum('bnij,b->nij', D, w)
            d2 = d2 + jnp.einsum('bnij,bnij,b->nij', D, D, w)
            return (se, sc, d1, d2, nf), None

        init = (jnp.zeros((No, L)), jnp.zeros((No, L, L)),
                jnp.zeros((No, L, L)), jnp.zeros((No, L, L)),
                jnp.asarray(0, jnp.int64))
        (se, sc, d1, d2, nf), _ = jax.lax.scan(
            chunk, init, jnp.arange(n_chunks))
        return SampleSums(se, sc, d1, d2, nf)

    def engine(key, N, n_pad: int):
        """N is dynamic (appears only in masks); n_pad is static."""
        if mesh is None or n_shards == 1:
            return shard_sums(key, N, 0, n_pad)

        from jax.sharding import PartitionSpec as P

        def shard_fn(key, N):
            i = jax.lax.axis_index(SAMPLE_AXIS)
            sums = shard_sums(key, N, i, n_pad)
            return jax.tree.map(
                lambda x: jax.lax.psum(x, SAMPLE_AXIS), sums)

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


# ------------------------------------------------------------------------ #
# Kernel engine: O(M + K) compilations for the whole problem.
#
# The group engine above compiles one program per coupled group; with
# hundreds of candidate groups and expensive TPU compiles that dominates
# cold-start.  When the user's model factors as
#     theta = sample_input(key)          (model-independent random input)
#     out_l = evaluate_model(l, theta)   (one fidelity at a time)
# -- which is exactly the MLBLUE coupling semantics: every model in a group
# sees the same omega -- we instead compile one batched kernel per MODEL
# plus one sum-combiner per group SIZE, and drive groups from the host by
# chaining cached kernels on device-resident arrays.
# ------------------------------------------------------------------------ #

class KernelEngine:
    """Per-model batched kernels + per-size combiners."""

    def __init__(self, sample_input_fn: Callable, eval_model_fn: Callable,
                 n_models: int, No: int, batch_size: int = 8192,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.No = No
        self.batch = int(batch_size)
        self.mesh = mesh
        self._sharding = None
        model_parallel = (mesh is not None and MODEL_AXIS in mesh.axis_names
                          and mesh.shape[MODEL_AXIS] > 1)
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if model_parallel:
                # theta replicated over 'model', sharded over 'samples'
                self._sharding = NamedSharding(mesh, P(SAMPLE_AXIS))
            else:
                self._sharding = NamedSharding(
                    mesh, P(mesh.axis_names[0]))

        B = self.batch

        @jax.jit
        def theta_kernel(key, base):
            idx = base + jnp.arange(B)
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
            return jax.vmap(sample_input_fn)(keys), idx

        self.theta_kernel = theta_kernel

        if model_parallel:
            # Nested-parallelism path (the reference's nested MPI
            # communicators, blue_models.py:121-130): each model instance
            # spans the 'model' mesh axis and may use collectives over it
            # (psum/ppermute); samples stay data-parallel on 'samples'.
            from jax.sharding import PartitionSpec as P

            def make_kernel(l):
                def batched(th):
                    return jax.vmap(
                        lambda t: jnp.asarray(eval_model_fn(l, t)))(th)

                f = jax.shard_map(
                    batched, mesh=mesh, in_specs=P(SAMPLE_AXIS),
                    out_specs=P(SAMPLE_AXIS), check_vma=False)
                return jax.jit(f)

            self.model_kernels = {l: make_kernel(l)
                                  for l in range(n_models)}
        else:
            self.model_kernels = {
                l: jax.jit(jax.vmap(lambda th, l=l: jnp.asarray(
                    eval_model_fn(l, th)))) for l in range(n_models)}
        self._combiners = {}

    def _combiner(self, k: int):
        """Per-group-size sum reduction.

        Outputs may be scalars per (output, model) -- kernel result
        (B, No) -- or fixed-dimension vectors -- kernel result (B, No, d).
        For vectors the inner product is the dot product (the reference's
        multi_output_example.py:56-57 convention); cross sums sc/d2 are
        scalars, first-moment sums se/d1 keep the vector dimension."""
        if k in self._combiners:
            return self._combiners[k]

        @jax.jit
        def combine(outs, idx, N):
            # outs: (k, B, No) or (k, B, No, d)
            if outs.ndim == 3:
                outs = outs[..., None]
            P = jnp.transpose(outs, (1, 2, 0, 3)).astype(jnp.float64)
            ok = jnp.all(jnp.isfinite(P), axis=(1, 2, 3))
            w = ((idx < N) & ok).astype(jnp.float64)
            nf = jnp.sum((idx < N) & ~ok)
            P = jnp.where(jnp.isfinite(P), P, 0.0)
            se = jnp.einsum('bnld,b->nld', P, w)
            sc = jnp.einsum('bnid,bnjd,b->nij', P, P, w)
            D = P[:, :, :, None, :] - P[:, :, None, :, :]
            d1 = jnp.einsum('bnijd,b->nijd', D, w)
            d2 = jnp.einsum('bnijd,bnijd,b->nij', D, D, w)
            return se, sc, d1, d2, nf

        self._combiners[k] = combine
        return combine

    def precompile(self, models=None, parallel: bool = True,
                   group_sizes=(1, 2, 3, 4)):
        """Warm all kernels and combiners (optionally in parallel threads
        -- XLA releases the GIL during compilation)."""
        import concurrent.futures as cf
        key = jax.random.key(0)
        theta, idx = self.theta_kernel(key, 0)
        models = list(self.model_kernels if models is None else models)
        n_models = len(self.model_kernels)
        sizes = [k for k in group_sizes if k <= n_models]

        def warm_model(l):
            self.model_kernels[l](theta)[0].block_until_ready()

        def warm_combiner(k):
            dummy = jnp.zeros((k, self.batch, self.No))
            jax.block_until_ready(self._combiner(k)(dummy, idx, 1))

        if parallel and len(models) + len(sizes) > 1:
            with cf.ThreadPoolExecutor(max_workers=8) as ex:
                futs = [ex.submit(warm_model, l) for l in models]
                futs += [ex.submit(warm_combiner, k) for k in sizes]
                for f in futs:
                    f.result()
        else:
            for l in models:
                warm_model(l)
            for k in sizes:
                warm_combiner(k)

    def sample_sums(self, ls, key, N: int, collect: bool = False):
        """Accumulate sums over N coupled samples of group ``ls``.

        With ``collect=True`` also returns the raw per-sample outputs
        (N, No, L) and flattened inputs (N, dim) for snapshot persistence
        (reference samplefile, blue_fn.py:133-145)."""
        ls = [int(l) for l in ls]
        k = len(ls)
        combine = self._combiner(k)
        B = self.batch
        n_chunks = -(-int(N) // B)
        acc = None
        vals, thetas = [], []
        for c in range(n_chunks):
            theta, idx = self.theta_kernel(key, c * B)
            if self._sharding is not None:
                # distribute the batch over the sample mesh axis; the model
                # kernels then run partitioned by GSPMD and the combiner's
                # reductions insert the cross-device psum automatically
                theta = jax.device_put(theta, self._sharding)
                idx = jax.device_put(idx, self._sharding)
            outs = jnp.stack([self.model_kernels[l](theta) for l in ls])
            part = combine(outs, idx, N)
            acc = part if acc is None else tuple(
                a + b for a, b in zip(acc, part))
            if collect:
                sel = np.asarray(idx) < N
                o = np.asarray(outs)
                axes = (1, 2, 0) if o.ndim == 3 else (1, 2, 0, 3)
                vals.append(o.transpose(axes)[sel])
                leaves = [np.asarray(x).reshape(B, -1)
                          for x in jax.tree.leaves(theta)]
                thetas.append(np.concatenate(leaves, axis=1)[sel])
        se, sc, d1, d2, nf = acc
        sums = SampleSums(se, sc, d1, d2, nf)
        if collect:
            return sums, np.concatenate(vals), np.concatenate(thetas)
        return sums
