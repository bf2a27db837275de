"""Host-side sampling engine for black-box (non-JAX) models.

Compatibility path preserving the reference blue_fn semantics
(blue_fn.py:36-227) without MPI: batching support probed from the
sampler's signature, resample-on-NaN/Inf, wall-clock cost accumulation,
and npz sample snapshots.  Use the device engine (jax_engine) whenever the
model is jax-traceable -- this path exists so that any Python simulator
(FEniCS-style PDE solvers, legacy codes) keeps working unchanged."""

from __future__ import annotations

import os
from inspect import signature
from time import time
from typing import Callable, List, Optional

import numpy as np


def is_output_finite(Ps):
    """(ok, model_index, output_index) -- reference blue_fn.py:15-29."""
    No = len(Ps)
    L = len(Ps[0])
    for i in range(L):
        for n in range(No):
            check = np.isfinite(Ps[n][i])
            ok = bool(np.all(check))
            if not ok:
                return False, i, n
    return True, None, None


def blue_fn(ls, N, problem, sampler=None, inners=None, comm=None,
            N1: int = 1,
            No: int = 1, verbose: bool = True,
            compute_mlmc_differences: bool = False,
            filename: Optional[str] = None, outputs_to_save=None):
    """Sample the coupled models ``ls`` N times and return sums.

    ``comm`` is accepted for reference API compatibility and ignored
    (distribution happens through the device mesh, not MPI).

    Returns (sumse, sumsc, cost[, sumsd1, sumsd2]):
        sumse[n][i]   = sum of outputs of model ls[i], output n
        sumsc[n][i,j] = sum of inner products
        cost          = problem.cost * N if defined, else wall time
    (reference blue_fn.py:36-227)."""
    L = len(ls)
    cpu_cost = 0.0
    sumse = [[0 for _ in range(L)] for _ in range(No)]
    sumsc = [np.zeros((L, L)) for _ in range(No)]
    if compute_mlmc_differences:
        sumsd1 = [[[0 for _ in range(L)] for _ in range(L)] for _ in range(No)]
        sumsd2 = [[[0 for _ in range(L)] for _ in range(L)] for _ in range(No)]

    if inners is None:
        inners = [lambda a, b: a * b for _ in range(No)]

    if sampler is None:
        rng = np.random.RandomState(1)

        def sampler(ls, N=1):
            sample = rng.randn(N) if N > 1 else float(rng.randn())
            return [sample for _ in range(L)]

    if filename is not None:
        ext = "." + filename.split(".")[-1]
        basename = ".".join(filename.split(".")[:-1]) + "".join(
            str(l) for l in ls)
        filename = basename + ext
        outdict = {"values_%d_%d" % (n, i): [] for n in range(No)
                   for i in range(L)}
        outdict.update({"inputs_%d" % i: [] for i in range(L)})
        if outputs_to_save is None:
            outputs_to_save = list(range(No))

    nobatch = len(signature(sampler).parameters) == 1
    if nobatch:
        N1 = 1

    it = 1
    while it <= N:
        N2 = min(N1, N - it + 1)

        finite = False
        while not finite:
            samples = sampler(ls) if nobatch else sampler(ls, N2)
            start = time()
            Ps = problem.evaluate(ls, samples)
            end = time()
            finite, model_n, output_n = is_output_finite(Ps)
            if not finite and verbose:
                print("Warning! evaluation returned non-finite value for "
                      "model %s output %s; resampling." % (model_n, output_n),
                      flush=True)

        cpu_cost += end - start

        if filename is not None:
            for n in range(No):
                if n in outputs_to_save:
                    for i in range(L):
                        if N1 == 1:
                            outdict["values_%d_%d" % (n, i)].append(Ps[n][i])
                            outdict["inputs_%d" % i].append(samples[i])
                        else:
                            for n2 in range(N2):
                                outdict["values_%d_%d" % (n, i)].append(
                                    Ps[n][i][n2])
                                outdict["inputs_%d" % i].append(samples[i][n2])

        if compute_mlmc_differences:
            for n in range(No):
                for i in range(L):
                    for j in range(i + 1, L):
                        if N1 == 1:
                            d = Ps[n][i] - Ps[n][j]
                            sumsd1[n][i][j] += d
                            sumsd2[n][i][j] += inners[n](d, d)
                        else:
                            for n2 in range(N2):
                                d = Ps[n][i][n2] - Ps[n][j][n2]
                                sumsd1[n][i][j] += d
                                sumsd2[n][i][j] += inners[n](d, d)

        for n in range(No):
            if N1 == 1:
                for i in range(L):
                    sumse[n][i] += Ps[n][i]
                sumsc[n] += np.array([[inners[n](Ps[n][i], Ps[n][j])
                                       for i in range(L)] for j in range(L)])
            else:
                for i in range(L):
                    sumse[n][i] += sum(Ps[n][i])
                sumsc[n] += np.array(
                    [[sum(inners[n](Ps[n][i][n2], Ps[n][j][n2])
                          for n2 in range(N2))
                      for i in range(L)] for j in range(L)])
        it += N2

    cost = N * problem.cost if hasattr(problem, "cost") else cpu_cost

    if filename is not None:
        outdict["models"] = np.array([list(ls)])
        outdict["n_samples"] = np.array([N])
        outdict["n_outputs"] = np.array([No])
        if os.path.isfile(filename):
            old = dict(np.load(filename, allow_pickle=True))
            old = {k: [item for item in v] for k, v in old.items()}
            assert list(old["models"][0]) == list(ls)
            for key in old:
                if "values" in key or "inputs" in key:
                    old[key] += outdict[key]
            old["n_samples"][0] += N
            old["models"] = np.array([list(ls)])
            old["n_outputs"] = np.array([No])
            outdict = old
        np.savez_compressed(filename, **outdict)

    if compute_mlmc_differences:
        return sumse, sumsc, cost, sumsd1, sumsd2
    return sumse, sumsc, cost


# --------------------------------------------------------------------- #
# Parallel host sampling: restores the reference's `mpiexec -n P` sampling
# throughput for black-box models on a single node with a process pool
# (static split of N plus remainder, exactly blue_fn.py:106-110; partial
# sums merged like the allreduce at blue_fn.py:179-187).
# --------------------------------------------------------------------- #

def _worker_chunk(args):
    problem, ls, n, worker_id, No, compute_diffs = args
    if hasattr(problem, "set_worker_id"):
        problem.set_worker_id(worker_id)  # per-rank RNG hook
    return blue_fn(ls, n, problem, sampler=problem.sampler,
                   inners=problem.get_models_inner_products(),
                   No=No, verbose=False,
                   compute_mlmc_differences=compute_diffs)


def blue_fn_parallel(ls, N, problem, n_workers: int, No: int = 1,
                     compute_mlmc_differences: bool = False):
    """Process-pool variant of blue_fn for picklable black-box problems.

    The user's sampler must be seeded per worker: override
    ``set_worker_id(self, wid)`` to reseed (the reference's per-rank RNG
    discipline, tutorials/01_tutorial.py:154-167).  Snapshot files are not
    supported on this path.
    """
    import multiprocessing as mp

    NN = [N // n_workers] * n_workers
    for i in range(N % n_workers):
        NN[i] += 1
    jobs = [(problem, ls, n, wid, No, compute_mlmc_differences)
            for wid, n in enumerate(NN) if n > 0]
    ctx = mp.get_context("spawn")
    with ctx.Pool(processes=len(jobs)) as pool:
        results = pool.map(_worker_chunk, jobs)

    out = list(results[0])
    for r in results[1:]:
        for n in range(No):
            for i in range(len(ls)):
                out[0][n][i] += r[0][n][i]
            out[1][n] = out[1][n] + r[1][n]
            if compute_mlmc_differences:
                for i in range(len(ls)):
                    for j in range(i + 1, len(ls)):
                        out[3][n][i][j] += r[3][n][i][j]
                        out[4][n][i][j] += r[4][n][i][j]
        out[2] += r[2]
    return tuple(out)
