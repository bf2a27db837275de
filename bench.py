#!/usr/bin/env python
"""bluest_tpu benchmark: the BASELINE.json north-star configuration.

Ten-model, three-output MLBLUE on the stochastic diffusion hierarchy:
all couplings up to K=4 (L = 385 groups), allocation solved by the
JAX-native interior-point SDP, then an estimation run sized to ~1e6
coupled model evaluations through the vmapped/sharded sampling engine.

vs_baseline compares against the reference's architecture class on the
same machine: a per-sample Python loop with scipy banded solves (how a
croci/bluest user would evaluate this model hierarchy, blue_fn.py:115-167)
for the sampling phase, and the scipy trust-constr NLP path for the
allocation phase (the reference's non-SDP solver, sap.py:387-418).
The baseline sampling loop is measured on a subset and extrapolated
linearly.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
"""

import json
import sys
import time

import numpy as np


GRIDS = (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2)
N_KL = 32
SIGMA = 1.0
NU = 0.6
K = 4
TARGET_SAMPLES = 1_000_000
PILOT = 4096
BASELINE_SAMPLE_CAP = 2000


def build_problem(verbose=False):
    import jax.numpy as jnp
    from bluest_tpu.models.diffusion import DiffusionProblem
    # model solves in f32 (QoI error ~1e-8 relative, far below MC noise;
    # estimator sums accumulate in f64) -- 2x on TPU over emulated f64
    return DiffusionProblem(grids=GRIDS, n_kl=N_KL, sigma=SIGMA, nu=NU,
                            multi_output=True, verbose=verbose,
                            covariance_estimation_samples=PILOT,
                            device_batch_size=16384, dtype=jnp.float32)


def total_evaluations(problem):
    out = problem.MOSAP_output
    return int(sum(int(n) * len(g) for g, n in
                   zip(out["flattened_groups"], out["samples"])))


def total_samples(problem):
    return int(np.sum(problem.MOSAP_output["samples"]))


def run_bluest_tpu(problem, budget0=2.0e4):
    """Returns (alloc_seconds, sample_seconds, n_evals, mus, errs)."""
    t0 = time.time()
    problem.setup_solver(K=K, budget=budget0)
    # rescale the budget so the estimation phase draws ~TARGET_SAMPLES
    # (the allocation ray is homogeneous in the budget; one correction
    # pass absorbs integer-rounding nonlinearity)
    budget = budget0
    for _ in range(3):
        n0 = total_samples(problem)
        if 0.85 <= n0 / TARGET_SAMPLES <= 1.15:
            break
        budget = budget * TARGET_SAMPLES / max(n0, 1)
        problem.setup_solver(K=K, budget=budget)
    alloc_s = time.time() - t0

    t0 = time.time()
    mus, errs, cost = problem.solve(K=K, budget=budget)
    sample_s = time.time() - t0
    return alloc_s, sample_s, total_evaluations(problem), mus, errs


def numpy_model_eval(ls, xi):
    """Reference-architecture model evaluation: per-sample scipy banded
    solves (one per fidelity in the coupled group)."""
    from scipy.linalg import solve_banded
    outs = []
    for l in ls:
        n = GRIDS[l]
        h = 1.0 / n
        xf = (np.arange(n) + 0.5) * h
        k = np.arange(1, N_KL + 1)
        ck = SIGMA * k ** (-NU) * np.sqrt(2.0)
        xi_l = xi * (np.arange(N_KL) < max(1, n // 4))
        a = np.exp(np.sin(np.pi * xf[:, None] * k[None, :]) @ (ck * xi_l))
        am, ap = a[:-1], a[1:]
        ab = np.zeros((3, n - 1))
        ab[0, 1:] = -ap[:-1] / h ** 2
        ab[1] = (am + ap) / h ** 2
        ab[2, :-1] = -am[1:] / h ** 2
        u = solve_banded((1, 1), ab, np.ones(n - 1))
        outs.append([h * np.sum(u),
                     np.concatenate([[0.0], u, [0.0]])[n // 2],
                     h * np.sum(a * (np.diff(np.concatenate(
                         [[0.0], u, [0.0]])) / h) ** 2)])
    return np.array(outs).T  # (3, L)


def run_baseline_sampling(problem, n_evals_target):
    """Deterministic extrapolation: time each model's scipy solve on a
    fixed sample count, then price the exact allocation workload."""
    rng = np.random.default_rng(0)
    reps = max(10, BASELINE_SAMPLE_CAP // len(GRIDS))
    t_model = []
    for l in range(len(GRIDS)):
        xis = rng.standard_normal((reps, N_KL))
        t0 = time.time()
        for r in range(reps):
            numpy_model_eval((l,), xis[r])
        t_model.append((time.time() - t0) / reps)
    out = problem.MOSAP_output
    total = 0.0
    for g, n in zip(out["flattened_groups"], out["samples"]):
        total += int(n) * sum(t_model[l] for l in g)
    return total


def run_baseline_allocation(problem):
    t0 = time.time()
    m = problem.MOSAP.scipy_solve(budget=problem.MOSAP.budget)
    elapsed = time.time() - t0
    return elapsed, m


def main():
    quick = "--quick" in sys.argv
    global GRIDS, TARGET_SAMPLES, PILOT, BASELINE_SAMPLE_CAP
    if quick:
        GRIDS = (64, 32, 16, 8)
        TARGET_SAMPLES = 50_000
        PILOT = 512
        BASELINE_SAMPLE_CAP = 200

    problem = build_problem()
    alloc_s, sample_s, n_evals, mus, errs = run_bluest_tpu(problem)
    n_samples = total_samples(problem)
    ours = alloc_s + sample_s

    base_alloc_s, _ = run_baseline_allocation(problem)
    base_sample_s = run_baseline_sampling(problem, n_evals)
    baseline = base_alloc_s + base_sample_s

    result = {
        "metric": "mosap_alloc_plus_%.0esample_estimation_wall" % TARGET_SAMPLES,
        "value": round(ours, 3),
        "unit": "s",
        "vs_baseline": round(baseline / ours, 2),
        "detail": {
            "alloc_s": round(alloc_s, 3),
            "sample_s": round(sample_s, 3),
            "n_model_evals": n_evals,
            "n_samples": n_samples,
            "evals_per_s": round(n_evals / max(sample_s, 1e-9)),
            "baseline_alloc_s": round(base_alloc_s, 3),
            "baseline_sample_s_extrapolated": round(base_sample_s, 3),
            "max_rel_err": float(np.max(errs) / abs(mus[0])),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
