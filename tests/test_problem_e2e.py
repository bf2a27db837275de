"""End-to-end BLUEProblem tests on the tutorial's analytic hierarchy
(reference tutorials/01_tutorial.py): estimate E[e^Z], Z ~ N(0,1), with
models = truncated exponential series.  Exercises pilot covariance
estimation, SPD projection, MC/MLMC/MFMC/MLBLUE setup+solve in both eps
and budget modes, user groups, save/load, and the statistical
variance_test -- on the host engine (black-box path) and the device
engine (jax path), single- and multi-output."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bluest_tpu import BLUEProblem, BLUESTError

N_MODELS = 5
TRUE_MEAN = np.exp(0.5)  # E[e^Z]


def exp_series_np(x, n_terms):
    ii = np.arange(n_terms + 1)
    from scipy.special import gamma
    return np.sum(x ** ii / gamma(ii + 1))


class HostProblem(BLUEProblem):
    """Black-box path (reference tutorial MyProblem)."""

    def __init__(self, *args, **kwargs):
        self._rng = np.random.default_rng(kwargs.pop("sampler_seed", 0))
        super().__init__(*args, **kwargs)

    def sampler(self, ls, N=1):
        Z = float(self._rng.standard_normal())
        return [Z for _ in ls]

    def evaluate(self, ls, samples, N=1):
        out = [0.0] * len(ls)
        for i, l in enumerate(ls):
            if l == 0:
                out[i] = np.exp(samples[i])
            else:
                out[i] = exp_series_np(samples[i], N_MODELS - l)
        return [out]


class JaxProblem(BLUEProblem):
    """Device path: same hierarchy as a pure-jax model."""

    def sampler_jax(self, key, ls):
        z = jax.random.normal(key)
        return jnp.full((len(ls),), z)

    def evaluate_jax(self, ls, samples):
        outs = []
        for i, l in enumerate(ls):
            x = samples[i]
            if l == 0:
                outs.append(jnp.exp(x))
            else:
                n_terms = N_MODELS - l
                ii = jnp.arange(n_terms + 1, dtype=jnp.float64)
                fact = jnp.exp(jax.lax.lgamma(ii + 1.0))
                outs.append(jnp.sum(x ** ii / fact))
        return jnp.stack(outs)[None, :]  # (n_outputs=1, L)


COSTS = np.array([2.0 ** (N_MODELS - i) for i in range(N_MODELS)])


@pytest.fixture(scope="module")
def jax_problem():
    return JaxProblem(N_MODELS, costs=COSTS,
                      covariance_estimation_samples=4096, verbose=False)


def test_host_problem_pipeline():
    p = HostProblem(N_MODELS, costs=COSTS, covariance_estimation_samples=64,
                    verbose=False)
    C = p.get_covariance()
    assert C.shape == (N_MODELS, N_MODELS)
    assert np.all(np.isfinite(np.diag(C)))
    rho = p.get_correlation()
    assert abs(rho[0, 1]) > 0.9  # close models are highly correlated

    eps = 0.1 * np.sqrt(C[0, 0])
    mu_mc, err_mc, cost_mc = p.solve_mc(eps=eps)
    assert abs(mu_mc[0] - TRUE_MEAN) < 5 * max(err_mc[0], 0.2)

    data = p.setup_mlmc(eps=eps)
    mu, errs, cost = p.solve_mlmc(eps=eps, mlmc_data=data)
    assert data["models"][0] == 0
    assert cost <= cost_mc  # multilevel no worse than MC

    data = p.setup_mfmc(eps=eps)
    mu, errs, cost = p.solve_mfmc(eps=eps, mfmc_data=data)
    assert data["models"][0] == 0

    blue = p.setup_solver(K=3, eps=eps)
    mu, errs, cost = p.solve(K=3, eps=eps)
    assert cost <= cost_mc * 1.01
    assert abs(mu[0] - TRUE_MEAN) < 6 * max(errs[0], 0.05)


def test_jax_problem_covariance_estimation(jax_problem):
    """Pilot estimation on device must recover the analytic covariance."""
    p = jax_problem
    C = p.get_covariance()
    # analytic: Var[e^Z] = e^2 - e
    assert abs(C[0, 0] - (np.e ** 2 - np.e)) < 0.5
    rho = p.get_correlation()
    assert rho[0, 1] > 0.95


def test_jax_problem_blue(jax_problem):
    p = jax_problem
    C = p.get_covariance()
    eps = 0.02 * np.sqrt(C[0, 0])
    blue = p.setup_solver(K=3, eps=eps)
    mu, errs, cost = p.solve(K=3, eps=eps)
    assert abs(mu[0] - TRUE_MEAN) < 6 * max(max(errs), 0.02)
    # MLBLUE beats single-fidelity MC in cost
    n_mc = C[0, 0] / eps ** 2
    assert cost < n_mc * COSTS[0]


def test_jax_problem_budget_mode(jax_problem):
    p = jax_problem
    budget = 200 * max(COSTS)
    blue = p.setup_solver(K=3, budget=budget)
    assert blue["total_cost"] <= budget * 1.0002
    mu, errs, cost = p.solve(K=3, budget=budget)
    assert np.isfinite(mu[0])


def test_jax_mlmc_mfmc(jax_problem):
    p = jax_problem
    C = p.get_covariance()
    eps = 0.05 * np.sqrt(C[0, 0])
    mlmc = p.setup_mlmc(eps=eps)
    mu, errs, cost = p.solve_mlmc(eps=eps, mlmc_data=mlmc)
    assert abs(mu[0] - TRUE_MEAN) < 8 * max(max(errs), 0.05)
    mfmc = p.setup_mfmc(eps=eps)
    mu, errs, cost = p.solve_mfmc(eps=eps, mfmc_data=mfmc)
    assert abs(mu[0] - TRUE_MEAN) < 8 * max(max(errs), 0.05)


def test_user_groups(jax_problem):
    p = jax_problem
    C = p.get_covariance()
    eps = 0.05 * np.sqrt(C[0, 0])
    groups = [[0], [1], [0, 3], [3, 4], [0, 1, 2]]
    blue = p.setup_solver(groups=groups, eps=eps)
    for g in blue["models"]:
        assert g in groups


def test_save_load_roundtrip(tmp_path, jax_problem):
    p = jax_problem
    f = str(tmp_path / "graph.npz")
    p.save_graph_data(f)
    p2 = JaxProblem(N_MODELS, datafile=f, verbose=False)
    np.testing.assert_allclose(p2.get_covariance(), p.get_covariance(),
                               rtol=1e-12, equal_nan=True)
    np.testing.assert_allclose(p2.get_costs(), p.get_costs())
    # costs overridable on load
    p3 = JaxProblem(N_MODELS, costs=2 * COSTS, datafile=f, verbose=False)
    np.testing.assert_allclose(p3.get_costs(), 2 * COSTS)


def test_known_covariance_skips_sampling():
    rng = np.random.default_rng(5)
    A = rng.standard_normal((N_MODELS, N_MODELS))
    C = A @ A.T + N_MODELS * np.eye(N_MODELS)

    class NoSampler(BLUEProblem):
        pass  # evaluate/sampler never called when C and costs known

    p = NoSampler(N_MODELS, C=C.copy(), costs=COSTS, verbose=False)
    np.testing.assert_allclose(p.get_covariance(), C, rtol=1e-7, atol=1e-9)


def test_uncoupled_entries_respected():
    rng = np.random.default_rng(6)
    A = rng.standard_normal((N_MODELS, N_MODELS))
    C = A @ A.T + N_MODELS * np.eye(N_MODELS)
    C[0, 1] = C[1, 0] = np.inf  # never couple models 0,1
    p = JaxProblem(N_MODELS, C=C.copy(), costs=COSTS, verbose=False)
    out = p.get_covariance()
    assert np.isnan(out[0, 1])
    blue = p.setup_solver(K=3, budget=100 * max(COSTS))
    for g in blue["models"]:
        assert not (0 in g and 1 in g)


def test_variance_test_statistical(jax_problem):
    """The gold-standard check (reference blue_models.py:944-978):
    empirical estimator std must match the predicted error."""
    p = jax_problem
    C = p.get_covariance()
    eps = 0.05 * np.sqrt(C[0, 0])
    err_ex, err = p.variance_test(eps=eps, K=3, N=40)
    # 40 repetitions: expect agreement within ~2.5x (chi-square spread)
    assert err[0] < 2.5 * err_ex[0]
    assert err[0] > err_ex[0] / 2.5


def test_multi_output_jax():
    class MultiJax(BLUEProblem):
        def sampler_jax(self, key, ls):
            z = jax.random.normal(key)
            return jnp.full((len(ls),), z)

        def evaluate_jax(self, ls, samples):
            row0, row1 = [], []
            for i, l in enumerate(ls):
                x = samples[i]
                if l == 0:
                    v = jnp.exp(x)
                else:
                    n_terms = N_MODELS - l
                    ii = jnp.arange(n_terms + 1, dtype=jnp.float64)
                    fact = jnp.exp(jax.lax.lgamma(ii + 1.0))
                    v = jnp.sum(x ** ii / fact)
                row0.append(v)
                row1.append(v ** 2)
            return jnp.stack([jnp.stack(row0), jnp.stack(row1)])

    p = MultiJax(N_MODELS, n_outputs=2, costs=COSTS,
                 covariance_estimation_samples=4096, verbose=False)
    C0, C1 = p.get_covariances()
    assert np.isfinite(C0).all() or np.isnan(C0).sum() < C0.size
    eps = [0.05 * np.sqrt(C0[0, 0]), 0.05 * np.sqrt(C1[0, 0])]
    blue = p.setup_solver(K=3, eps=eps)
    mu, errs, cost = p.solve(K=3, eps=eps)
    assert len(mu) == 2
    assert abs(mu[0] - TRUE_MEAN) < 8 * max(errs[0], 0.05)
    # E[e^2Z] = e^2
    assert abs(mu[1] - np.exp(2.0)) < 8 * max(errs[1], 0.4)


def test_device_samplefile_snapshots(tmp_path):
    """Device-engine snapshot persistence in the reference npz format
    (reference blue_fn.py:97-104, 189-222)."""
    from bluest_tpu.models.analytic import ExpSeriesProblem

    f = str(tmp_path / "snaps.npz")
    p = ExpSeriesProblem(3, C=np.eye(3) + 0.5, costs=np.array([4.0, 2, 1]),
                         samplefile=f, verbose=False)
    sums, _, _ = p.blue_fn([0, 2], 100, verbose=False)
    fname = str(tmp_path / "snaps02.npz")
    d = dict(np.load(fname, allow_pickle=True))
    assert int(d["n_samples"][0]) == 100
    assert list(d["models"][0]) == [0, 2]
    v = np.asarray(d["values_0_0"])
    assert v.shape[0] == 100
    # snapshot sums must reproduce the engine's sums
    np.testing.assert_allclose(v.sum(), sums[0][0], rtol=1e-12)
    # appending accumulates
    p.blue_fn([0, 2], 50, verbose=False)
    d = dict(np.load(fname, allow_pickle=True))
    assert int(np.asarray(d["n_samples"]).ravel()[0]) == 150
    assert len(d["values_0_0"]) == 150


def test_group_engine_samplefile_snapshots(tmp_path):
    """samplefile on the NON-factored JAX path (sampler_jax/evaluate_jax
    overrides -> group engine): silently dropped through round 2
    (VERDICT r2 item 3); must now stream reference-format snapshots with
    the raw inputs (reference blue_fn.py:133-145)."""
    class GJ(BLUEProblem):
        def sampler_jax(self, key, ls):
            z = jax.random.normal(key)
            return jnp.full((len(ls),), z)

        def evaluate_jax(self, ls, samples):
            return jnp.stack([samples[i] * (1.0 + l)
                              for i, l in enumerate(ls)])[None, :]

    f = str(tmp_path / "gsnaps.npz")
    p = GJ(3, C=np.eye(3) + 0.5, costs=np.array([4.0, 2.0, 1.0]),
           samplefile=f, verbose=False)
    sums, _, _ = p.blue_fn([0, 2], 100, verbose=False)
    fname = str(tmp_path / "gsnaps02.npz")
    d = dict(np.load(fname, allow_pickle=True))
    assert int(d["n_samples"][0]) == 100
    assert list(d["models"][0]) == [0, 2]
    v = np.asarray(d["values_0_0"])
    assert v.shape[0] == 100
    # snapshot sums must reproduce the engine's sums
    np.testing.assert_allclose(v.sum(), sums[0][0], rtol=1e-12)
    # raw inputs are persisted per model slot (the group shares them)
    ins = np.asarray(d["inputs_0"])
    assert ins.shape[0] == 100
    # outputs are input * (1 + l): cross-check value/input pairing
    np.testing.assert_allclose(np.asarray(d["values_0_1"]),
                               3.0 * ins[:, 1], rtol=1e-12)
    # appending accumulates
    p.blue_fn([0, 2], 50, verbose=False)
    d = dict(np.load(fname, allow_pickle=True))
    assert int(np.asarray(d["n_samples"]).ravel()[0]) == 150
    assert len(d["values_0_0"]) == 150


def test_vector_outputs_device():
    """Array-valued QoIs on the device engine: dot-product inner products
    (reference multi_output_example.py:56-57)."""
    D = 4

    class VecProblem(BLUEProblem):
        def sample_input_jax(self, key):
            return jax.random.normal(key)

        def evaluate_model_jax(self, l, z):
            base = jnp.sin(z + jnp.arange(D, dtype=jnp.float64))
            return (base / (1.0 + 0.1 * l))[None, :]   # (No=1, D)

        def get_models_inner_products(self):
            return [lambda a, b: np.dot(a, b) for _ in range(1)]

    p = VecProblem(3, costs=np.array([4.0, 2.0, 1.0]),
                   covariance_estimation_samples=2048, verbose=False)
    C = p.get_covariance()
    assert np.all(np.isfinite(np.diag(C)))
    assert C[0, 0] > 0
    eps = 0.05 * np.sqrt(C[0, 0])
    blue = p.setup_solver(K=2, eps=eps)
    mus, errs, cost = p.solve(K=2, eps=eps)
    mu = np.asarray(mus[0])
    assert mu.shape == (D,)
    # E[sin(Z + j)] = sin(j) * exp(-1/2)
    ref = np.sin(np.arange(D)) * np.exp(-0.5)
    np.testing.assert_allclose(mu, ref, atol=6 * max(errs[0], 0.05))


class ParProblem(BLUEProblem):
    """Module-level so worker processes can unpickle it."""

    def set_worker_id(self, wid):
        self._rng = np.random.default_rng(1000 + wid)

    def sampler(self, ls, N=1):
        if not hasattr(self, "_rng"):
            self._rng = np.random.default_rng(0)
        z = float(self._rng.standard_normal())
        return [z for _ in ls]

    def evaluate(self, ls, samples, N=1):
        return [[np.exp(samples[i]) / (l + 1.0)
                 for i, l in enumerate(ls)]]


def test_host_parallel_sampling():
    """Process-pool sampling for black-box models (replaces the
    reference's mpiexec split, blue_fn.py:106-110)."""
    C = np.eye(3) + 0.5
    p = ParProblem(3, C=C.copy(), costs=np.array([4.0, 2.0, 1.0]),
                   host_workers=4, verbose=False)
    sumse, sumsc, cost = p.blue_fn([0, 1, 2], 4000, verbose=False)
    mu = sumse[0][0] / 4000
    assert abs(mu - np.exp(0.5)) < 0.2
    # cross sums consistent with outputs
    assert sumsc[0][0, 0] > 0


def test_vector_outputs_group_engine():
    """Array-valued QoIs through the per-group engine (sampler_jax /
    evaluate_jax overloads, i.e. a non-factorable model): the engine must
    apply the dot-product inner convention (reference blue_fn.py:159-167)."""
    D = 4

    class VecGroupProblem(BLUEProblem):
        def sampler_jax(self, key, ls):
            z = jax.random.normal(key)
            return [z for _ in ls]

        def evaluate_jax(self, ls, samples):
            return jnp.stack([
                jnp.stack([jnp.sin(samples[i] + jnp.arange(D, dtype=jnp.float64))
                           / (1.0 + 0.1 * l) for i, l in enumerate(ls)])
            ])  # (No=1, L, D)

        def get_models_inner_products(self):
            return [lambda a, b: np.dot(a, b)]

    p = VecGroupProblem(3, costs=np.array([4.0, 2.0, 1.0]),
                        covariance_estimation_samples=2048, verbose=False)
    C = p.get_covariance()
    assert np.all(np.isfinite(np.diag(C))) and C[0, 0] > 0
    eps = 0.05 * np.sqrt(C[0, 0])
    p.setup_solver(K=2, eps=eps)
    mus, errs, cost = p.solve(K=2, eps=eps)
    mu = np.asarray(mus[0])
    assert mu.shape == (D,)
    ref = np.sin(np.arange(D)) * np.exp(-0.5)
    np.testing.assert_allclose(mu, ref, atol=6 * max(errs[0], 0.05))


def test_parallel_host_requires_worker_seeding():
    """blue_fn_parallel must refuse problems without set_worker_id: every
    worker would otherwise draw the same sample stream."""
    from bluest_tpu.sampling.host_engine import blue_fn_parallel

    class NoSeed(BLUEProblem):
        def sampler(self, ls, N=1):
            return [0.0 for _ in ls]

        def evaluate(self, ls, samples, N=1):
            return [[1.0 for _ in ls]]

    p = NoSeed(2, C=np.array([[1.0, 0.5], [0.5, 1.0]]),
               costs=np.array([2.0, 1.0]), verbose=False)
    with pytest.raises(ValueError, match="set_worker_id"):
        blue_fn_parallel([0, 1], 16, p, n_workers=2)


class NestedParProblem(BLUEProblem):
    """Internally-parallel black-box model (module-level so worker
    processes can unpickle it): evaluate() partitions a mode sum across
    the ranks of its model group and combines with comm.allreduce --
    the reference's nested-MPI pattern (blue_models.py:121-130,
    restrictions_matern.py:19-37)."""

    def set_worker_id(self, wid):
        self._rng = np.random.default_rng(7000 + wid)

    def sampler(self, ls, N=1):
        if not hasattr(self, "_rng"):
            self._rng = np.random.default_rng(0)
        z = float(self._rng.standard_normal())
        return [z for _ in ls]

    def evaluate(self, ls, samples, N=1):
        comm = self.get_comm()
        rank = comm.rank if comm is not None else 0
        size = comm.size if comm is not None else 1
        out = []
        for i, l in enumerate(ls):
            partial = sum(np.cos(samples[i] + k) / (k + 1.0)
                          for k in range(rank, 10, size)) / (l + 1.0)
            total = comm.allreduce(partial) if comm is not None else partial
            out.append(total)
        return [out]


def test_nested_model_parallelism_hostcomm():
    """model_workers > 1: every rank of a model group runs the same
    sample stream and evaluate() coordinates through get_comm(); the
    result must equal the single-process-per-model run on the identical
    streams."""
    C = np.eye(2) + 0.5
    costs = np.array([2.0, 1.0])
    p1 = NestedParProblem(2, C=C.copy(), costs=costs.copy(),
                          host_workers=2, model_workers=1, verbose=False)
    s1, c1, _ = p1.blue_fn([0, 1], 64, verbose=False)
    p2 = NestedParProblem(2, C=C.copy(), costs=costs.copy(),
                          host_workers=2, model_workers=2, verbose=False)
    s2, c2, _ = p2.blue_fn([0, 1], 64, verbose=False)
    np.testing.assert_allclose(np.asarray(s1, float),
                               np.asarray(s2, float), rtol=1e-12)
    np.testing.assert_allclose(c1[0], c2[0], rtol=1e-12)


def test_parallel_host_snapshots(tmp_path):
    """Sample snapshots under the process pool: per-worker npz files
    merged into the target, the reference's per-rank write + rank-0
    merge (blue_fn.py:189-222)."""
    C = np.eye(2) + 0.5
    costs = np.array([2.0, 1.0])
    p = ParProblem(2, C=C.copy(), costs=costs.copy(),
                   host_workers=3, verbose=False,
                   samplefile=str(tmp_path / "snap.npz"))
    N = 25
    sumse, sumsc, _ = p.blue_fn([0, 1], N, verbose=False)
    from bluest_tpu.sampling.snapshots import snapshot_filename
    fname = snapshot_filename(str(tmp_path / "snap.npz"), [0, 1])
    d = dict(np.load(fname, allow_pickle=True))
    assert int(np.asarray(d["n_samples"]).ravel()[0]) == N
    vals = np.asarray([float(v) for v in d["values_0_0"]])
    assert vals.shape == (N,)
    # snapshot values reproduce the accumulated sums exactly
    np.testing.assert_allclose(vals.sum(), sumse[0][0], rtol=1e-12)
    # no stray per-worker files left behind
    leftovers = [f for f in os.listdir(tmp_path) if ".w" in f]
    assert leftovers == []
    # appending a second run grows the same file
    p.blue_fn([0, 1], 10, verbose=False)
    d2 = dict(np.load(fname, allow_pickle=True))
    assert int(np.asarray(d2["n_samples"]).ravel()[0]) == N + 10


class CrashRank1Problem(NestedParProblem):
    """Module-level: raises only on rank 1 of each model group."""

    def evaluate(self, ls, samples, N=1):
        comm = self.get_comm()
        if comm is not None and comm.rank == 1:
            raise RuntimeError("injected rank-1 failure")
        return super().evaluate(ls, samples, N)


def test_nested_parallel_detects_dead_member():
    """A crash on a non-rank-0 group member must surface as an error,
    not deadlock rank 0's collectives and the parent's result wait."""
    C = np.eye(2) + 0.5
    p = CrashRank1Problem(2, C=C.copy(), costs=np.array([2.0, 1.0]),
                          host_workers=1, model_workers=2, verbose=False)
    with pytest.raises(RuntimeError, match="died|injected"):
        p.blue_fn([0, 1], 8, verbose=False)


def test_vector_outputs_mlmc_mfmc():
    """Array-valued QoIs through the MLMC/MFMC solve paths (the
    reference supports array outputs everywhere, blue_fn.py:159-167)."""
    D = 3

    class VecMLProblem(BLUEProblem):
        def sampler_jax(self, key, ls):
            z = jax.random.normal(key)
            return [z for _ in ls]

        def evaluate_jax(self, ls, samples):
            return jnp.stack([
                jnp.stack([jnp.sin(samples[i] + jnp.arange(D, dtype=jnp.float64))
                           * (1.0 + 0.02 * l) for i, l in enumerate(ls)])
            ])  # (No=1, L, D)

        def get_models_inner_products(self):
            return [lambda a, b: np.dot(a, b)]

    p = VecMLProblem(3, costs=np.array([9.0, 3.0, 1.0]),
                     covariance_estimation_samples=1024, verbose=False)
    eps = 0.1 * np.sqrt(p.get_covariance()[0, 0])
    ref = np.sin(np.arange(D)) * np.exp(-0.5)

    mus, errs, _ = p.solve_mlmc(eps=eps)
    mu = np.asarray(mus[0])
    assert mu.shape == (D,)
    np.testing.assert_allclose(mu, ref, atol=8 * max(float(errs[0]), 0.05))

    mus2, errs2, _ = p.solve_mfmc(eps=eps)
    mu2 = np.asarray(mus2[0])
    assert mu2.shape == (D,)
    np.testing.assert_allclose(mu2, ref, atol=8 * max(float(errs2[0]), 0.05))


def test_samplefile_consistent_under_failures(tmp_path):
    """Non-finite model outputs: the snapshot stream must cover exactly
    the samples the estimator sums cover -- first pass minus failures,
    plus the top-up rounds' contributions (round-3 review finding: the
    top-up batches were sampled into the sums but never snapshotted)."""
    class Flaky(BLUEProblem):
        def sample_input_jax(self, key):
            return jax.random.normal(key)

        def evaluate_model_jax(self, l, z):
            # ~10% of samples non-finite on model 0, deterministic in z
            bad = jnp.where(jnp.abs(z) > 1.6449, jnp.nan, 0.0)  # P~0.10
            v = z + (bad if l == 0 else 0.0)
            return (v * (1.0 + l))[None]

    f = str(tmp_path / "flaky.npz")
    p = Flaky(2, C=np.eye(2) + 0.5, costs=np.array([2.0, 1.0]),
              samplefile=f, max_resample=0, verbose=False)
    sums, _, _ = p.blue_fn([0, 1], 400, verbose=False)
    d = dict(np.load(str(tmp_path / "flaky01.npz"), allow_pickle=True))
    n_rows = int(np.asarray(d["n_samples"]).ravel()[0])
    v = np.asarray(d["values_0_0"], dtype=float)
    assert len(v) == n_rows
    assert np.all(np.isfinite(v))          # failures never hit the file
    # every snapshotted sample is in the sums: totals agree exactly
    np.testing.assert_allclose(v.sum(), sums[0][0], rtol=1e-12)
    # with max_resample=0 and top-up rounds, coverage approaches N
    assert 360 <= n_rows <= 400


def test_group_collect_chunked(tmp_path):
    """Chunked samplefile collection (memory bound): multiple engine
    calls per blue_fn must still append exactly N rows whose sum matches
    the returned sums."""
    class GJ2(BLUEProblem):
        def sampler_jax(self, key, ls):
            z = jax.random.normal(key)
            return jnp.full((len(ls),), z)

        def evaluate_jax(self, ls, samples):
            return jnp.stack([samples[i] * (1.0 + l)
                              for i, l in enumerate(ls)])[None, :]

    f = str(tmp_path / "chunked.npz")
    p = GJ2(3, C=np.eye(3) + 0.5, costs=np.array([4.0, 2.0, 1.0]),
            samplefile=f, verbose=False)
    p._COLLECT_CHUNK = 1000          # instance override: 3 chunks
    sums, _, _ = p.blue_fn([0, 2], 2500, verbose=False)
    d = dict(np.load(str(tmp_path / "chunked02.npz"), allow_pickle=True))
    assert int(np.asarray(d["n_samples"]).ravel()[0]) == 2500
    v = np.asarray(d["values_0_0"], dtype=float)
    assert v.shape[0] == 2500
    np.testing.assert_allclose(v.sum(), sums[0][0], rtol=1e-12)


def test_group_collect_spooled(tmp_path, monkeypatch):
    """XL collection runs spill chunks to disk asynchronously
    (SnapshotSpool); the resulting npz must be byte-identical to the
    accumulate-on-host path, on fresh files and when appending."""
    class GJ2(BLUEProblem):
        def sampler_jax(self, key, ls):
            z = jax.random.normal(key)
            return jnp.full((len(ls),), z)

        def evaluate_jax(self, ls, samples):
            return jnp.stack([samples[i] * (1.0 + l)
                              for i, l in enumerate(ls)])[None, :]

    costs = np.array([4.0, 2.0, 1.0])
    f_mem = str(tmp_path / "mem.npz")
    p = GJ2(3, C=np.eye(3) + 0.5, costs=costs, samplefile=f_mem,
            verbose=False)
    p._COLLECT_CHUNK = 1000
    p.blue_fn([0, 2], 2500, verbose=False)
    d_mem = dict(np.load(str(tmp_path / "mem02.npz"), allow_pickle=True))

    # tiny threshold forces the spool on every multi-chunk run
    monkeypatch.setenv("BLUEST_TPU_SNAPSHOT_SPILL_MB", "0.001")
    f_sp = str(tmp_path / "spool.npz")
    p2 = GJ2(3, C=np.eye(3) + 0.5, costs=costs, samplefile=f_sp,
             verbose=False)
    p2._COLLECT_CHUNK = 1000
    sums, _, _ = p2.blue_fn([0, 2], 2500, verbose=False)
    d_sp = dict(np.load(str(tmp_path / "spool02.npz"), allow_pickle=True))
    assert set(d_mem) == set(d_sp)
    for k in d_mem:
        np.testing.assert_array_equal(np.asarray(d_mem[k]),
                                      np.asarray(d_sp[k]), err_msg=k)
    np.testing.assert_allclose(
        np.asarray(d_sp["values_0_0"], float).sum(), sums[0][0],
        rtol=1e-12)

    # append-to-existing goes through the spool's memmap merge
    p2.blue_fn([0, 2], 2500, verbose=False)
    d3 = dict(np.load(str(tmp_path / "spool02.npz"), allow_pickle=True))
    assert int(np.asarray(d3["n_samples"]).ravel()[0]) == 5000
    assert np.asarray(d3["values_0_0"]).shape[0] == 5000

    # the spill decision is re-evaluated per chunk: when the threshold is
    # crossed mid-run, already-accumulated chunks migrate into the spool
    # and the result is still identical
    monkeypatch.delenv("BLUEST_TPU_SNAPSHOT_SPILL_MB")
    f_mig = str(tmp_path / "mig.npz")
    p3 = GJ2(3, C=np.eye(3) + 0.5, costs=costs, samplefile=f_mig,
             verbose=False)
    p3._COLLECT_CHUNK = 1000
    seq = iter([float("inf"), 0.0])     # chunk 0 in memory, chunk 1 spills
    p3._collect_spill_bytes = lambda: next(seq, 0.0)
    p3.blue_fn([0, 2], 2500, verbose=False)
    d4 = dict(np.load(str(tmp_path / "mig02.npz"), allow_pickle=True))
    for k in d_mem:
        np.testing.assert_array_equal(np.asarray(d_mem[k]),
                                      np.asarray(d4[k]), err_msg=k)


def test_kernel_engine_collect_spooled(tmp_path, monkeypatch):
    """The factored kernel-engine snapshot path streams buckets through
    the same CollectSink: a spooled multi-bucket run writes the same
    npz as the in-memory path."""
    from bluest_tpu.models.analytic import ExpSeriesProblem

    def run(fname, spill):
        if spill is None:
            monkeypatch.delenv("BLUEST_TPU_SNAPSHOT_SPILL_MB",
                               raising=False)
        else:
            monkeypatch.setenv("BLUEST_TPU_SNAPSHOT_SPILL_MB", spill)
        p = ExpSeriesProblem(
            3, C=np.eye(3) + 0.5, costs=np.array([4.0, 2.0, 1.0]),
            samplefile=fname, device_batch_size=128, verbose=False)
        p._kernel_engine().max_bucket = 128   # force multi-bucket runs
        return p.blue_fn([0, 2], 2500, verbose=False)

    run(str(tmp_path / "mem.npz"), None)
    d_mem = dict(np.load(str(tmp_path / "mem02.npz"), allow_pickle=True))
    sums, _, _ = run(str(tmp_path / "sp.npz"), "0.0001")
    d_sp = dict(np.load(str(tmp_path / "sp02.npz"), allow_pickle=True))
    assert set(d_mem) == set(d_sp)
    for k in d_mem:
        np.testing.assert_array_equal(np.asarray(d_mem[k]),
                                      np.asarray(d_sp[k]), err_msg=k)
    assert int(np.asarray(d_sp["n_samples"]).ravel()[0]) == 2500
    np.testing.assert_allclose(
        np.asarray(d_sp["values_0_0"], float).sum(), sums[0][0],
        rtol=1e-12)


def test_snapshot_spool_unit(tmp_path):
    """SnapshotSpool: outputs_to_save filtering, vector trailing dims,
    layout-mismatch surfacing, and temp-dir cleanup."""
    from bluest_tpu.sampling.snapshots import (SnapshotSpool,
                                               append_spooled_snapshots)
    sp = SnapshotSpool(2, 2, outputs_to_save=[1], tmpdir=str(tmp_path))
    rng = np.random.default_rng(0)
    v1, x1 = rng.random((5, 2, 2)), rng.random((5, 3))
    v2, x2 = rng.random((7, 2, 2)), rng.random((7, 3))
    sp.append(v1, x1)
    sp.append(v2, x2)
    out = str(tmp_path / "snap.npz")
    fname = append_spooled_snapshots(out, [0, 1], 2, sp)
    sp.cleanup()
    assert not os.path.isdir(sp.dir)
    d = dict(np.load(fname, allow_pickle=True))
    # only output 1 is saved; inputs always are
    assert "values_0_0" not in d and "values_1_1" in d
    np.testing.assert_allclose(
        np.asarray(d["values_1_0"]), np.concatenate([v1, v2])[:, 1, 0])
    np.testing.assert_allclose(
        np.asarray(d["inputs_1"]), np.concatenate([x1, x2]))
    assert int(np.asarray(d["n_samples"]).ravel()[0]) == 12

    # zero-row chunks (every attempted row non-finite) are skipped, not
    # crashed on (reshape(0, -1) is ambiguous in numpy)
    sp0 = SnapshotSpool(2, 2, tmpdir=str(tmp_path))
    sp0.append(np.zeros((0, 2, 2)), np.zeros((0, 3)))
    sp0.append(v1, x1)
    f0 = append_spooled_snapshots(str(tmp_path / "zr.npz"), [0, 1], 2, sp0)
    sp0.cleanup()
    assert int(np.asarray(np.load(f0, allow_pickle=True)["n_samples"]
                          ).ravel()[0]) == 5

    # an all-zero-row sink writes nothing (and does not raise)
    from bluest_tpu.sampling.snapshots import CollectSink
    sink = CollectSink(2, 2, 10, 1 << 30, tmpdir=str(tmp_path))
    sink.add(np.zeros((0, 2, 2)), np.zeros((0, 3)), attempted_rows=10)
    sink.write(str(tmp_path / "empty.npz"), [0, 1])
    assert not os.path.isfile(str(tmp_path / "empty01.npz"))

    # inconsistent chunk layout raises on finish (writer thread error)
    sp2 = SnapshotSpool(1, 1, tmpdir=str(tmp_path))
    sp2.append(rng.random((4, 1, 1)), rng.random((4, 2)))
    sp2.append(rng.random((4, 1, 1, 3)), rng.random((4, 2)))
    with pytest.raises(ValueError, match="inconsistent chunk layout"):
        append_spooled_snapshots(str(tmp_path / "bad.npz"), [0], 1, sp2)
    sp2.cleanup()


def test_snapshot_append_filter_mismatch(tmp_path):
    """Appending to a snapshot file written under a different
    outputs_to_save filter must raise, not silently grow only the shared
    columns (which would misassociate rows across columns on read)."""
    from bluest_tpu.sampling.snapshots import append_snapshots
    rng = np.random.default_rng(1)
    f = str(tmp_path / "snap.npz")
    v = rng.random((5, 2, 2))
    x = rng.random((5, 3))
    append_snapshots(f, [0, 1], 2, v, x, outputs_to_save=[1])
    with pytest.raises(ValueError, match="outputs_to_save"):
        append_snapshots(f, [0, 1], 2, v, x)   # now saving all outputs
    # matching filter still appends fine
    append_snapshots(f, [0, 1], 2, v, x, outputs_to_save=[1])
    d = dict(np.load(str(tmp_path / "snap01.npz"), allow_pickle=True))
    assert int(np.asarray(d["n_samples"]).ravel()[0]) == 10
    assert len(np.asarray(d["values_1_0"])) == 10


def test_mfmc_small_budget_e2e():
    """setup_mfmc(small_budget=True) routes through the Gruber low-budget
    integer scheme (reference mfmc_low_budget_integer_solution,
    misc.py:416-449) and must return an integer schedule inside the
    budget even when the continuous optimum has m1 < 1."""
    M = 4
    rho = np.array([1.0, 0.98, 0.9, 0.7])
    sig = np.array([2.0, 1.9, 1.7, 1.5])
    C = np.outer(sig, sig) * np.outer(rho, rho)
    np.fill_diagonal(C, sig ** 2)
    # make the fixed (0, i) correlations exact: C[0,i] = sig0*sigi*rho_i
    C[0, :] = sig[0] * sig * rho
    C[:, 0] = C[0, :]
    w = np.array([100.0, 10.0, 1.0, 0.1])
    p = BLUEProblem(M, C=C, costs=w, verbose=False)

    # tight budget: continuous m1 = budget/(w @ r) < 1 forces the
    # recursive clamp branch of the Gruber scheme
    budget = 150.0
    data = p.setup_mfmc(budget=budget, small_budget=True)
    m = np.asarray(data["samples"])
    assert m.dtype.kind == "i"
    assert m[0] >= 1
    assert m @ w[data["models"]] <= budget * (1 + 1e-12)
    assert np.all(np.isfinite(data["errors"]))

    # comfortable budget: both integer paths feasible and in-budget
    budget = 5000.0
    d_small = p.setup_mfmc(budget=budget, small_budget=True)
    d_corner = p.setup_mfmc(budget=budget, small_budget=False)
    for d in (d_small, d_corner):
        md = np.asarray(d["samples"])
        assert md[0] >= 1
        assert md @ w[d["models"]] <= budget * (1 + 1e-12)
        assert np.all(np.isfinite(d["errors"]))


def test_snapshot_review_regressions(tmp_path):
    """Session-4 review fixes: duplicate outputs_to_save entries must
    not corrupt spooled columns; a top-up sink reused past N_expected
    keeps its spill bound; a models mismatch raises ValueError (not a
    -O-stripped assert); zero-sample kernel requests return zero sums."""
    from bluest_tpu.sampling.snapshots import (SnapshotSpool, CollectSink,
                                               append_spooled_snapshots,
                                               append_snapshots)
    rng = np.random.default_rng(3)
    # duplicate outputs_to_save: dedup'd, columns stay row-aligned
    sp = SnapshotSpool(2, 1, outputs_to_save=[0, 0], tmpdir=str(tmp_path))
    v1, x1 = rng.random((4, 2, 1)), rng.random((4, 2))
    v2, x2 = rng.random((3, 2, 1)), rng.random((3, 2))
    sp.append(v1, x1)
    sp.append(v2, x2)
    f = append_spooled_snapshots(str(tmp_path / "dup.npz"), [0], 2, sp)
    d = dict(np.load(f, allow_pickle=True))
    np.testing.assert_allclose(np.asarray(d["values_0_0"]),
                               np.concatenate([v1, v2])[:, 0, 0])
    sp.cleanup()

    # spill bound survives reuse past N_expected (the shared top-up sink)
    sink = CollectSink(1, 1, N_expected=4, spill_bytes=2000.0,
                       tmpdir=str(tmp_path))
    sink.add(rng.random((4, 1, 1)), rng.random((4, 8)))  # fills N_expected
    assert sink.spool is None
    for _ in range(10):                                  # top-up rounds
        sink.add(rng.random((4, 1, 1)), rng.random((4, 8)))
    assert sink.spool is not None, "reused sink never spilled"
    sink.close()

    # models mismatch raises ValueError (works under python -O too)
    f2 = str(tmp_path / "mm.npz")
    append_snapshots(f2, [1, 12], 2, rng.random((2, 2, 2)),
                     rng.random((2, 3)))
    with pytest.raises(ValueError, match="holds models"):
        append_snapshots(f2, [11, 2], 2, rng.random((2, 2, 2)),
                         rng.random((2, 3)))

    # zero-sample kernel request: zero sums, no unpack crash (the
    # sibling group branch already guarded N > 0; the kernel path
    # unpacked a None accumulator)
    class Fact(BLUEProblem):
        def sample_input_jax(self, key):
            return jax.random.normal(key)

        def evaluate_model_jax(self, l, z):
            return (jnp.sin(z) / (1.0 + l))[None]

    p = Fact(3, costs=np.array([4.0, 2.0, 1.0]),
             covariance_estimation_samples=64, verbose=False,
             samplefile=str(tmp_path / "zero.npz"))
    sums = p._kernel_engine().sample_sums((0, 1), jax.random.key(0), 0)
    assert int(np.asarray(sums.n_failed)) == 0
    assert float(np.abs(np.asarray(sums.sumse)).sum()) == 0.0
    sumse, _, _ = p.blue_fn([0, 1], 0)
    assert float(np.abs(np.asarray(sumse, dtype=float)).sum()) == 0.0
