"""Multi-device sampling tests on the virtual 8-device CPU mesh
(replaces the reference's `mpiexec -n 8` testing, tutorial 01:140-172)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bluest_tpu.parallel import sample_mesh, sample_model_mesh
from bluest_tpu.sampling import jax_engine


def make_model_fn(L=3, No=2):
    def model_fn(key):
        z = jax.random.normal(key)
        base = jnp.array([jnp.exp(z), z ** 2 + 1.0, jnp.cos(z)])[:L]
        return jnp.stack([base, 2.0 * base])[:No]
    return model_fn


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_sums_match_single_device():
    model_fn = make_model_fn()
    mesh = sample_mesh()
    N = 1000  # deliberately not divisible by 8

    eng1 = jax_engine.build_group_engine(model_fn, 2, 3, batch_size=64,
                                         mesh=None)
    eng8 = jax_engine.build_group_engine(model_fn, 2, 3, batch_size=64,
                                         mesh=mesh)
    key = jax.random.key(42)
    s1 = eng1(key, N)
    s8 = eng8(key, N)
    # same keys are used for the same global sample indices, so the sums
    # must agree to reduction-order rounding
    np.testing.assert_allclose(np.asarray(s8.sumse), np.asarray(s1.sumse),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s8.sumsc), np.asarray(s1.sumsc),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s8.sumsd2), np.asarray(s1.sumsd2),
                               rtol=1e-12)
    assert int(s1.n_failed) == 0 and int(s8.n_failed) == 0


def test_exact_n_semantics():
    """Mean over exactly N samples regardless of padding/batching."""
    def model_fn(key):
        return jnp.ones((1, 1)) * jax.random.normal(key)

    eng = jax_engine.build_group_engine(model_fn, 1, 1, batch_size=128,
                                        mesh=sample_mesh())
    N = 777
    s = eng(jax.random.key(0), N)
    # sum of N iid normals has std sqrt(N); check plausible magnitude
    assert abs(float(s.sumse[0, 0, 0])) < 6 * np.sqrt(N)
    # second moment ~ N
    assert abs(float(s.sumsc[0, 0, 0]) - N) < 6 * np.sqrt(2 * N)


def test_nan_resampling():
    """Model returning NaN with ~30% probability must still produce finite
    sums (bounded resampling replaces the reference's infinite retry loop,
    blue_fn.py:118-129)."""
    def model_fn(key):
        z = jax.random.normal(key)
        bad = z > 0.5  # ~30% of draws
        return jnp.where(bad, jnp.nan, z).reshape(1, 1)

    eng = jax_engine.build_group_engine(model_fn, 1, 1, batch_size=64)
    s = eng(jax.random.key(1), 500)
    assert np.isfinite(np.asarray(s.sumse)).all()
    assert int(s.n_failed) == 0
    # resampled distribution is the truncated normal (z <= 0.5): mean < 0
    assert float(s.sumse[0, 0, 0]) / 500 < 0


def test_sample_model_mesh_shapes():
    mesh = sample_model_mesh(4, 2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("samples", "model")


def test_model_axis_sharded_model():
    """Nested-parallelism equivalent: a model whose state is sharded over
    the 'model' axis inside shard_map (reference nested MPI,
    restrictions_matern.py:19-37)."""
    from jax.sharding import PartitionSpec as P

    mesh = sample_model_mesh(4, 2)
    D = 16

    def sharded_model(key, x_shard):
        # x_shard: this device's half of a length-D state vector
        z = jax.random.normal(key)
        local = jnp.sum(x_shard * z)
        total = jax.lax.psum(local, "model")     # model-internal collective
        return total

    def per_sample_instance(key, x):
        # runs on one 'samples' row: the model spans the 'model' axis
        i = jax.lax.axis_index("samples")
        k = jax.random.fold_in(key, i)
        return sharded_model(k, x)[None]

    x = jnp.arange(D, dtype=jnp.float64)
    f = jax.shard_map(per_sample_instance, mesh=mesh,
                      in_specs=(P(), P("model")), out_specs=P("samples"),
                      check_vma=False)
    out = jax.jit(f)(jax.random.key(0), x)
    assert out.shape == (4,)
    # each sample instance computed sum(x) * z_i for its own z_i
    zs = np.asarray(out) / float(np.sum(np.arange(D)))
    assert len(np.unique(np.round(zs, 12))) == 4


def test_kernel_engine_model_parallel():
    """KernelEngineV2 on a 2D (samples x model) mesh: the model uses a psum
    over the 'model' axis internally (nested-MPI equivalent)."""
    import jax.numpy as jnp
    from bluest_tpu.sampling.kernel_engine import KernelEngineV2 as KernelEngine

    mesh = sample_model_mesh(4, 2)
    D = 8

    def sample_input(key):
        return jax.random.normal(key, (D,))

    def eval_model(l, theta):
        # model-parallel contraction: each model shard sums its slice of
        # theta and psums over the model axis
        m = jax.lax.axis_index("model")
        half = D // 2
        sl = jax.lax.dynamic_slice(theta, (m * half,), (half,))
        local = jnp.sum(sl) / (l + 1.0)
        return jax.lax.psum(local, "model")[None]

    eng = KernelEngine(sample_input, eval_model, 2, 1, batch_size=64,
                       mesh=mesh)
    s = eng.sample_sums([0, 1], jax.random.key(0), 200)
    se = np.asarray(s.sumse)
    # model 1 output = model 0 output / 2 exactly (same theta)
    np.testing.assert_allclose(se[0, 1] if se.ndim == 2 else se[0, 1, 0],
                               (se[0, 0] if se.ndim == 2 else se[0, 0, 0]) / 2,
                               rtol=1e-12)
    assert int(s.n_failed) == 0


class ModelParallelProblem(__import__("bluest_tpu").BLUEProblem):
    """Tiny problem whose model spans the 'model' mesh axis (psum inside),
    driven through the full BLUEProblem pipeline."""

    D = 8

    def sample_input_jax(self, key):
        return jax.random.normal(key, (self.D,))

    def evaluate_model_jax(self, l, theta):
        import jax.numpy as jnp
        m = jax.lax.axis_index("model")
        half = self.D // 2
        sl = jax.lax.dynamic_slice(theta, (m * half,), (half,))
        local = jnp.sum(jnp.exp(0.2 * sl)) / (l + 1.0)
        return jax.lax.psum(local, "model")[None]


def test_blueproblem_2d_mesh_pipeline():
    mesh = sample_model_mesh(4, 2)
    p = ModelParallelProblem(3, costs=np.array([4.0, 2.0, 1.0]), mesh=mesh,
                             covariance_estimation_samples=512,
                             device_batch_size=128, verbose=False)
    C = p.get_covariance()
    assert np.all(np.isfinite(np.diag(C)))
    eps = 0.1 * np.sqrt(C[0, 0])
    blue = p.setup_solver(K=2, eps=eps)
    mus, errs, cost = p.solve(K=2, eps=eps)
    # E[sum exp(0.2 Z_i)] = D * exp(0.02)
    ref = 8 * np.exp(0.02)
    assert abs(mus[0] - ref) < 6 * max(errs[0], 0.1)


def test_group_engine_2d_mesh_matches_single_device():
    """On a 2D (samples x model) mesh the group engine must partition the
    index range by the SAMPLE-axis size, not the device count -- deriving
    shards from devices.size skipped half the index range and silently
    biased every sum low (the idx<N mask cannot tell a skipped index
    from a finished one)."""
    model_fn = make_model_fn()
    mesh = sample_model_mesh(4, 2)
    N = 1000
    eng1 = jax_engine.build_group_engine(model_fn, 2, 3, batch_size=64,
                                         mesh=None)
    eng2d = jax_engine.build_group_engine(model_fn, 2, 3, batch_size=64,
                                          mesh=mesh)
    key = jax.random.key(7)
    s1 = eng1(key, N)
    s2 = eng2d(key, N)
    np.testing.assert_allclose(np.asarray(s2.sumse), np.asarray(s1.sumse),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.sumsc), np.asarray(s1.sumsc),
                               rtol=1e-12)
    assert int(s2.n_failed) == 0


def test_dropped_nan_samples_do_not_poison_sums():
    """max_resample=0 means 'caller accepts drops': a non-finite sample
    must be zeroed out of the einsums (0 * NaN = NaN otherwise) and
    counted in n_failed."""
    def model_fn(key):
        z = jax.random.normal(key)
        return jnp.where(z > 0.5, jnp.nan, z).reshape(1, 1)

    eng = jax_engine.build_group_engine(model_fn, 1, 1, batch_size=64,
                                        max_resample=0)
    s = eng(jax.random.key(3), 500)
    assert np.isfinite(np.asarray(s.sumse)).all()
    assert np.isfinite(np.asarray(s.sumsc)).all()
    assert 0 < int(s.n_failed) < 500


def test_kernel_engine_act_slicing_exact_sums():
    """The combiner contracts only each shard's active prefix (pow4
    bucketed); sums must stay EXACT for awkward N around tier/act
    boundaries, sharded and single-device."""
    import jax.numpy as jnp
    from bluest_tpu.sampling.kernel_engine import KernelEngineV2

    def sample_input(key):
        return jax.random.normal(key)

    def eval_model(l, th):
        return jnp.stack([th * (l + 1.0)])

    key = jax.random.key(5)
    for mesh in (None, sample_mesh(4)):
        eng = KernelEngineV2(sample_input, eval_model, 2, 1, batch_size=8,
                             mesh=mesh, max_bucket=256)
        for N in (1, 7, 9, 33, 65, 100, 300):
            s = eng.sample_sums([0, 1], key, N)
            th = np.array([float(sample_input(jax.random.fold_in(key, i)))
                           for i in range(N)])
            se = np.asarray(s.sumse).reshape(1, 2)
            np.testing.assert_allclose(se[0, 0], th.sum(), rtol=1e-12)
            np.testing.assert_allclose(se[0, 1], 2 * th.sum(), rtol=1e-12)
            sc = np.asarray(s.sumsc)
            np.testing.assert_allclose(sc[0, 0, 1], 2 * (th ** 2).sum(),
                                       rtol=1e-12)
            d2 = np.asarray(s.sumsd2)
            np.testing.assert_allclose(d2[0, 0, 1], (th ** 2).sum(),
                                       rtol=1e-12)
            assert int(s.n_failed) == 0


def test_group_engine_dynamic_bound_exact_sums():
    """The group engine's chunk loop is dynamically bounded (padding
    chunks are skipped, not evaluated); sums stay exact for N around
    pow2 bucket boundaries, sharded and single-device."""
    import jax.numpy as jnp
    from bluest_tpu.sampling import jax_engine

    def model_fn(key):
        z = jax.random.normal(key)
        return jnp.stack([z, 2.0 * z])[None, :]     # (No=1, L=2)

    key = jax.random.key(9)
    for mesh in (None, sample_mesh(4)):
        eng = jax_engine.build_group_engine(model_fn, 1, 2, batch_size=8,
                                            mesh=mesh)
        for N in (1, 8, 9, 17, 33, 100):
            s = eng(key, N)
            th = np.array([float(jax.random.normal(
                jax.random.fold_in(key, i))) for i in range(N)])
            np.testing.assert_allclose(np.asarray(s.sumse)[0, 0, 0],
                                       th.sum(), rtol=1e-12)
            np.testing.assert_allclose(np.asarray(s.sumsc)[0, 0, 1],
                                       2 * (th ** 2).sum(), rtol=1e-12)
            np.testing.assert_allclose(np.asarray(s.sumsd2)[0, 0, 1],
                                       (th ** 2).sum(), rtol=1e-12)
            assert int(s.n_failed) == 0
