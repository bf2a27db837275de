"""Device mesh helpers.

The reference distributes Monte Carlo sampling with mpi4py (blue_fn.py:9,
106-110, 179-187).  Here distribution is a jax.sharding.Mesh: the sample
axis replaces the MPI rank split, psum replaces allreduce(SUM), and a
second 'model' axis is available for models that are themselves
distributed (the nested-communicator pattern of the reference,
blue_models.py:121-130)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

SAMPLE_AXIS = "samples"
MODEL_AXIS = "model"


def sample_mesh(n_devices: Optional[int] = None) -> jax.sharding.Mesh:
    """1D mesh over all (or the first n) devices for sample parallelism."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.array(devs), (SAMPLE_AXIS,))


def sample_model_mesh(n_sample: int, n_model: int) -> jax.sharding.Mesh:
    """2D (samples, model) mesh: the TPU-native equivalent of nested MPI
    communicators -- each model instance spans ``n_model`` devices, with
    ``n_sample`` such instances running independent samples."""
    devs = jax.devices()
    if n_sample * n_model > len(devs):
        raise ValueError("mesh larger than device count")
    arr = np.array(devs[:n_sample * n_model]).reshape(n_sample, n_model)
    return jax.sharding.Mesh(arr, (SAMPLE_AXIS, MODEL_AXIS))


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization hook (jax.distributed) -- replaces
    `mpiexec` process management for multi-slice jobs."""
    jax.distributed.initialize(**kwargs)


def fetch_global(x) -> np.ndarray:
    """``np.asarray`` for arrays that may span non-addressable devices.

    Under ``jax.distributed`` a sample-sharded engine output lives partly
    on other processes' devices and a direct fetch raises.  Gather it
    through a replicating collective instead, so every process receives
    the full logical array -- the TPU-native analog of the reference's
    rank-0 snapshot gather (blue_fn.py:189-199).  COLLECTIVE: in a
    multi-process run every process must call this on the same array.
    Single-process (or already fully-addressable) arrays take the plain
    fetch path untouched."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        # tiled=True: required for global (non-fully-addressable) input;
        # the result is the full logical array, replicated on every host
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def dcn_sample_model_mesh(n_model: Optional[int] = None) -> jax.sharding.Mesh:
    """Multi-slice 2D mesh laid out for the interconnect hierarchy.

    The sample axis varies ACROSS processes (slices) and the model axis
    stays WITHIN one process's local devices.  Monte Carlo sampling only
    communicates on the sample axis once, in the final psum of the small
    sum arrays -- cheap even over DCN -- while an internally-distributed
    model (the reference's nested-MPI pattern, blue_models.py:121-130)
    does per-sample collectives on the model axis, which this layout
    keeps on intra-slice ICI.  This is BASELINE config 5's mesh: call
    ``initialize_distributed`` on every process, then build this mesh
    and pass it as ``params["mesh"]``.

    ``n_model``: devices per model instance (must divide the local device
    count; default all local devices, i.e. one model instance per
    process).  With ``n_model=1`` the model axis is dropped and the
    result is a 1D cross-process sample mesh.
    """
    procs = jax.process_count()
    local = jax.local_device_count()
    if n_model is None:
        n_model = local
    n_model = int(n_model)
    if n_model < 1 or local % n_model:
        raise ValueError(
            "n_model=%d must divide the local device count %d so a model "
            "instance never straddles the DCN boundary" % (n_model, local))
    # order globally by (process, per-process position) so each mesh row
    # (model axis) is one process's contiguous devices
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    rows = procs * (local // n_model)
    if n_model == 1:
        return jax.sharding.Mesh(np.array(devs), (SAMPLE_AXIS,))
    arr = np.array(devs).reshape(rows, n_model)
    return jax.sharding.Mesh(arr, (SAMPLE_AXIS, MODEL_AXIS))
