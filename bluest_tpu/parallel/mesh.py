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
