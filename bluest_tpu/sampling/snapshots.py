"""Sample snapshot persistence in the reference npz format.

Reference blue_fn streams every model output and input sample to npz files
named ``basename + ''.join(models) + ext`` and appends across runs with
consistency checks (blue_fn.py:97-104, 189-222).  The host engine writes
these inline; the device engine collects outputs on device and hands them
here in bulk.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def snapshot_filename(filename: str, ls: Sequence[int]) -> str:
    ext = "." + filename.split(".")[-1]
    base = ".".join(filename.split(".")[:-1]) + "".join(str(l) for l in ls)
    return base + ext


def append_snapshots(filename: str, ls: Sequence[int], No: int,
                     values: np.ndarray, inputs,
                     outputs_to_save: Optional[Sequence[int]] = None,
                     per_model_inputs: Optional[List] = None) -> str:
    """Append a block of samples to the snapshot file for group ``ls``.

    values: (N, No, L) model outputs; inputs: (N, ...) raw random inputs
    shared by all models of the group (device engines), OR
    ``per_model_inputs``: per-model list of length-N input arrays (host
    engine, where each model receives its own sample representation).
    Returns the resolved filename."""
    fname = snapshot_filename(filename, ls)
    L = len(ls)
    N = values.shape[0]
    if outputs_to_save is None:
        outputs_to_save = list(range(No))

    out = {}
    for n in range(No):
        if n in outputs_to_save:
            for i in range(L):
                out["values_%d_%d" % (n, i)] = list(values[:, n, i])
    if per_model_inputs is not None:
        for i in range(L):
            out["inputs_%d" % i] = list(per_model_inputs[i])
    else:
        flat_inputs = list(np.asarray(inputs).reshape(N, -1))
        for i in range(L):
            out["inputs_%d" % i] = flat_inputs
    out["models"] = np.array([list(ls)])
    out["n_samples"] = np.array([N])
    out["n_outputs"] = np.array([No])

    if os.path.isfile(fname):
        old = {k: [item for item in v]
               for k, v in dict(np.load(fname, allow_pickle=True)).items()}
        assert list(np.asarray(old["models"][0])) == list(ls)
        for key in old:
            if "values" in key or "inputs" in key:
                old[key] += out.get(key, [])
        old["n_samples"] = np.array([int(np.asarray(
            old["n_samples"]).ravel()[0]) + N])
        old["models"] = out["models"]
        old["n_outputs"] = out["n_outputs"]
        out = old

    np.savez_compressed(fname, **out)
    return fname


def merge_snapshot_files(filename: str, ls: Sequence[int],
                         worker_files: Sequence[str]) -> Optional[str]:
    """Merge per-worker snapshot files into the target file for group
    ``ls`` and delete them -- the parallel host engine's analog of the
    reference's per-rank npz merge on rank 0 (blue_fn.py:189-222)."""
    fname = snapshot_filename(filename, ls)
    # load everything first, merge tolerantly, and only delete the
    # per-worker files after the merged file is written -- a mid-merge
    # failure must never lose already-deleted worker data
    acc = None
    if os.path.isfile(fname):
        acc = {k: [x for x in v]
               for k, v in dict(np.load(fname, allow_pickle=True)).items()}
    loaded = []
    for wf in worker_files:
        wname = snapshot_filename(wf, ls)
        if os.path.isfile(wname):
            loaded.append((wname, dict(np.load(wname, allow_pickle=True))))
    def data_keys(dd):
        return {k for k in dd if "values" in k or "inputs" in k}

    for _, d in loaded:
        if acc is None:
            acc = {k: [x for x in v] for k, v in d.items()}
            continue
        assert list(np.asarray(d["models"][0])) == \
            list(np.asarray(acc["models"][0]))
        if data_keys(d) != data_keys(acc):
            # appending with a different outputs_to_save filter would
            # leave per-key lists of different lengths with no alignment
            # metadata -- silent misassociation of outputs and inputs.
            # The per-worker files are preserved (nothing deleted yet).
            raise ValueError(
                "snapshot file %s was written with a different "
                "outputs_to_save filter than this run (%s vs %s); "
                "use a fresh samplefile" %
                (fname, sorted(data_keys(acc)), sorted(data_keys(d))))
        for key in data_keys(d):
            acc[key] = acc[key] + [x for x in d[key]]
        acc["n_samples"] = np.array(
            [int(np.asarray(acc["n_samples"]).ravel()[0])
             + int(np.asarray(d["n_samples"]).ravel()[0])])
    if acc is None:
        return None
    # atomic replace: a crash mid-write must not destroy prior runs'
    # merged data
    tmp = fname + ".tmp.npz"   # np.savez appends .npz to bare names
    np.savez_compressed(tmp, **acc)
    os.replace(tmp, fname)
    for wname, _ in loaded:
        os.remove(wname)
    return fname
