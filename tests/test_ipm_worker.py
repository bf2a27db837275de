"""Crash-isolated IPM dispatch (solvers/ipm_worker.py): the persistent
worker must be numerically transparent, and a dead worker must cost a
restart -- never the user's process (failure-detection story, SURVEY
5.3; the reference's in-process cvxopt has no such protection)."""

import numpy as np
import pytest
from itertools import combinations

from bluest_tpu.core import GroupStructure, psi as psimod
from bluest_tpu.allocation import cones
from bluest_tpu.solvers.sdp import solve_cone_lp
from bluest_tpu.solvers import ipm_worker


def _program(seed=0, M=5, K=2):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((M, M))
    C = A @ A.T + M * np.eye(M)
    groups = [[list(cc) for cc in combinations(range(M), k)]
              for k in range(1, K + 1)]
    gs = GroupStructure(M, groups, C=C)
    data = psimod.GroupData.build(gs)
    psi = np.asarray(data.psi)
    w = np.geomspace(4.0, 1.0, gs.L)
    return cones.build_eps_sdp(
        [psi], [np.arange(gs.L)], gs.L, w, [gs.e],
        np.array([np.sqrt(C[0, 0]) / 30.0]), 1.0)[:5]


def test_worker_matches_in_process(monkeypatch):
    # pin the cold start: the second identical solve would otherwise
    # warm-start from the first's cached iterate (a different, shorter
    # trajectory), which is not what this transparency test compares
    monkeypatch.setenv("BLUEST_TPU_IPM_WARM", "0")
    c, Gl, hl, As, Hs = _program()
    r_iso = solve_cone_lp(c, Gl, hl, As, Hs)
    monkeypatch.setenv("BLUEST_TPU_IPM_ISOLATE", "0")
    r_dir = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r_iso.status == r_dir.status
    np.testing.assert_allclose(r_iso.x, r_dir.x, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(r_iso.pobj, r_dir.pobj, rtol=1e-12)
    assert r_iso.iterations == r_dir.iterations


def test_worker_restarts_after_kill(monkeypatch):
    monkeypatch.setenv("BLUEST_TPU_IPM_WARM", "0")   # identical re-solve
    c, Gl, hl, As, Hs = _program(seed=3)
    r1 = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r1.status in ("optimal", "inaccurate")
    client = ipm_worker.get_client()
    assert client._proc is not None and client._proc.poll() is None
    client._proc.kill()
    client._proc.wait(timeout=30)
    # the very next solve must transparently restart the worker
    r2 = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r2.status == r1.status
    np.testing.assert_allclose(r2.x, r1.x, rtol=1e-9, atol=1e-12)
    assert client._proc is not None and client._proc.poll() is None


def test_infra_failure_reports_failed_status(monkeypatch):
    """Retry exhaustion (IPMWorkerInfraError) must surface as
    status='failed' (NLP-fallback chain), never crash the caller."""
    class _Boom:
        def run(self, payload, timeout=None):
            raise ipm_worker.IPMWorkerInfraError("rigged outage")

    monkeypatch.setattr(ipm_worker, "get_client", lambda: _Boom())
    c, Gl, hl, As, Hs = _program(seed=11)
    r = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r.status == "failed"
    assert np.all(np.isnan(r.x))


def test_worker_stderr_is_logged():
    """Worker stderr goes to a log file (the SIGSEGV/AOT-mismatch
    diagnostics), not to /dev/null."""
    client = ipm_worker.get_client()
    # ensure at least one worker has run
    c, Gl, hl, As, Hs = _program(seed=13)
    solve_cone_lp(c, Gl, hl, As, Hs)
    import os
    assert os.path.exists(client._log_path())


def test_worker_error_reply_raises_not_crashes():
    client = ipm_worker.get_client()
    with pytest.raises(RuntimeError, match="ipm worker error"):
        # malformed payload -> in-worker exception -> ("err", ...) reply
        client.run(("not", "a", "valid", "payload"))
    # and the worker stays alive for the next real request
    c, Gl, hl, As, Hs = _program(seed=7)
    r = solve_cone_lp(c, Gl, hl, As, Hs)
    assert r.status in ("optimal", "inaccurate")
