"""Crash-isolated dispatch of the fused IPM program.

This build's XLA:CPU PJRT surface intermittently SEGFAULTS on the big
fused IPM while_loop module -- observed in-suite inside
``backend_compile_and_load``, ``LoadedExecutable.serialize()`` AND
``deserialize_executable`` (cache read), i.e. on every entry point the
module crosses.  On this host the "cpu" backend executes through a
remote tunnel whose worker pool is heterogeneous and changes over time,
so even well-formed cache entries can be poisoned for the machine that
ends up executing them (the AOT loader warns about SIGILL on feature
mismatches).  No amount of cache hygiene makes the parent process safe.

So the parent never touches CPU PJRT for this module at all: a
PERSISTENT worker subprocess (one per parent process, alive across
solves so its jit trace/compile caches amortize exactly like
in-process dispatch did) receives the host numpy arrays over a pipe,
runs the fused program, and ships the numpy results back.  If the
worker dies or wedges, the parent restarts it and retries -- the second
retry with the persistent compilation cache DISABLED, which dodges
poisoned cache entries and the serialize path entirely at the cost of
one in-worker recompile.  If that fails too, the caller sees a
``RuntimeError`` which ``solve_cone_lp`` converts into a "failed"
result, engaging the ordinary scipy-NLP fallback chain: an
infrastructure crash can cost one recompile or one fallback, never the
user's process.

Overhead when healthy: one pickle round-trip per solve (a few MB of
f64 at large L, ~tens of ms) -- negligible next to the solve itself.
Disable with BLUEST_TPU_IPM_ISOLATE=0 to dispatch in-process (the
pre-round-3 behavior, e.g. for debugging with breakpoints).

Reference context: the reference's cvxopt runs in-process and a solver
crash kills the run (bluest sap.py:242-307); this module is part of the
failure-detection story (SURVEY 5.3) instead.
"""

from __future__ import annotations

import os
import pickle
import select
import struct
import subprocess
import sys
import threading

import numpy as np

_HDR = struct.Struct("<Q")


def _send(stream, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    stream.write(_HDR.pack(len(data)))
    stream.write(data)
    stream.flush()


def _read_exact(fd: int, n: int, timeout: float) -> bytes:
    chunks = []
    got = 0
    while got < n:
        r, _, _ = select.select([fd], [], [], timeout)
        if not r:
            raise TimeoutError("ipm worker timed out")
        chunk = os.read(fd, n - got)
        if not chunk:
            raise EOFError("ipm worker pipe closed")
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)


def _recv_fd(fd: int, timeout: float):
    n = _HDR.unpack(_read_exact(fd, _HDR.size, timeout))[0]
    return pickle.loads(_read_exact(fd, n, timeout))


class IPMWorkerClient:
    """Parent-side handle on the persistent worker (one per process).

    Thread-safe: the MOSAP prewarm daemon thread and the main thread
    funnel through one lock, exactly like the GIL serialized the old
    in-process dispatches."""

    def __init__(self):
        self._lock = threading.Lock()
        self._proc = None
        self._no_cache = False   # sticky after a cache-free recovery

    # ------------------------------------------------------------------ #

    def _start(self):
        env = dict(os.environ)
        env["BLUEST_TPU_IPM_ISOLATE"] = "0"      # no recursion
        env["BLUEST_TPU_IPM_PREWARM"] = "0"
        if self._no_cache:
            env["BLUEST_TPU_CACHE"] = "0"
        self._proc = subprocess.Popen(
            [sys.executable, "-m", "bluest_tpu.solvers.ipm_worker"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, start_new_session=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))

    def _kill(self):
        if self._proc is not None:
            try:
                self._proc.kill()
                self._proc.wait(timeout=10)
            except Exception:
                pass
            self._proc = None

    def shutdown(self):
        with self._lock:
            self._kill()

    # ------------------------------------------------------------------ #

    def run(self, payload, timeout: float | None = None):
        """One request/response round trip with restart-and-retry.

        Attempt 0: current worker (started on demand).  Attempt 1: fresh
        worker (transient crash).  Attempt 2: fresh worker with the
        persistent compilation cache disabled (dodges poisoned entries
        and the serialize path).  Then RuntimeError."""
        if timeout is None:
            timeout = float(os.environ.get(
                "BLUEST_TPU_IPM_WORKER_TIMEOUT", "3600"))
        with self._lock:
            last = None
            for attempt in range(3):
                if attempt == 2 and not self._no_cache:
                    self._no_cache = True
                    self._kill()
                if self._proc is None or self._proc.poll() is not None:
                    self._kill()
                    try:
                        self._start()
                    except OSError as exc:
                        last = exc
                        continue
                try:
                    _send(self._proc.stdin, payload)
                    status, value = _recv_fd(
                        self._proc.stdout.fileno(), timeout)
                except (EOFError, TimeoutError, BrokenPipeError,
                        OSError) as exc:
                    last = exc
                    self._kill()
                    continue
                if status == "ok":
                    return value
                # in-worker Python exception: deterministic, no retry
                raise RuntimeError("ipm worker error: %s" % (value,))
            raise RuntimeError("ipm worker failed after retries: %r" % (last,))


_CLIENT = None
_CLIENT_LOCK = threading.Lock()


def get_client() -> IPMWorkerClient:
    global _CLIENT
    with _CLIENT_LOCK:
        if _CLIENT is None:
            _CLIENT = IPMWorkerClient()
            import atexit
            atexit.register(_CLIENT.shutdown)
        return _CLIENT


# ---------------------------- worker side -------------------------------- #

def _worker_main() -> None:
    # claim the protocol fd, then route any stray prints to stderr so
    # they cannot corrupt the frame stream
    proto_out = os.fdopen(os.dup(1), "wb")
    os.dup2(2, 1)
    stdin_fd = 0

    import bluest_tpu.config  # noqa: F401  (x64 + cache setup)
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as jeb
        jeb.clear_backends()
    except Exception:
        pass
    import jax.numpy as jnp
    from bluest_tpu.solvers import sdp

    while True:
        try:
            req = _recv_fd(stdin_fd, timeout=86400.0)
        except (EOFError, TimeoutError):
            return
        try:
            (arrays_np, cnorm, hnorm, step_frac, tol, feastol, max_iter,
             verbose, woodbury) = req
            arrays = tuple(jnp.asarray(a) for a in arrays_np)
            out = sdp._dispatch_ipm(arrays, cnorm, hnorm, step_frac, tol,
                                    feastol, max_iter, verbose, woodbury)
            reply = ("ok", tuple(np.asarray(v) for v in out))
        except Exception as exc:  # noqa: BLE001 - shipped to the parent
            reply = ("err", "%s: %s" % (type(exc).__name__, exc))
        _send(proto_out, reply)


if __name__ == "__main__":
    _worker_main()
