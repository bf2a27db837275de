"""Global numerical configuration for bluest_tpu.

The allocation optimization (SDP / Newton solvers) and the estimator assembly
require float64 to reach the ~1e-8 agreement targets of the reference
(croci/bluest). TPU executes f64 in software emulation, which is fine here:
the allocation problems are tiny (L <= a few hundred groups, M <= tens of
models) and the Monte Carlo hot loop can run the *model* in f32/bf16 while
accumulating sums in f64.

Importing this module enables jax x64 once, before any arrays are created.
"""

from __future__ import annotations

import os
import platform

# Optional portable-ISA cap for XLA:CPU (BLUEST_TPU_MAX_ISA=AVX2),
# set BEFORE any backend initialization.  XLA:CPU AOT-compiles against
# the FULL feature set of the compiling machine -- including tuning
# pseudo-features like prefer-no-scatter -- and the persistent-cache
# loader refuses (or worse, SIGSEGVs on) executables whose features the
# running machine lacks; on mixed-CPU fleets / remote pools one rotation
# makes every cold start recompile (measured 1s -> 8s bench alloc).
# Capping the ISA at AVX2 strips amx/avx512/prefer-no-* from the target
# (verified against this build's cache entries) so executables load
# anywhere, and an ABBA A/B on the Hodgkin-Huxley K=5 golden (L ~ 400)
# measured the cap as a wash on the fused IPM (B/A 0.988).  It is OFF
# by default because the SAME cap is pathological on the XL fused
# program: the L = 3301 stress instance runs in ~34 s uncapped and did
# not finish in 25 minutes capped (killed; LLVM compile or kernel blowup
# under AVX2 on the giant module).  Opt in only for moderate-L
# workloads on heterogeneous fleets.  Respected only if the user has
# not already set an xla_cpu_max_isa in XLA_FLAGS; changing it changes
# every cache key once (one-time cold suite).
if (platform.machine() == "x86_64"
        and "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", "")):
    _isa = os.environ.get("BLUEST_TPU_MAX_ISA", "")
    if _isa:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_cpu_max_isa=" + _isa).strip()

import jax

jax.config.update("jax_enable_x64", True)

# Optional platform override (BLUEST_TPU_PLATFORM=cpu|tpu|...): site
# hooks on managed hosts pin jax_platforms to a remote-accelerator
# plugin and plain JAX_PLATFORMS env vars do NOT override the pin, but
# a jax.config.update before backend initialization does -- importing
# bluest_tpu (which imports this module first) is early enough.  The
# one-line escape hatch when the remote tunnel is down.
_plat = os.environ.get("BLUEST_TPU_PLATFORM", "")
if _plat:
    jax.config.update("jax_platforms", _plat)

# Persistent compilation cache: TPU compiles dominate cold-start time for
# the per-model kernels; cache them across processes.  Override the
# location with BLUEST_TPU_CACHE, disable with BLUEST_TPU_CACHE=0.
#
# The directory is suffixed with a host-CPU-feature fingerprint: JAX's
# cache key does NOT include the compiling machine's CPU features, so on
# heterogeneous fleets an XLA:CPU executable AOT-compiled on one machine
# (e.g. with amx/prefer-no-gather) gets deserialized on another -- the
# loader warns "could lead to execution errors such as SIGILL" and we
# observed hard SIGSEGVs inside get_executable_and_time doing exactly
# this.  Scoping the cache per CPU flavor keeps it correct AND warm on
# every machine it has seen before.


def _host_cpu_fingerprint() -> str:
    import hashlib
    import platform
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1]
                                                   .split()))
                    break
    except OSError:  # pragma: no cover - non-Linux fallback
        feats += " " + platform.processor()
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


_cache = os.environ.get("BLUEST_TPU_CACHE",
                        os.path.expanduser("~/.cache/bluest_tpu_xla"))
if _cache != "0":
    try:
        _cache = os.path.join(_cache, "cpu-" + _host_cpu_fingerprint())
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        # 0.1s, not the 1.0s default: the allocation path leans on many
        # 0.2-0.5s programs (cleanup-matrix kernels, corner-search eigh
        # chunks) that the default threshold silently recompiles in EVERY
        # fresh process -- profiled at 1.7s of the bench's first
        # allocation (4 compiles x ~0.42s, all below 1.0s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(os.environ.get(
                              "BLUEST_TPU_CACHE_MIN_COMPILE_S", "0.1")))
        # By default jax bakes "<cache_dir>/xla_gpu_per_fusion_autotune_
        # cache_dir" into the XLA debug options, which end up in the cache
        # KEY -- so entries written under one cache path can never be read
        # under another (this sank the first cache-warmer design), and any
        # cache relocation silently invalidates everything.  The feature is
        # GPU-only; drop it so keys are path-independent on CPU/TPU.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    except Exception:  # pragma: no cover - cache is best effort
        pass

# Default dtypes used throughout the library.
import numpy as np

REAL = np.float64
INDEX = np.int32

def _pinned_platform() -> str:
    """First platform THIS process's jax config is currently pinned to
    ('' when unpinned).  Split out so tests can stub the pin state."""
    import jax as _jax
    cur = str(_jax.config.jax_platforms or "")
    return cur.split(",")[0].strip().lower()


def ensure_responsive_device(timeout: float = 240.0, retries: int = 0,
                             fallback: str = "cpu"):
    """Probe default-backend initialization in a subprocess; on failure
    flip THIS process to the ``fallback`` platform.

    Remote-accelerator tunnels can hang backend init outright (observed:
    ``jax.devices()`` blocked > 20 minutes while the link was wedged), so
    any user-facing script that touches the default device first should
    call this before its first JAX op -- a wedged tunnel then costs one
    bounded probe instead of an indefinite hang.  The tunnel also flaps
    and recovers within minutes; pass ``retries`` > 0 (~90 s apart,
    shorter per-attempt timeout) when a device result is worth waiting
    for (bench does).  Returns ``None`` when the default device is
    healthy, else a human-readable note describing the fallback.

    Must run before this process initializes its backends; afterwards it
    still works (``jax.extend.backend.clear_backends`` drops the pinned
    backend) but any live device arrays are invalidated.

    The probe subprocess applies the same ``BLUEST_TPU_PLATFORM``
    override this module does: a bare ``import jax`` in the child would
    hit the site hook's pinned tunnel platform, so a user who already
    forced ``BLUEST_TPU_PLATFORM=cpu`` to dodge a wedged tunnel would
    still pay the full probe-timeout ladder against the very device they
    opted out of (observed: forced-cpu bench timing out on the probe).
    """
    import subprocess
    import sys as _sys
    import time as _time
    # the probe tests a FRESH subprocess's default backend; if this
    # process has already re-pinned jax_platforms to the fallback (e.g.
    # a test harness's jax.config.update("jax_platforms", "cpu")), the
    # tunnel is out of the picture and probing it only burns the timeout
    if _pinned_platform() == fallback:
        return None
    probe_src = ("import os, jax\n"
                 "p = os.environ.get('BLUEST_TPU_PLATFORM', '')\n"
                 "if p:\n"
                 "    jax.config.update('jax_platforms', p)\n"
                 "jax.devices()\n")
    rc = 0
    attempts = 1 + max(int(retries), 0)
    for attempt in range(attempts):
        if attempt:
            _time.sleep(90)
        try:
            rc = subprocess.run(
                [_sys.executable, "-c", probe_src],
                timeout=timeout if attempt == 0 else min(timeout, 120.0),
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return None
    import jax
    # site hooks pin jax_platforms; env vars do not override the pin, so
    # flip the config (and drop any already-initialized backend)
    jax.config.update("jax_platforms", fallback)
    try:
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
    except Exception:  # pragma: no cover - backend not initialized yet
        pass
    return ("default device unavailable (probe rc=%d after %d attempts); "
            "falling back to the %s backend" % (rc, attempts, fallback))


def allocation_device():
    """Device the allocation optimization runs on.

    The MLBLUE allocation problems are tiny (a few hundred variables);
    on accelerator setups with per-dispatch tunnel latency the IPM's
    Python-driven iterations are latency-bound, so they run on the host
    CPU backend by default.  Override with BLUEST_TPU_ALLOC_DEVICE=default
    to keep them on the main device.

    Measured on the real v5e chip (round 4, K=5 HH golden, L=792 via
    tools/ab_profile.py AB_KEEP_PLATFORM=1): the f64 IPM runs 876 ms per
    iteration on the TPU (emulated f64 + remote dispatch) vs ~130 ms on
    the host CPU backend, and the fused program's remote compile costs
    ~13.5 minutes cold -- the CPU default is a 6.7x per-iteration win,
    not a guess.  This also fixes the operative backend for the IPM
    perf knobs: BLUEST_TPU_GONDZIO / BLUEST_TPU_WOOD_PAD defaults cite
    controlled host-backend ABBA data (solvers/sdp.py) because the host
    backend IS where the IPM runs in production.
    """
    import jax
    if os.environ.get("BLUEST_TPU_ALLOC_DEVICE", "cpu") == "cpu":
        try:
            # local, not global: under jax.distributed the global device
            # list leads with process 0's CPU, which is NOT addressable
            # from the other processes -- pinning to it would crash every
            # non-zero process's allocation solve
            cpus = jax.local_devices(backend="cpu")
            if cpus:
                return cpus[0]
        except RuntimeError:
            pass
    return None


import contextlib


@contextlib.contextmanager
def allocation_device_scope():
    """Context form of on_allocation_device."""
    import jax
    dev = allocation_device()
    if dev is None:
        yield
    else:
        with jax.default_device(dev):
            yield


def on_allocation_device(fn):
    """Decorator pinning a function's JAX work to allocation_device()."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import jax
        dev = allocation_device()
        if dev is None:
            return fn(*args, **kwargs)
        with jax.default_device(dev):
            return fn(*args, **kwargs)

    return wrapper


# Threshold below which a correlation is treated as "uncorrelated"
# (reference: blue_models.py:344, blue_models.py:413).
UNCORRELATED_RHO_TOL = 1.0e-7

# Eigenvalue clip used when projecting covariances onto the SPD cone
# (reference: spg_default_params["spd_threshold"], blue_models.py:13).
SPD_THRESHOLD = 5.0e-14
