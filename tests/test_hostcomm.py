"""Unit tests for the HostComm mini-communicator (parallel/hostcomm.py):
collective semantics across real processes, independent of the sampling
engine integration (covered in test_problem_e2e)."""

import multiprocessing as mp

import numpy as np

from bluest_tpu.parallel.hostcomm import HostComm, make_group_comms


def _member(comm, outq):
    r = comm.rank
    # SPMD order: bcast, gather, allgather, allreduce, barrier
    v = comm.bcast("hello" if r == 0 else None, root=0)
    g = comm.gather(r * r, root=0)
    ag = comm.allgather(r + 10)
    s = comm.allreduce(float(r + 1))
    m = comm.allreduce(np.full(2, r + 1.0))
    comm.barrier()
    outq.put((r, v, g, ag, s, m))


def test_hostcomm_collectives():
    ctx = mp.get_context("spawn")
    size = 3
    comms = make_group_comms(size, ctx)
    outq = ctx.Queue()
    procs = [ctx.Process(target=_member, args=(comms[r], outq))
             for r in range(size)]
    for p in procs:
        p.start()
    out = {}
    for _ in range(size):
        r, v, g, ag, s, m = outq.get(timeout=120)
        out[r] = (v, g, ag, s, m)
    for p in procs:
        p.join()

    for r in range(size):
        v, g, ag, s, m = out[r]
        assert v == "hello"
        assert ag == [10, 11, 12]
        assert s == 6.0
        np.testing.assert_allclose(m, [6.0, 6.0])
    assert out[0][1] == [0, 1, 4]          # gather lands on root only
    assert out[1][1] is None and out[2][1] is None


def test_hostcomm_size_one():
    comm = make_group_comms(1, mp.get_context("spawn"))[0]
    assert comm.Get_rank() == 0 and comm.Get_size() == 1
    assert comm.bcast(42) == 42
    assert comm.gather(7) == [7]
    assert comm.allgather(7) == [7]
    assert comm.allreduce(7) == 7


def test_size_one_comm_collectives_noop():
    """A size-1 comm (model_workers=1) must support every collective the
    README tells users to call, including barrier (ADVICE r2)."""
    from bluest_tpu.parallel.hostcomm import make_group_comms
    (comm,) = make_group_comms(1, None)
    comm.barrier()
    comm.Barrier()
    assert comm.bcast(42) == 42
    assert comm.gather(7) == [7]
    assert comm.allgather(3) == [3]
    assert comm.allreduce(5) == 5


def _member_large(comm, outq):
    r = comm.rank
    # > _SHM_THRESHOLD_BYTES: exercises the shared-memory payload path
    big = np.arange(100_000, dtype=np.float64) + 1000.0 * r
    got = comm.bcast(big if r == 0 else None, root=0)
    red = comm.allreduce(big)
    gat = comm.gather(big[:3].copy(), root=0)
    outq.put((r, float(got.sum()), float(red[0]), gat))


def test_hostcomm_shm_large_arrays():
    """Large ndarray payloads move through POSIX shared memory instead of
    queue pickling; collective results must be identical."""
    import multiprocessing as _mp
    ctx = _mp.get_context("spawn")
    size = 2
    comms = make_group_comms(size, ctx)
    outq = ctx.Queue()
    procs = [ctx.Process(target=_member_large, args=(comms[r], outq))
             for r in range(size)]
    for p in procs:
        p.start()
    out = {}
    for _ in range(size):
        r, s, red0, gat = outq.get(timeout=120)
        out[r] = (s, red0, gat)
    for p in procs:
        p.join()
    ref = np.arange(100_000, dtype=np.float64)
    for r in range(size):
        assert out[r][0] == ref.sum()                 # bcast from rank 0
        assert out[r][1] == 0.0 + (0.0 + 1000.0)      # allreduce elem 0
    g = out[0][2]
    np.testing.assert_array_equal(g[0], ref[:3])
    np.testing.assert_array_equal(g[1], ref[:3] + 1000.0)


def test_shm_wrap_roundtrip_and_small_passthrough():
    from bluest_tpu.parallel.hostcomm import (_shm_wrap, _shm_unwrap,
                                              _ShmHandle)
    small = np.arange(10.0)
    assert _shm_wrap(small) is small                  # below threshold
    big = np.random.default_rng(0).standard_normal((64, 1024))
    h = _shm_wrap(big)
    assert isinstance(h, _ShmHandle)
    back = _shm_unwrap(h)
    np.testing.assert_array_equal(back, big)
    # object dtype must never take the shm path
    objarr = np.array([None] * 100_000, dtype=object)
    assert _shm_wrap(objarr) is objarr


def test_gather_root_slot_is_a_copy():
    """gather must not alias the root's own payload: mpi4py pickles every
    slot, so `snap = comm.gather(u)` followed by in-place updates of `u`
    must leave the snapshot untouched on every rank."""
    (comm,) = make_group_comms(1, None)
    u = np.arange(3.0)
    snap = comm.gather(u)
    u += 100.0
    np.testing.assert_array_equal(snap[0], [0.0, 1.0, 2.0])


def test_drain_stranded_shm_unlinks_segments():
    """A large payload stranded in a group queue (its receiver was
    terminated before recv) must be unlinked by drain_stranded_shm, not
    leak /dev/shm until reboot."""
    from multiprocessing import shared_memory
    from bluest_tpu.parallel.hostcomm import (_shm_wrap, _ShmHandle,
                                              drain_stranded_shm)
    ctx = mp.get_context("spawn")
    comms = make_group_comms(2, ctx)
    big = np.zeros(100_000)
    handle = _shm_wrap(big)
    assert isinstance(handle, _ShmHandle)
    # simulate an aborted run: the payload sits unconsumed in 0->1
    comms[0]._q[0][1].put(handle)
    # also a nested container with a second segment, on the other queue
    handle2 = _shm_wrap([big + 1.0, "meta"])
    comms[0]._q[1][0].put(handle2)
    drain_stranded_shm([comms, None, make_group_comms(1, None)])
    for name in (handle.name, handle2[0].name):
        try:
            shm = shared_memory.SharedMemory(name=name)
        except FileNotFoundError:
            continue
        shm.close()
        shm.unlink()
        raise AssertionError("segment %s leaked past drain" % name)


def test_namedtuple_payload_roundtrip():
    """tuple SUBCLASSES (namedtuples) must take the plain pickle path --
    rebuilding them from a generator crashes (max-review finding)."""
    import collections
    from bluest_tpu.parallel.hostcomm import _shm_wrap, _shm_unwrap
    NT = collections.namedtuple("NT", ["a", "b"])
    nt = NT(np.arange(3.0), "x")
    assert _shm_wrap(nt) is nt
    assert _shm_unwrap(nt) is nt
    # plain containers still recurse
    big = np.zeros(100_000)
    w = _shm_wrap([big, "meta"])
    assert not isinstance(w[0], np.ndarray)
    out = _shm_unwrap(w)
    np.testing.assert_array_equal(out[0], big)
    assert out[1] == "meta"
