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
