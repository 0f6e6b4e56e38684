"""Multi-host work-distribution primitives (parallel/distributed.py).

The CoordinatedFileQueue is the dynamic-balance replacement for the
reference's MPI task farm (reference: py/rvspecfit/utils.py:180-318):
ranks claim items through the jax.distributed coordination service's
key-value store, first writer wins.  The real two-process behavior is
exercised here with subprocess workers sharing a coordinator.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys, time
import jax
rank = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                           num_processes=2, process_id=rank)
from rvspecfit_tpu.parallel import distributed
items = [f'item{i}' for i in range(8)]
q = distributed.CoordinatedFileQueue(items, name='testq')
claimed = []
for it in q:
    claimed.append(it)
    # rank 1 is slow: rank 0 must drain the tail (dynamic balance)
    time.sleep(1.0 if rank == 1 else 0.02)
with open(os.path.join(outdir, f'claims_{rank}.txt'), 'w') as fp:
    fp.write('\n'.join(claimed))
distributed.barrier('testq_done')
jax.distributed.shutdown()
"""


def test_coordinated_queue_two_process(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(2):
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _WORKER, str(rank), str(port),
             str(tmp_path)], env=env, cwd=repo))
    for p in procs:
        assert p.wait(timeout=300) == 0

    claims = {}
    for rank in range(2):
        with open(tmp_path / f'claims_{rank}.txt') as fp:
            claims[rank] = [ln for ln in fp.read().splitlines() if ln]
    allc = claims[0] + claims[1]
    # exactly-once claiming: disjoint union covers every item
    assert sorted(allc) == [f'item{i}' for i in range(8)]
    assert not set(claims[0]) & set(claims[1])
    # dynamic balance: the fast rank drains the tail the slow rank
    # never gets to (static rank::world sharding would give 4/4)
    assert len(claims[0]) >= 5, claims


def test_coordinated_queue_requires_world():
    """Outside a multi-process world the queue refuses (callers fall
    back to static sharding)."""
    from rvspecfit_tpu.parallel import distributed
    with pytest.raises(RuntimeError):
        distributed.CoordinatedFileQueue(['a', 'b'])
