"""Opt-in multi-host world initialization.

The reference distributes files across hosts with an MPI task farm
(reference: py/rvspecfit/utils.py:180-318 MPIFileQueue).  The
TPU-native replacement is: a ``jax.distributed`` world (coordinator +
N processes over DCN), static per-rank file sharding
(utils.ShardedFileQueue) or the lock-file queue for dynamic balance,
and per-rank log/status files (``%d`` substitution in the drivers).
Fits are independent per object, so no collective ever crosses hosts
inside a fit; the world exists for device discovery, rank/size
derivation, and the end-of-run barrier.

Drivers call :func:`init_distributed` when ``--coordinator`` is given
(or the standard JAX env vars are set); single-host runs never touch
jax.distributed.
"""
from __future__ import annotations

import logging
import os


def init_distributed(coordinator=None, num_processes=None,
                     process_id=None):
    """Initialize the jax.distributed world (idempotent, opt-in).

    Parameters may come from the caller or from the environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID —
    the standard jax.distributed variables).  Returns
    (process_id, num_processes); (0, 1) when nothing was configured.
    """
    import jax

    coordinator = coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS')
    if num_processes is None:
        env = os.environ.get('JAX_NUM_PROCESSES')
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get('JAX_PROCESS_ID')
        process_id = int(env) if env else None
    if not coordinator:
        return 0, 1
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    pid = jax.process_index()
    nproc = jax.process_count()
    logging.info('jax.distributed world up: process %d of %d '
                 '(coordinator %s)', pid, nproc, coordinator)
    return pid, nproc


def barrier(name='rvspecfit_tpu_barrier', timeout_ms=None):
    """Cross-host sync point (no-op in a single-process world).

    Uses the coordination-service barrier, which blocks on *processes*
    — NOT ``multihost_utils.sync_global_devices``, which reduces over
    ``jax.devices()`` and passes trivially when each rank is pinned to
    its own local backend (e.g. ``JAX_PLATFORMS=cpu`` ranks see one
    device each).  A trivial pre-shutdown barrier lets the fastest
    rank reach ``jax.distributed.shutdown()``'s ~5-minute internal
    barrier while slow ranks are still fitting, and the coordination
    service then kills the whole world (observed on the 2-rank
    integration test).  Timeout defaults to 6 h
    (``RVST_BARRIER_TIMEOUT_MS`` overrides) — end-of-run skew between
    ranks is bounded by one file's fit time, not by the exposure.
    """
    import jax

    if jax.process_count() <= 1:
        return
    if timeout_ms is None:
        timeout_ms = int(os.environ.get('RVST_BARRIER_TIMEOUT_MS',
                                        6 * 3600 * 1000))
    try:
        from jax._src.distributed import global_state
        client = global_state.client
    except Exception as exc:  # private API moved — fall back
        logging.warning('coordination client unavailable (%s); '
                        'falling back to sync_global_devices', exc)
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_ms))
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def shutdown():
    import jax

    if jax.process_count() > 1:
        jax.distributed.shutdown()
