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
    # sync_global_devices reduces over jax.devices(): when every rank
    # is pinned to its own local backend it sees only its own devices
    # and the "barrier" passes trivially — which lets the fastest rank
    # trip jax.distributed.shutdown()'s internal deadline and kill the
    # world.  Fail loudly instead of pretending to synchronize.
    if jax.device_count() == jax.local_device_count():
        raise RuntimeError(
            'multi-host barrier unavailable: the private jax '
            'coordination API (jax._src.distributed.global_state) has '
            'changed in jax %s and the sync_global_devices fallback '
            'cannot synchronize process-pinned local backends. '
            'Pin a jax version with the coordination client, or run '
            'ranks independently (static --rank/--world sharding with '
            'no end-of-run barrier).' % jax.__version__)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def _kv_client():
    """Coordination-service client, or None when the private API has
    moved or no world is initialized."""
    try:
        from jax._src.distributed import global_state
        return global_state.client
    except Exception:
        return None


class CoordinatedFileQueue:
    """Dynamic cross-host work distribution without a shared
    filesystem — the reference MPIFileQueue's task-farm semantics
    (reference: py/rvspecfit/utils.py:180-318) on the jax.distributed
    coordination service instead of an MPI server thread.

    Every rank holds the same ordered file list; a rank CLAIMS the
    next unclaimed item only when it is ready to process it, through a
    first-writer-wins key in the coordination-service key-value store.
    A slow file therefore delays only its own rank and fast ranks
    drain the tail — the dynamic balance that static
    ``files[rank::world]`` sharding loses, with no server thread and
    no shared filesystem (utils.FileQueue's lock-queue needs one).

    Requires an initialized multi-process jax.distributed world and
    the coordination client; raises RuntimeError otherwise so callers
    can fall back to static sharding.
    """

    _GUIDANCE = ('the private jax coordination API '
                 '(jax._src.distributed.global_state) has likely '
                 'changed in this jax version; re-run without '
                 '--dynamic_queue (static --rank/--world sharding) or '
                 'use the lock-file --queue_file mode on a shared '
                 'filesystem')

    def __init__(self, file_list, name='rvst_cq'):
        import jax

        if jax.process_count() <= 1:
            raise RuntimeError('CoordinatedFileQueue needs a '
                               'multi-process jax.distributed world')
        client = _kv_client()
        if client is None:
            raise RuntimeError(
                'coordination-service client unavailable in jax %s: %s'
                % (jax.__version__, self._GUIDANCE))
        self._client = client
        self._list = list(file_list)
        self._rank = jax.process_index()
        self._name = name
        # capability probe: write + read back a rank-unique key NOW so
        # an incompatible KV binding fails here with guidance instead
        # of quietly starving this rank of all work at claim time
        probe = f'{name}/probe_{self._rank}'
        try:
            client.key_value_set(probe, 'ok')
            got = client.blocking_key_value_get(probe, 10000)
        except Exception as exc:
            raise RuntimeError(
                'coordination-service key-value store failed its '
                'capability probe under jax %s: %s'
                % (jax.__version__, self._GUIDANCE)) from exc
        if got != 'ok':
            raise RuntimeError(
                'coordination-service probe read back %r (expected '
                "'ok') under jax %s: %s"
                % (got, jax.__version__, self._GUIDANCE))

    def _try_claim(self, i):
        key = f'{self._name}/{i}'
        val = str(self._rank)
        try:
            self._client.key_value_set(key, val, allow_overwrite=False)
            return True
        except TypeError:
            # older binding without allow_overwrite: plain set is
            # itself first-writer-wins (raises on duplicate keys)
            try:
                self._client.key_value_set(key, val)
                return True
            except Exception:
                pass
        except Exception:
            pass
        # the set failed: distinguish "another rank claimed it first"
        # (normal) from a broken API (which would otherwise silently
        # return False for EVERY item and starve this rank)
        try:
            owner = self._client.blocking_key_value_get(key, 10000)
        except Exception as exc:
            raise RuntimeError(
                'claim of %r failed and the key cannot be read back — '
                '%s' % (key, self._GUIDANCE)) from exc
        # owner == val: our set actually landed despite the exception
        return owner == val

    def __iter__(self):
        for i, f in enumerate(self._list):
            if self._try_claim(i):
                logging.info('claimed work item %d (%s)', i, f)
                yield f

    def shutdown(self):
        pass


def shutdown():
    import jax

    if jax.process_count() > 1:
        jax.distributed.shutdown()
