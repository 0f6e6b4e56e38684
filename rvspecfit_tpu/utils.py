"""Configuration system and batch-orchestration utilities.

Equivalent of the reference config/ops glue (py/rvspecfit/utils.py):
YAML config -> defaults merge -> frozen mapping, plus the shared-
filesystem work queue used for multi-host batch runs.  The MPI task
farm of the reference maps, on TPU, to per-host file sharding over a
jax.distributed world (see parallel/mesh.py); the lock-file queue is
kept for HPC filesystem interop.
"""
from __future__ import annotations

import logging
import os
import socket
import time

import numpy as np
import yaml

from rvspecfit_tpu.frozendict import frozendict


def honor_jax_platforms_env():
    """Mirror ``JAX_PLATFORMS`` into jax.config (idempotent).

    Site hooks that pre-import jax pin the platform before the
    process' environment can take effect — once jax is in
    sys.modules, the env var alone is ignored, and a driver launched
    with ``JAX_PLATFORMS=cpu`` would still try to initialize the
    pinned TPU backend (and hang when the tunnel is down).  Every
    production entry point calls this right after argument parsing.
    """
    plat = os.environ.get('JAX_PLATFORMS')
    if not plat:
        return
    try:
        import jax
        jax.config.update('jax_platforms', plat)
    except Exception as exc:
        logging.warning('could not set jax platform %r: %s', plat, exc)


def _host_cpu_fingerprint():
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU executables are feature-specific, but JAX's persistent
    cache key does not fully capture the host CPU: on VMs that migrate
    between physical hosts, entries compiled elsewhere load with
    "fewer features than detected" SIGILL warnings, and fresh
    ``executable.serialize()`` calls were observed to SIGABRT after
    enough foreign entries had been deserialized.  Scoping the cache
    directory by CPU fingerprint keeps each host family's executables
    separate (stale families are simply orphaned).
    """
    try:
        import hashlib
        with open('/proc/cpuinfo') as fp:
            for line in fp:
                if line.startswith('flags'):
                    flags = ' '.join(sorted(line.split(':', 1)[1]
                                            .split()))
                    return hashlib.md5(
                        flags.encode()).hexdigest()[:10]
    except Exception:
        pass
    import platform
    return platform.machine() or 'unknown'


def enable_compilation_cache(cache_dir=None):
    """Point JAX at a persistent compilation cache (idempotent).

    Every production entry point calls this: multi-process fleets
    (lock-queue consumers, per-rank shards) relaunch the same programs
    constantly, and on remote-compile TPU backends each program pays
    tens of seconds — with the cache, only the first process ever
    compiles.  Default location is ``<repo>/.jax_cache/<cpu-fp>``
    (shared with bench.py; see _host_cpu_fingerprint for why the CPU
    fingerprint subdirectory exists); override with
    ``RVST_COMPILE_CACHE`` (``=0`` or ``=off`` disables).
    """
    env = os.environ.get('RVST_COMPILE_CACHE')
    if env in ('0', 'off'):
        return False
    if cache_dir is None:
        cache_dir = env or os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.jax_cache')
        cache_dir = os.path.join(cache_dir, _host_cpu_fingerprint())
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # RVST_COMPILE_CACHE_READONLY=1: point at the cache but never
        # write (XLA:CPU's executable.serialize() aborts in long-lived
        # many-program processes — the pytest suite sets this so
        # production entry points called in-process, e.g. desi.main,
        # cannot re-enable writes and trip the abort; see
        # tests/conftest.py and tools/seed_test_cache.py)
        if os.environ.get('RVST_COMPILE_CACHE_READONLY') == '1':
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs', 1e9)
        else:
            jax.config.update(
                'jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
        return True
    except Exception as exc:
        logging.warning('compilation cache unavailable: %s', exc)
        return False


def get_default_config():
    """Default fit configuration (keys mirror the reference semantics,
    reference: py/rvspecfit/utils.py:9-28)."""
    return {
        'min_vel': -1000,
        'max_vel': 1000,
        'vel_step0': 5,
        'max_vsini': 500,
        'min_vsini': 1e-2,
        'min_vel_step': 0.2,
        'second_minimizer': True,
        'template_lib': 'templ_data/',
    }


def freeze(obj):
    """Recursively freeze dicts -> frozendict, lists -> tuples."""
    if isinstance(obj, dict):
        return frozendict({k: freeze(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return tuple(freeze(v) for v in obj)
    return obj


def read_config(fname=None, override_options=None):
    """Read a YAML config, fill defaults, apply overrides, freeze.

    Returns a frozendict usable as a static jit argument / cache key.
    """
    fname_specified = fname is not None
    if fname is None:
        fname = 'config.yaml'
    if os.path.exists(fname):
        with open(fname) as fp:
            conf = yaml.safe_load(fp)
        if conf is None:
            conf = {}
            logging.warning('Configuration file %s is empty; using defaults',
                            fname)
    else:
        if fname_specified:
            raise RuntimeError(f"Configuration file '{fname}' not found.")
        logging.warning("Configuration file '%s' not found; using defaults",
                        fname)
        conf = {}
    for k, v in get_default_config().items():
        conf.setdefault(k, v)
    conf['config_file_path'] = os.path.abspath(fname)
    if override_options:
        for k, v in override_options.items():
            if k in conf and conf[k] != v:
                logging.warning('Option %s overrides the config-file value', k)
            conf[k] = v
    return freeze(conf)


class FileQueue:
    """Iterator over input files: list, file, or shared lock-file queue.

    In queue mode the text file itself is the shared work queue:
    popping is made atomic across processes/hosts on a shared
    filesystem by renaming the file to a per-consumer lock name,
    removing the first line, and renaming it back
    (reference semantics: py/rvspecfit/utils.py:113-177).
    """

    def __init__(self, file_list=None, file_from=None, queue=False):
        self.file_from = None
        self.queue = False
        if file_list is not None:
            self.file_list = list(file_list)
        elif file_from is not None:
            if not queue:
                with open(file_from) as fp:
                    self.file_list = [ln.rstrip('\n') for ln in fp
                                      if ln.strip()]
            else:
                self.file_list = None
                self.file_from = file_from
                self.queue = True
        else:
            raise ValueError('provide file_list or file_from')

    def __iter__(self):
        return self

    def __next__(self):
        if self.file_list is not None:
            if self.file_list:
                return self.file_list.pop(0)
            raise StopIteration
        return self._pop_locked()

    def _pop_locked(self):
        lockname = '%s.%s.%d.lock' % (self.file_from, socket.gethostname(),
                                      os.getpid())
        wait = 1.0
        for _ in range(1000):
            try:
                os.rename(self.file_from, lockname)
            except FileNotFoundError:
                time.sleep(np.random.uniform(wait, 1.5 * wait))
                continue
            try:
                with open(lockname) as fp:
                    lines = fp.readlines()
                if not lines:
                    raise StopIteration
                ret = lines[0].rstrip('\n')
                with open(lockname, 'w') as fp:
                    fp.writelines(lines[1:])
                return ret
            finally:
                os.rename(lockname, self.file_from)
        logging.warning('Could not acquire the queue-file lock')
        raise StopIteration

    def shutdown(self):
        pass


class ShardedFileQueue:
    """Static round-robin sharding of a file list across hosts.

    The TPU-native replacement for the reference's MPI dynamic task
    farm: with independent per-file work there is no need for a
    central server — each host of a jax.distributed world takes
    files[rank::world] deterministically.
    """

    def __init__(self, file_list, rank=None, world=None):
        if rank is None:
            rank = int(os.environ.get('RVS_TPU_RANK', '0'))
        if world is None:
            world = int(os.environ.get('RVS_TPU_WORLD', '1'))
        self.files = list(file_list)[rank::max(world, 1)]

    def __iter__(self):
        return iter(self.files)

    def shutdown(self):
        pass
