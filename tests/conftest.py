"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that
numerical golden tests against scipy/numpy are meaningful.  Benchmarks
and production runs use the real TPU backend instead (see bench.py).

These environment variables must be set before jax is imported
anywhere, which pytest guarantees by importing conftest first.
"""
import os

# Force, not setdefault: the surrounding environment may pin a TPU
# platform (e.g. JAX_PLATFORMS=axon) and float32 defaults.  The env
# vars cover the case where jax is not yet imported; the config
# updates below cover the case where a site hook already imported jax
# (but no backend can have been initialized yet at conftest time).
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_ENABLE_X64'] = 'true'
os.environ.setdefault('OMP_NUM_THREADS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
assert jax.devices()[0].platform == 'cpu'
assert len(jax.devices()) == 8, 'expected a virtual 8-device CPU mesh'

# persistent compilation cache: repeated suite runs on this host skip
# XLA recompiles (the AD-Hessian program alone is ~109 s); entries are
# keyed by HLO hash, so code changes can never hit stale programs
from rvspecfit_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

# READ-only cache in the suite process: XLA:CPU's
# executable.serialize() segfaults in long-lived processes once many
# programs have been compiled (observed deterministically at the
# first large-program cache write past ~40 tests, with both stale and
# freshly created cache dirs; the same program serializes fine from a
# short-lived process).  The min-compile-time gate runs BEFORE
# serialize, so raising it suppresses writes without affecting reads.
# tools/seed_test_cache.py populates the cache safely (per-file
# pytest subprocesses, retried — successful writes persist, so each
# retry gets further).
if os.environ.get('RVST_TEST_CACHE_WRITES') != '1':
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1e9)
    # production entry points called in-process (desi.main, prewarm,
    # bench helpers) run enable_compilation_cache() themselves, which
    # would silently re-enable writes mid-suite and trip the abort;
    # this env var makes those calls keep the cache read-only too
    os.environ['RVST_COMPILE_CACHE_READONLY'] = '1'

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SETUP_NAME = 'config1'


@pytest.fixture(scope='session')
def pipeline_library(tmp_path_factory):
    """Full offline pipeline run on a synthetic regular grid:
    FITS templates -> read_grid -> make_interpol -> make_nd
    (--regulargrid) -> make_ccf.  Session-scoped: built once."""
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.io import fitsio
    from rvspecfit_tpu.pipeline import (read_grid, make_interpol, make_nd,
                                        make_ccf)

    root = tmp_path_factory.mktemp('templ_lib')
    specdir = root / 'grid' / 'specs'
    os.makedirs(specdir)
    lam = np.linspace(4500, 5500, 4000)
    i = 0
    for t in np.linspace(4000, 10000, 5):
        for g in np.linspace(0.5, 5.0, 5):
            for f in np.linspace(-2.0, 0.0, 4):
                for a in np.linspace(0.0, 1.0, 3):
                    sp = simulation.fake_spectrum(lam, t, g, f, a)
                    fitsio.write(
                        str(specdir / f'xx_{i:05d}.fits'),
                        [dict(kind='image', data=sp,
                              header=[('PHXTEFF', t, ''),
                                      ('PHXLOGG', g, ''),
                                      ('PHXM_H', f, ''),
                                      ('PHXALPHA', a, '')])])
                    i += 1
    fitsio.write(str(root / 'grid' / 'wave.fits'),
                 [dict(kind='image', data=lam)])

    db = str(root / 'files.db')
    outdir = str(root / 'templ_data')
    read_grid.main(['--prefix', str(root / 'grid'), '--templdb', db,
                    '--glob_mask', 'specs/*fits'])
    make_interpol.main([
        '--setup', SETUP_NAME, '--lambda0', '4600', '--lambda1', '5400',
        '--resol', '1000', '--step', '1.0', '--templdb', db,
        '--templprefix', str(root / 'grid'),
        '--wavefile', str(root / 'grid' / 'wave.fits'),
        '--oprefix', outdir, '--float_bits', '64'])
    make_nd.main(['--prefix', outdir, '--setup', SETUP_NAME,
                  '--regulargrid'])
    make_ccf.main(['--prefix', outdir, '--oprefix', outdir,
                   '--setup', SETUP_NAME, '--lambda0', '4600',
                   '--lambda1', '5400', '--step', '1.0', '--every', '2'])
    return outdir


DESI_ARMS = {'b': (4620.0, 4880.0), 'r': (4880.0, 5140.0),
             'z': (5140.0, 5390.0)}


@pytest.fixture(scope='session')
def desi_library(tmp_path_factory):
    """Small 3-setup (desi_b/r/z) template library built through the
    full offline pipeline, for the DESI driver tests."""
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.io import fitsio
    from rvspecfit_tpu.pipeline import (read_grid, make_interpol, make_nd,
                                        make_ccf)

    root = tmp_path_factory.mktemp('desi_lib')
    specdir = root / 'grid' / 'specs'
    os.makedirs(specdir)
    lam = np.linspace(4500, 5500, 3000)
    i = 0
    for t in np.linspace(4200, 9800, 4):
        for g in np.linspace(0.5, 5.0, 4):
            for f in np.linspace(-2.0, 0.0, 3):
                for a in np.linspace(0.0, 1.0, 2):
                    sp = simulation.fake_spectrum(lam, t, g, f, a)
                    fitsio.write(
                        str(specdir / f'xx_{i:05d}.fits'),
                        [dict(kind='image', data=sp,
                              header=[('PHXTEFF', t, ''),
                                      ('PHXLOGG', g, ''),
                                      ('PHXM_H', f, ''),
                                      ('PHXALPHA', a, '')])])
                    i += 1
    fitsio.write(str(root / 'grid' / 'wave.fits'),
                 [dict(kind='image', data=lam)])
    db = str(root / 'files.db')
    outdir = str(root / 'templ_data')
    read_grid.main(['--prefix', str(root / 'grid'), '--templdb', db,
                    '--glob_mask', 'specs/*fits'])
    for s, (l0, l1) in DESI_ARMS.items():
        make_interpol.main([
            '--setup', f'desi_{s}', '--lambda0', str(l0 - 10),
            '--lambda1', str(l1 + 10), '--resol', '2000', '--step', '0.6',
            '--templdb', db, '--templprefix', str(root / 'grid'),
            '--wavefile', str(root / 'grid' / 'wave.fits'),
            '--oprefix', outdir, '--float_bits', '64'])
        make_nd.main(['--prefix', outdir, '--setup', f'desi_{s}',
                      '--regulargrid'])
        make_ccf.main(['--prefix', outdir, '--oprefix', outdir,
                       '--setup', f'desi_{s}', '--lambda0', str(l0 - 5),
                       '--lambda1', str(l1 + 5), '--step', '0.6',
                       '--every', '2'])
    return outdir
