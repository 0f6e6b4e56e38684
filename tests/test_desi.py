"""End-to-end DESI driver test on a synthetic coadd file."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import DESI_ARMS
from rvspecfit_tpu import simulation
from rvspecfit_tpu.io import fitsio
from rvspecfit_tpu.survey import desi

C_KMS = 299792.458
NFIB = 5


@pytest.fixture(scope='module')
def coadd_file(tmp_path_factory):
    """Synthetic DESI-style coadd: 3 arms, NFIB fibers (last one all
    masked), FIBERMAP."""
    rng = np.random.RandomState(11)
    root = tmp_path_factory.mktemp('coadd')
    truth = dict(vel=rng.uniform(-300, 300, NFIB),
                 teff=rng.uniform(4500, 9500, NFIB),
                 logg=rng.uniform(1.0, 4.5, NFIB),
                 feh=rng.uniform(-1.8, -0.2, NFIB),
                 alpha=rng.uniform(0.1, 0.9, NFIB))
    hdus = [dict(kind='image', data=None)]
    for s, (l0, l1) in DESI_ARMS.items():
        npix = 400
        wave = np.linspace(l0, l1, npix)
        flux = np.zeros((NFIB, npix), np.float32)
        ivar = np.zeros((NFIB, npix), np.float32)
        mask = np.zeros((NFIB, npix), np.int32)
        for i in range(NFIB):
            lam_rest = wave / (1 + truth['vel'][i] / C_KMS)
            sp = simulation.fake_spectrum(
                lam_rest, truth['teff'][i], truth['logg'][i],
                truth['feh'][i], truth['alpha'][i],
                wresol=5000.0 / 2000.0 / 2.35)
            esp = sp / 80.0
            flux[i] = sp + rng.normal(size=npix) * esp
            ivar[i] = 1.0 / esp**2
        mask[NFIB - 1, :] = 1          # fully masked fiber
        flux[1, 100:110] = np.nan      # some bad pixels
        su = s.upper()
        hdus += [dict(kind='image', data=wave, name=f'{su}_WAVELENGTH'),
                 dict(kind='image', data=flux, name=f'{su}_FLUX'),
                 dict(kind='image', data=ivar, name=f'{su}_IVAR'),
                 dict(kind='image', data=mask, name=f'{su}_MASK')]
    fibermap = [
        ('TARGETID', np.arange(NFIB, dtype=np.int64) + 39620000000),
        ('TARGET_RA', rng.uniform(0, 360, NFIB)),
        ('TARGET_DEC', rng.uniform(-30, 30, NFIB)),
        ('FIBER', np.arange(NFIB, dtype=np.int32)),
        ('OBJTYPE', np.array(['TGT'] * NFIB)),
        ('FIBERSTATUS', np.zeros(NFIB, np.int32)),
        ('DESI_TARGET', np.full(NFIB, 2**60, np.int64)),
    ]
    hdus.append(dict(kind='table', data=fibermap, name='FIBERMAP'))
    fname = str(root / 'coadd-test.fits')
    fitsio.write(fname, hdus)
    return fname, truth


def test_desi_fit_end_to_end(coadd_file, desi_library, tmp_path):
    fname, truth = coadd_file
    outdir = str(tmp_path / 'out')
    status = str(tmp_path / 'status.txt')
    desi.main([fname, '--output_dir', outdir,
               '--templ_lib', desi_library,
               '--process_status_file', status,
               '--throw_exceptions'])

    tab_path = os.path.join(outdir, 'rvtab-test.fits')
    mod_path = os.path.join(outdir, 'rvmod-test.fits')
    assert os.path.exists(tab_path) and os.path.exists(mod_path)
    tab = fitsio.read(tab_path)
    rv = tab['RVTAB'].data
    # the fully-masked fiber has S/N = -1e9 and is dropped at
    # selection (same as the reference)
    assert len(rv['VRAD']) == NFIB - 1
    assert 39620000000 + NFIB - 1 not in rv['TARGETID']
    for i in range(NFIB - 1):
        assert abs(rv['VRAD'][i] - truth['vel'][i]) < \
            max(10, 5 * rv['VRAD_ERR'][i]), f'fiber {i}'
        assert abs(rv['TEFF'][i] - truth['teff'][i]) < 1500
    # models present, shaped like the fitted subset
    mod = fitsio.read(mod_path)
    for s in DESI_ARMS:
        m = mod[f'{s.upper()}_MODEL'].data
        assert m.shape[0] == NFIB - 1
    # status file bookkeeping
    with open(status) as fp:
        lines = fp.read().strip().splitlines()
    assert len(lines) == 1 and 'SUCCESS' in lines[0]

    # FIBERMAP subset carried over
    fm = tab['FIBERMAP'].data
    np.testing.assert_array_equal(fm['TARGETID'], rv['TARGETID'])


def test_desi_skipexisting_and_selection(coadd_file, desi_library,
                                         tmp_path):
    fname, truth = coadd_file
    outdir = str(tmp_path / 'out2')
    status = str(tmp_path / 'status2.txt')
    # select one target only
    tid = str(39620000001)
    desi.main([fname, '--output_dir', outdir, '--templ_lib', desi_library,
               '--targetid', tid, '--process_status_file', status,
               '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    assert len(tab['RVTAB'].data['VRAD']) == 1
    # skipexisting: second run marks EXISTING
    desi.main([fname, '--output_dir', outdir, '--templ_lib', desi_library,
               '--skipexisting', '--process_status_file', status,
               '--throw_exceptions'])
    with open(status) as fp:
        assert 'EXISTING' in fp.read()


def test_desi_empty_selection(coadd_file, desi_library, tmp_path):
    fname, _ = coadd_file
    outdir = str(tmp_path / 'out3')
    desi.main([fname, '--output_dir', outdir, '--templ_lib', desi_library,
               '--minsn', '1e9', '--throw_exceptions'])
    tab_path = os.path.join(outdir, 'rvtab-test.fits')
    assert os.path.exists(tab_path)
    tab = fitsio.read(tab_path)
    assert len(tab) == 1  # empty file: primary HDU only
