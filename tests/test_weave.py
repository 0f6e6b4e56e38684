"""End-to-end WEAVE driver test on synthetic red+blue files."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rvspecfit_tpu import simulation
from rvspecfit_tpu.io import fitsio
from rvspecfit_tpu.pipeline import read_grid, make_interpol, make_nd, \
    make_ccf
from rvspecfit_tpu.survey import weave

C_KMS = 299792.458
ARMS = {'b': (4620.0, 4950.0), 'r': (4950.0, 5390.0)}
NFIB = 3


@pytest.fixture(scope='module')
def weave_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('weave')
    specdir = root / 'grid' / 'specs'
    os.makedirs(specdir)
    lam = np.linspace(4500, 5500, 2500)
    i = 0
    for t in np.linspace(4200, 9800, 4):
        for g in np.linspace(0.5, 5.0, 3):
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
    lib = str(root / 'templ_data')
    read_grid.main(['--prefix', str(root / 'grid'), '--templdb', db,
                    '--glob_mask', 'specs/*fits'])
    for s, (l0, l1) in ARMS.items():
        make_interpol.main([
            '--setup', f'weave_{s}', '--lambda0', str(l0 - 10),
            '--lambda1', str(l1 + 10), '--resol', '2000', '--step', '0.7',
            '--templdb', db, '--templprefix', str(root / 'grid'),
            '--wavefile', str(root / 'grid' / 'wave.fits'),
            '--oprefix', lib, '--float_bits', '64'])
        make_nd.main(['--prefix', lib, '--setup', f'weave_{s}',
                      '--regulargrid'])
        make_ccf.main(['--prefix', lib, '--oprefix', lib,
                       '--setup', f'weave_{s}', '--lambda0', str(l0 - 5),
                       '--lambda1', str(l1 + 5), '--step', '0.7',
                       '--every', '2'])

    # synthetic red + blue exposure files
    rng = np.random.RandomState(5)
    truth_vel = rng.uniform(-250, 250, NFIB)
    fnames = []
    for s, cam in (('r', 'RED'), ('b', 'BLUE')):
        l0, l1 = ARMS[s]
        npix = 380
        wave = np.linspace(l0, l1, npix)
        flux = np.zeros((NFIB, npix), np.float32)
        ivar = np.zeros((NFIB, npix), np.float32)
        for i in range(NFIB):
            lam_rest = wave / (1 + truth_vel[i] / C_KMS)
            sp = simulation.fake_spectrum(lam_rest, 6200.0, 3.0, -0.7,
                                          0.4, wresol=5000 / 2000 / 2.35)
            esp = sp / 60.0
            flux[i] = sp + rng.normal(size=npix) * esp
            ivar[i] = 1.0 / esp**2
        cd = wave[1] - wave[0]
        hd = [('CAMERA', f'WEAVE{cam}', ''), ('OBID', 'test_ob.01', ''),
              ('CRVAL1', wave[0] * 1e-10, ''), ('CD1_1', cd * 1e-10, ''),
              ('CRPIX1', 1.0, ''), ('CUNIT1', 'm', '')]
        fib = [('TARGID', np.array([f'star_{i}' for i in range(NFIB)])),
               ('TARGCAT', np.array(['GA_LRhighlat'] * NFIB))]
        fname = str(root / f'single_{cam}.fits')
        fitsio.write(fname, [
            dict(kind='image', data=None, header=hd),
            dict(kind='image', data=flux, name=f'{cam}_DATA', header=hd),
            dict(kind='image', data=ivar, name=f'{cam}_IVAR'),
            dict(kind='table', data=fib, name='FIBTABLE')])
        fnames.append(fname)
    return lib, fnames, truth_vel


def test_weave_fit(weave_setup, tmp_path):
    lib, fnames, truth_vel = weave_setup
    outdir = str(tmp_path / 'out')
    weave.main([','.join(fnames), '--oprefix', outdir,
                '--templ_lib', lib, '--npoly', '8'])
    outs = [f for f in os.listdir(outdir) if f.startswith('outtab')]
    assert len(outs) == 1
    tab = fitsio.read(os.path.join(outdir, outs[0]))['WEAVE_RV'].data
    assert len(tab['vrad']) == NFIB
    for i in range(NFIB):
        assert abs(tab['vrad'][i] - truth_vel[i]) < \
            max(10, 5 * tab['vrad_err'][i]), f'fiber {i}'
    assert set(np.char.strip(tab['target_id'].astype(str))) == \
        {f'star_{i}' for i in range(NFIB)}

    # second run without --overwrite skips the existing product and
    # records it in the status file (reference weave_fit.py:295-297)
    status = str(tmp_path / 'status_%d.txt')
    weave.main([','.join(fnames), '--oprefix', outdir,
                '--templ_lib', lib, '--npoly', '8',
                '--process_status_file', status])
    lines = open(str(tmp_path / 'status_0.txt')).read().split('\n')
    assert 'SKIPPED' in lines[0]

    # --overwrite reprocesses and reports SUCCESS with the fiber count;
    # reference-style --output_dir/--figure_dir flags + per-fiber plots
    figdir = str(tmp_path / 'figs')
    weave.main([','.join(fnames), '--output_dir', outdir,
                '--templ_lib', lib, '--npoly', '8', '--overwrite',
                '--doplot', '--figure_dir', figdir,
                '--process_status_file', status])
    lines = open(str(tmp_path / 'status_0.txt')).read().split('\n')
    assert 'SUCCESS' in lines[0] and f' {NFIB} ' in lines[0]
    figs = [f for f in os.listdir(figdir) if f.endswith('.png')]
    assert len(figs) == NFIB
