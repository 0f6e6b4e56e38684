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
    # SCORES: per-arm median S/N (~80, from the snr used above);
    # -1e9 for the fully-masked fiber so selection drops it the same
    # way the computed-S/N path does
    snr = np.full(NFIB, 80.0)
    snr[NFIB - 1] = -1e9
    hdus.append(dict(kind='table', name='SCORES', data=[
        ('MEDIAN_CALIB_SNR_' + s.upper(), snr) for s in DESI_ARMS]))
    # EXP_FIBERMAP: two exposures per target
    tids = np.arange(NFIB, dtype=np.int64) + 39620000000
    hdus.append(dict(kind='table', name='EXP_FIBERMAP', data=[
        ('TARGETID', np.repeat(tids, 2)),
        ('EXPID', np.tile(np.array([101, 102], np.int64), NFIB)),
    ]))
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

    # SCORES + EXP_FIBERMAP passthrough, subset to fitted fibers
    sc = tab['SCORES'].data
    assert len(sc['MEDIAN_CALIB_SNR_B']) == NFIB - 1
    np.testing.assert_allclose(sc['MEDIAN_CALIB_SNR_B'], 80.0)
    ef = tab['EXP_FIBERMAP'].data
    assert set(ef['TARGETID']) == set(rv['TARGETID'])
    assert len(ef['TARGETID']) == 2 * (NFIB - 1)

    # S/N columns come from SCORES
    np.testing.assert_allclose(rv['SN_B'], 80.0)

    # CCF-stage parameter columns present
    for col in ('VRAD_CCF', 'TEFF_CCF', 'LOGG_CCF', 'FEH_CCF',
                'ALPHAFE_CCF', 'VSINI_CCF', 'CHISQ_CCF'):
        assert col in rv, col
    assert np.isfinite(rv['CHISQ_CCF']).all()

    # units + descriptions on the RVTAB columns
    hdr = tab['RVTAB'].header
    ttypes = {str(hdr[f'TTYPE{i}']): i
              for i in range(1, int(hdr['TFIELDS']) + 1)}
    assert hdr.get(f'TUNIT{ttypes["VRAD"]}') == 'km/s'
    assert hdr.get(f'TUNIT{ttypes["TEFF"]}') == 'K'


def test_desi_fitarm(coadd_file, desi_library, tmp_path):
    """--fitarm restricts which arms are fitted
    (reference: desi_fit.py:1032-1033)."""
    fname, truth = coadd_file
    outdir = str(tmp_path / 'outarm')
    desi.main([fname, '--output_dir', outdir,
               '--templ_lib', desi_library, '--fitarm', 'b,r',
               '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    rv = tab['RVTAB'].data
    assert 'CHISQ_B' in rv and 'CHISQ_R' in rv
    assert 'CHISQ_Z' not in rv
    mod = fitsio.read(os.path.join(outdir, 'rvmod-test.fits'))
    assert 'B_MODEL' in mod and 'Z_MODEL' not in mod
    for i in range(NFIB - 1):
        assert abs(rv['VRAD'][i] - truth['vel'][i]) < \
            max(12, 5 * rv['VRAD_ERR'][i]), f'fiber {i}'


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


def _gauss_band(sigma_pix, width, npix):
    """dia-convention banded Gaussian resolution matrix
    (offsets +w2..-w2), column-normalized."""
    w2 = width // 2
    offs = np.arange(w2, -w2 - 1, -1)
    band = np.exp(-0.5 * (offs / sigma_pix)**2)[:, None] * \
        np.ones((width, npix))
    # normalize each COLUMN of the dense matrix: dense[i, j] =
    # band[k, j] for i = j + offs[k], so column j sums over valid k
    dense = np.zeros((npix, npix))
    for k, o in enumerate(offs):
        idx = np.arange(max(0, -o), min(npix, npix - o))
        dense[idx + o, idx] = band[k, idx]
    dense /= dense.sum(axis=0, keepdims=True)
    out = np.zeros((width, npix))
    for k, o in enumerate(offs):
        idx = np.arange(max(0, -o), min(npix, npix - o))
        out[k, idx] = dense[idx + o, idx]
    return out


@pytest.fixture(scope='module')
def coadd_resolution_file(tmp_path_factory):
    """Synthetic coadd WITH per-fiber RESOLUTION extensions: each
    fiber's spectrum is smeared to its own LSF width, wider than the
    template library's (the DESI production mode,
    reference CI: tests/scripts/desi_fit.sh:10-13)."""
    rng = np.random.RandomState(21)
    root = tmp_path_factory.mktemp('coadd_res')
    nfib = 4
    truth = dict(vel=rng.uniform(-250, 250, nfib),
                 teff=rng.uniform(4800, 9000, nfib),
                 logg=rng.uniform(1.5, 4.5, nfib),
                 feh=rng.uniform(-1.5, -0.3, nfib),
                 alpha=rng.uniform(0.2, 0.8, nfib))
    # per-fiber LSF sigma in angstrom (template library: resol 2000
    # at ~5000 A -> sigma0 ~ 1.06 A); data are broader
    sigmas = np.linspace(1.25, 1.6, nfib)
    width = 11
    hdus = [dict(kind='image', data=None)]
    for s, (l0, l1) in DESI_ARMS.items():
        npix = 400
        wave = np.linspace(l0, l1, npix)
        dwave = wave[1] - wave[0]
        flux = np.zeros((nfib, npix), np.float32)
        ivar = np.zeros((nfib, npix), np.float32)
        mask = np.zeros((nfib, npix), np.int32)
        res = np.zeros((nfib, width, npix), np.float32)
        for i in range(nfib):
            lam_rest = wave / (1 + truth['vel'][i] / C_KMS)
            sp = simulation.fake_spectrum(
                lam_rest, truth['teff'][i], truth['logg'][i],
                truth['feh'][i], truth['alpha'][i],
                wresol=sigmas[i])
            esp = sp / 100.0
            flux[i] = sp + rng.normal(size=npix) * esp
            ivar[i] = 1.0 / esp**2
            res[i] = _gauss_band(sigmas[i] / dwave, width, npix)
        su = s.upper()
        hdus += [dict(kind='image', data=wave, name=f'{su}_WAVELENGTH'),
                 dict(kind='image', data=flux, name=f'{su}_FLUX'),
                 dict(kind='image', data=ivar, name=f'{su}_IVAR'),
                 dict(kind='image', data=mask, name=f'{su}_MASK'),
                 dict(kind='image', data=res, name=f'{su}_RESOLUTION')]
    fibermap = [
        ('TARGETID', np.arange(nfib, dtype=np.int64) + 616000000),
        ('FIBER', np.arange(nfib, dtype=np.int32)),
        ('OBJTYPE', np.array(['TGT'] * nfib)),
        ('FIBERSTATUS', np.zeros(nfib, np.int32)),
    ]
    hdus.append(dict(kind='table', data=fibermap, name='FIBERMAP'))
    fname = str(root / 'coadd-res.fits')
    fitsio.write(fname, hdus)
    return fname, truth


def test_desi_resolution_matrix(coadd_resolution_file, desi_library,
                                tmp_path):
    """--resolution_matrix: per-fiber banded LSFs flow through
    deconvolution -> BatchedFitter and RVs are recovered."""
    from rvspecfit_tpu.utils import freeze

    fname, truth = coadd_resolution_file
    outdir = tmp_path / 'outres'
    outdir.mkdir()
    # template library resol 2000 -> sigma0(5000 A) ~ 1.06 A
    sig0 = {s: 5000.0 / 2000.0 / 2.355 for s in DESI_ARMS}
    config = freeze(dict(
        min_vel=-1000, max_vel=1000, vel_step0=5, max_vsini=500,
        min_vsini=1e-2, min_vel_step=0.2, second_minimizer=False,
        template_lib=desi_library, lsf_sigma0_angstrom=sig0))
    tab_path = str(outdir / 'rvtab-res.fits')
    nfit = desi.proc_desi(fname, tab_path, str(outdir / 'rvmod-res.fits'),
                          None, config, {'npoly': 10},
                          use_resolution_matrix=True)
    assert nfit == len(truth['vel'])
    rv = fitsio.read(tab_path)['RVTAB'].data
    for i in range(nfit):
        assert abs(rv['VRAD'][i] - truth['vel'][i]) < \
            max(10, 5 * rv['VRAD_ERR'][i]), f'fiber {i}'
        # teff from a 4x4x3x2 template grid with per-fiber LSF widths
        # is coarse; the RV above is the physics gate
        assert abs(rv['TEFF'][i] - truth['teff'][i]) < 2500


def test_desi_zbest_selection(coadd_file, desi_library, tmp_path):
    """--zbest_select keeps only redrock STAR / |cz|<1500 km/s objects
    and carries RR_* columns (reference: desi_fit.py:546-679)."""
    fname, truth = coadd_file
    # synthetic redrock file next to the coadd: fibers 0,1 stars,
    # 2 a galaxy at z=0.5, 3,4 missing spectype STAR but low |cz|
    tids = np.arange(NFIB, dtype=np.int64) + 39620000000
    z = np.array([1e-4, -2e-4, 0.5, 1e-3, 0.3])
    spectype = np.array(['STAR', 'STAR', 'GALAXY', 'GALAXY', 'QSO'])
    rr = str(tmp_path / 'redrock-test.fits')
    fitsio.write(rr, [dict(kind='image', data=None),
                      dict(kind='table', name='REDSHIFTS', data=[
                          ('TARGETID', tids), ('Z', z),
                          ('SPECTYPE', spectype),
                          ('SUBTYPE', np.array(['none'] * NFIB))])])
    outdir = str(tmp_path / 'outz')
    from rvspecfit_tpu.utils import freeze
    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=False,
                         template_lib=desi_library))
    os.makedirs(outdir)
    nfit = desi.proc_desi(
        fname, os.path.join(outdir, 'rvtab-z.fits'),
        os.path.join(outdir, 'rvmod-z.fits'), None, config,
        {'npoly': 10}, zbest_path=rr, zbest_select=True)
    rv = fitsio.read(os.path.join(outdir, 'rvtab-z.fits'))['RVTAB'].data
    # fibers 0, 1 (STAR) and 3 (|cz| = 300 km/s < 1500); fiber 2 is a
    # z=0.5 galaxy, fiber 4 is fully masked (S/N cut upstream)
    assert nfit == 3
    assert set(rv['TARGETID']) == {tids[0], tids[1], tids[3]}
    np.testing.assert_allclose(rv['RR_Z'], z[[0, 1, 3]])
    assert list(rv['RR_SPECTYPE']) == ['STAR', 'STAR', 'GALAXY']


def test_desi_queue_mode_and_crash_isolation(coadd_file, desi_library,
                                             tmp_path, monkeypatch):
    """Lock-file queue input mode (reference CI: desi_fit.sh:37) and
    per-file crash isolation (crash log + FAILURE status; reference
    fault-injection test passes an unwritable figure path)."""
    fname, _ = coadd_file
    # corrupt input file: not FITS at all
    badf = str(tmp_path / 'coadd-broken.fits')
    with open(badf, 'w') as fp:
        fp.write('this is not a FITS file')
    qfile = tmp_path / 'queue.txt'
    qfile.write_text(f'{badf}\n{fname}\n')
    outdir = str(tmp_path / 'outq')
    status = str(tmp_path / 'statusq.txt')
    monkeypatch.chdir(tmp_path)      # crash logs land here
    desi.main(['--input_file_from', str(qfile), '--queue_file',
               '--output_dir', outdir, '--templ_lib', desi_library,
               '--targetid', '39620000001',
               '--process_status_file', status])
    with open(status) as fp:
        lines = fp.read().strip().splitlines()
    stat = {ln.split()[0]: ln.split()[1] for ln in lines}
    assert stat[badf] == 'FAILURE'
    assert stat[fname] == 'SUCCESS'
    # queue file consumed
    assert qfile.read_text() == ''
    # crash log written for the broken file
    assert any(p.name.startswith('crash_')
               for p in tmp_path.iterdir())
    # the good file still produced its outputs
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    assert len(tab['RVTAB'].data['VRAD']) == 1


def test_desi_empty_selection(coadd_file, desi_library, tmp_path):
    fname, _ = coadd_file
    outdir = str(tmp_path / 'out3')
    desi.main([fname, '--output_dir', outdir, '--templ_lib', desi_library,
               '--minsn', '1e9', '--throw_exceptions'])
    tab_path = os.path.join(outdir, 'rvtab-test.fits')
    mod_path = os.path.join(outdir, 'rvmod-test.fits')
    assert os.path.exists(tab_path)
    # empty-selection files carry the FULL schema so downstream
    # concatenation sees uniform columns (reference desi_fit.py:1106-1134)
    tab = fitsio.read(tab_path)
    rv = tab['RVTAB'].data
    for col in ('VRAD', 'VRAD_ERR', 'TEFF', 'LOGG', 'FEH', 'ALPHAFE',
                'RVS_WARN', 'TARGETID', 'SN_B'):
        assert col in rv, col
        assert len(rv[col]) == 0
    assert 'TARGETID' in tab['FIBERMAP'].data
    assert len(tab['FIBERMAP'].data['TARGETID']) == 0
    mod = fitsio.read(mod_path)
    for s in DESI_ARMS:
        assert f'{s.upper()}_WAVELENGTH' in mod
        assert f'{s.upper()}_MODEL' in mod
        assert len(mod[f'{s.upper()}_WAVELENGTH'].data) > 0


def test_desi_header_provenance(coadd_file, desi_library, tmp_path):
    """Output primary headers stamp dependency versions, template
    revisions, and copied input keys (reference desi_fit.py:77-156)."""
    fname, _ = coadd_file
    outdir = str(tmp_path / 'outprov')
    desi.main([fname, '--output_dir', outdir, '--templ_lib', desi_library,
               '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    hdr = tab[0].header
    assert hdr.get('RVS_VER')
    assert hdr.get('RVS_CMD')
    # dependency version cards
    deps = {str(hdr[f'DEPNAM{i:02d}']): str(hdr[f'DEPVER{i:02d}'])
            for i in range(20) if f'DEPNAM{i:02d}' in hdr}
    assert 'numpy' in deps and deps['numpy']
    assert 'python' in deps
    assert 'jax' in deps
    # template library revision cards
    assert 'TMPLCON0' in hdr
    assert 'TMPLREV0' in hdr


def test_desi_status_file_rank_substitution(coadd_file, desi_library,
                                            tmp_path):
    """--process_status_file %d gets the rank substituted, so ranks do
    not clobber one file (reference desi_fit.py:1765-1770)."""
    fname, _ = coadd_file
    outdir = str(tmp_path / 'outrank')
    status = str(tmp_path / 'status_%d.txt')
    desi.main([fname, '--output_dir', outdir, '--templ_lib', desi_library,
               '--process_status_file', status, '--rank', '3',
               '--world', '4', '--minsn', '1e9', '--throw_exceptions'])
    assert os.path.exists(str(tmp_path / 'status_3.txt'))


def test_desi_two_process_multihost(coadd_file, desi_library, tmp_path):
    """Two rvst_desi_fit processes over a jax.distributed world split
    a 2-file list by rank; both RVTABs verify and per-rank status
    files stay separate (the TPU-native replacement for the
    reference's MPI task farm, utils.py:180-318)."""
    import shutil
    import socket
    import subprocess
    import sys as _sys

    fname, _ = coadd_file
    # two input files: the original and a copy under a new tile name
    f2 = str(tmp_path / 'coadd-test2.fits')
    shutil.copy(fname, f2)
    flist = str(tmp_path / 'files.txt')
    with open(flist, 'w') as fp:
        fp.write(fname + '\n' + f2 + '\n')
    outdir = str(tmp_path / 'outmh')
    status = str(tmp_path / 'mh_status_%d.txt')

    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ, JAX_PLATFORMS='cpu',
                   JAX_ENABLE_X64='1')
        procs.append(subprocess.Popen(
            [_sys.executable, '-m', 'rvspecfit_tpu.survey.desi',
             '--input_file_from', flist, '--output_dir', outdir,
             '--templ_lib', desi_library,
             '--coordinator', f'localhost:{port}',
             '--rank', str(rank), '--world', '2',
             '--process_status_file', status,
             '--throw_exceptions'],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    for p in procs:
        # generous: two ranks share this host's single CPU, and a cold
        # compilation cache means each compiles the full pipeline
        assert p.wait(timeout=2400) == 0

    # both output tables exist and carry fitted rows
    for base in ('test', 'test2'):
        tab = fitsio.read(os.path.join(outdir, f'rvtab-{base}.fits'))
        rv = tab['RVTAB'].data
        assert len(rv['VRAD']) == NFIB - 1
        assert np.isfinite(rv['VRAD']).all()
    # per-rank status files: one line each, no clobbering
    for rank in range(2):
        with open(str(tmp_path / f'mh_status_{rank}.txt')) as fp:
            lines = fp.read().strip().splitlines()
        assert len(lines) == 1 and 'SUCCESS' in lines[0]


def test_objtypes_to_mask():
    """Regex -> DESI_TARGET bitmask via the embedded main-survey name
    table (reference: desi_fit.py:495-522 via desitarget)."""
    mask = desi.objtypes_to_mask(['MWS_.*', 'STD_.*'])
    assert mask == (1 << 61) | (1 << 33) | (1 << 34) | (1 << 35)
    assert desi.objtypes_to_mask(['BGS_ANY']) == 1 << 60
    with pytest.raises(ValueError):
        desi.objtypes_to_mask(['NO_SUCH_TYPE_.*'])


def test_desi_objtypes_selection(coadd_file, desi_library, tmp_path):
    """--objtypes regexes drive DESI_TARGET selection: the fixture's
    fibers are all BGS_ANY (bit 60), so MWS regexes select nothing
    (structured empty output) without error."""
    fname, _ = coadd_file
    outdir = str(tmp_path / 'out_objtypes')
    desi.main([fname, '--output_dir', outdir, '--templ_lib',
               desi_library, '--objtypes', 'MWS_.*,STD_.*',
               '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    assert len(tab['RVTAB'].data['VRAD']) == 0


def test_desi_cli_version_and_param_init(capsys):
    """--version prints and exits; unknown --param_init is an error
    (reference desi_fit.py:1799-1805)."""
    from rvspecfit_tpu import __version__
    desi.main(['--version', '--output_dir', '/nonexistent'])
    assert __version__ in capsys.readouterr().out
    with pytest.raises(SystemExit):
        desi.main(['x.fits', '--output_dir', '/tmp/nope',
                   '--param_init', 'magic'])


def test_desi_two_file_prefetch(coadd_file, desi_library, tmp_path):
    """Multi-file runs go through proc_many's one-file-lookahead
    prefetch (the FITS read of file N+1 overlaps file N's fit); both
    outputs must be written and identical for identical inputs."""
    import shutil
    fname, truth = coadd_file
    f2 = str(tmp_path / 'coadd-test2.fits')
    shutil.copy(fname, f2)
    outdir = str(tmp_path / 'out_prefetch')
    # --coalesce 1: this test targets the per-file lookahead prefetch,
    # not the (default) coalesced group path
    desi.main([fname, f2, '--output_dir', outdir, '--templ_lib',
               desi_library, '--coalesce', '1', '--throw_exceptions'])
    t1 = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    t2 = fitsio.read(os.path.join(outdir, 'rvtab-test2.fits'))
    rv1, rv2 = t1['RVTAB'].data, t2['RVTAB'].data
    assert len(rv1['VRAD']) == len(rv2['VRAD']) > 0
    np.testing.assert_array_equal(rv1['VRAD'], rv2['VRAD'])


def test_desi_param_init_bruteforce(coadd_file, desi_library, tmp_path):
    """--param_init bruteforce fits without the CCF stage (reference
    desi_fit.py:1799-1805): first guess comes from the template-grid
    scan and the CCF-stage columns are absent from RVTAB."""
    fname, truth = coadd_file
    outdir = str(tmp_path / 'out_bruteforce')
    desi.main([fname, '--output_dir', outdir, '--templ_lib',
               desi_library, '--param_init', 'bruteforce',
               '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    rv = tab['RVTAB'].data
    nfit = len(rv['VRAD'])
    assert nfit > 0
    assert 'CHISQ_CCF' not in rv
    # velocities still recovered (the guess path feeds the same fit)
    tids = rv['TARGETID'] - 39620000000
    ok = rv['RVS_WARN'] == 0
    assert ok.sum() >= nfit - 2
    dv = rv['VRAD'][ok] - truth['vel'][tids[ok]]
    lim = np.maximum(10.0, 5 * rv['VRAD_ERR'][ok])
    assert (np.abs(dv) < lim).all()


def test_target_column_dispatch():
    """Column dispatch mirrors desitarget.targets.main_cmx_or_sv:
    commissioning first, then SV, then main (reference:
    desi_fit.py:495-521)."""
    col, table = desi.target_column({'DESI_TARGET': None})
    assert col == 'DESI_TARGET' and table['MWS_ANY'] == 61
    col, table = desi.target_column({'SV3_DESI_TARGET': None,
                                     'DESI_TARGET': None})
    assert col == 'SV3_DESI_TARGET' and table['LRG_LOWDENS'] == 3
    col, table = desi.target_column({'CMX_TARGET': None,
                                     'SV1_DESI_TARGET': None})
    assert col == 'CMX_TARGET' and 'STD_FAINT' in table
    assert desi.target_column({'TARGETID': None}) == (None, None)
    # SV mask resolves MWS/STD names at the pinned bits
    m = desi.objtypes_to_mask(['MWS_.*', 'STD_.*'],
                              desi.TARGET_COLUMN_TABLES[3][1],
                              'SV3_DESI_TARGET')
    assert m == (1 << 61) | (1 << 33) | (1 << 34) | (1 << 35)


_DEMO_TARGETMASK_YAML = """
cmx_mask:
    - [STD_GAIA,        0, "Gaia stars", {obsconditions: DARK}]
    - [SV0_BGS,         8, "early-SV BGS", {obsconditions: BRIGHT}]
    - [SV0_MWS,         9, "early-SV MWS", {obsconditions: BRIGHT}]
    - [MINI_SV_BGS_BRIGHT, 40, "mini-SV BGS", {}]
sv1_desi_mask:
    - [LRG,             0, "LRG", {}]
    - [ELG,             1, "ELG", {}]
    - [QSO,             2, "QSO", {}]
    - [LRG_INIT_4PASS,  3, "experimental LRG sub-selection", {}]
    - [MWS_ANY,        61, "MWS_ANY", {}]
"""


def test_load_targetmask_yaml(tmp_path):
    """load_targetmask_yaml parses the public desitarget schema into
    {column: {NAME: bit}} tables and objtypes_to_mask resolves names
    through them (reference: desi_fit.py:495-521 via desitarget)."""
    import pytest
    yml = tmp_path / 'tm.yaml'
    yml.write_text(_DEMO_TARGETMASK_YAML)
    tables = desi.load_targetmask_yaml(str(yml))
    assert tables['CMX_TARGET']['SV0_MWS'] == 9
    assert tables['CMX_TARGET']['MINI_SV_BGS_BRIGHT'] == 40
    assert tables['SV1_DESI_TARGET']['LRG_INIT_4PASS'] == 3
    # extends (and can override) the embedded table of the active column
    col, table = desi.target_column({'CMX_TARGET': None}, tables)
    assert col == 'CMX_TARGET' and table['SV0_BGS'] == 8
    assert 'STD_FAINT' in table          # embedded pinned bit kept
    m = desi.objtypes_to_mask(['SV0_.*'], table, 'CMX_TARGET')
    assert m == (1 << 8) | (1 << 9)
    # a yaml with no recognized sections fails loudly
    bad = tmp_path / 'bad.yaml'
    bad.write_text('mws_mask:\n    - [GAIA_STD, 0, "x", {}]\n')
    with pytest.raises(ValueError):
        desi.load_targetmask_yaml(str(bad))


def _rewrite_target_column(fname, out, column, value):
    """Copy a coadd, renaming FIBERMAP's DESI_TARGET column to
    ``column`` with ``value`` in every row (SV/CMX-style files)."""
    f = fitsio.read(fname)
    specs = [dict(kind='image', data=None)]
    for h in f.hdus[1:]:
        if isinstance(h.data, dict):
            cols = []
            for n, v in h.data.items():
                if n == 'DESI_TARGET':
                    cols.append((column,
                                 np.full(len(v), value, np.int64)))
                else:
                    cols.append((n, v))
            specs.append(dict(kind='table', data=cols, name=h.name))
        else:
            specs.append(dict(kind='image', data=h.data, name=h.name))
    fitsio.write(out, specs)


def test_desi_targetmask_yaml_selection(coadd_file, desi_library,
                                        tmp_path):
    """--objtypes with --targetmask_yaml selects on SV1-style and
    CMX-style fibermaps whose bits are NOT in the embedded tables —
    no --objtype_mask needed (VERDICT r4 #5; reference resolves these
    through desitarget's yamls, desi_fit.py:495-521)."""
    fname, truth = coadd_file
    yml = str(tmp_path / 'tm.yaml')
    with open(yml, 'w') as fp:
        fp.write(_DEMO_TARGETMASK_YAML)

    # CMX-style commissioning file: SV0_MWS (bit 9)
    f_cmx = str(tmp_path / 'coadd-cmx.fits')
    _rewrite_target_column(fname, f_cmx, 'CMX_TARGET', 1 << 9)
    outdir = str(tmp_path / 'out_cmx')
    desi.main([f_cmx, '--output_dir', outdir, '--templ_lib',
               desi_library, '--objtypes', 'SV0_.*',
               '--targetmask_yaml', yml, '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-cmx.fits'))
    assert len(tab['RVTAB'].data['VRAD']) == NFIB - 1

    # SV1-style file: experimental sub-bit LRG_INIT_4PASS (bit 3)
    f_sv1 = str(tmp_path / 'coadd-sv1.fits')
    _rewrite_target_column(fname, f_sv1, 'SV1_DESI_TARGET', 1 << 3)
    outdir2 = str(tmp_path / 'out_sv1')
    desi.main([f_sv1, '--output_dir', outdir2, '--templ_lib',
               desi_library, '--objtypes', 'LRG_INIT.*',
               '--targetmask_yaml', yml, '--throw_exceptions'])
    tab2 = fitsio.read(os.path.join(outdir2, 'rvtab-sv1.fits'))
    assert len(tab2['RVTAB'].data['VRAD']) == NFIB - 1

    # without the yaml the same selection fails with guidance
    import pytest
    with pytest.raises(Exception):
        desi.main([f_cmx, '--output_dir',
                   str(tmp_path / 'out_noyaml'), '--templ_lib',
                   desi_library, '--objtypes', 'SV0_.*',
                   '--throw_exceptions'])


def _rewrite_with_sv3_fibermap(fname, out):
    """Copy a coadd, renaming FIBERMAP's DESI_TARGET column to
    SV3_DESI_TARGET with the MWS_ANY bit set (an EDR-style file)."""
    f = fitsio.read(fname)
    specs = [dict(kind='image', data=None)]
    for h in f.hdus[1:]:
        if isinstance(h.data, dict):
            cols = []
            for n, v in h.data.items():
                if n == 'DESI_TARGET':
                    cols.append(('SV3_DESI_TARGET',
                                 np.full(len(v), 1 << 61, np.int64)))
                else:
                    cols.append((n, v))
            specs.append(dict(kind='table', data=cols, name=h.name))
        else:
            specs.append(dict(kind='image', data=h.data, name=h.name))
    fitsio.write(out, specs)


def test_desi_sv3_objtypes_selection(coadd_file, desi_library, tmp_path):
    """--objtypes on an SV3-style coadd (the public EDR layout) selects
    via SV3_DESI_TARGET: MWS regexes now select every good fiber, and
    a non-matching science regex selects nothing (VERDICT r3 #3)."""
    fname, truth = coadd_file
    f_sv3 = str(tmp_path / 'coadd-sv3.fits')
    _rewrite_with_sv3_fibermap(fname, f_sv3)

    outdir = str(tmp_path / 'out_sv3')
    desi.main([f_sv3, '--output_dir', outdir, '--templ_lib',
               desi_library, '--objtypes', 'MWS_.*,STD_.*',
               '--throw_exceptions'])
    tab = fitsio.read(os.path.join(outdir, 'rvtab-sv3.fits'))
    rv = tab['RVTAB'].data
    assert len(rv['VRAD']) == NFIB - 1
    for i in range(NFIB - 1):
        assert abs(rv['VRAD'][i] - truth['vel'][i]) < \
            max(10, 5 * rv['VRAD_ERR'][i]), f'fiber {i}'

    outdir2 = str(tmp_path / 'out_sv3_elg')
    desi.main([f_sv3, '--output_dir', outdir2, '--templ_lib',
               desi_library, '--objtypes', 'ELG',
               '--throw_exceptions'])
    tab2 = fitsio.read(os.path.join(outdir2, 'rvtab-sv3.fits'))
    assert len(tab2['RVTAB'].data['VRAD']) == 0


def test_prewarm_cli(coadd_file, desi_library):
    """rvst_prewarm runs the production driver on a synthetic
    throwaway exposure (shapes from --like), leaving the persistent
    compilation cache populated and no outputs behind (VERDICT r3
    next #7)."""
    from rvspecfit_tpu.pipeline import prewarm
    fname, _ = coadd_file
    rc = prewarm.main(['--like', fname, '--templ_lib', desi_library,
                       '--nfibers', '4', '--log_level', 'WARNING'])
    assert rc == 0


def test_prewarm_setups_mode(desi_library):
    """--setups mode (no survey file at hand): wavelength grids come
    from the template library trimmed by a VELOCITY-AWARE margin —
    a fixed few-Angstrom trim fails the fitter's template-coverage
    check at |v| = max_vel (regression: prewarm.py margin bug)."""
    from rvspecfit_tpu.pipeline import prewarm
    rc = prewarm.main(['--templ_lib', desi_library,
                       '--setups', 'b',
                       '--nfibers', '4', '--log_level', 'WARNING'])
    assert rc == 0

def test_desi_coalesce_matches_per_file(coadd_file, desi_library,
                                        tmp_path):
    """--coalesce 2 fits two files as ONE device batch
    (proc_desi_group); outputs must match per-file runs exactly —
    every fitter program is elementwise over the fiber axis, so
    concatenation cannot change per-fiber results — and the per-file
    RVTAB/RVMOD/status structure must be preserved."""
    import shutil
    fname, truth = coadd_file
    f2 = str(tmp_path / 'coadd-test2.fits')
    shutil.copy(fname, f2)
    out_s = str(tmp_path / 'out_serial')
    out_c = str(tmp_path / 'out_coalesced')
    status = str(tmp_path / 'status_c.txt')
    desi.main([fname, f2, '--output_dir', out_s, '--templ_lib',
               desi_library, '--coalesce', '1',
               '--throw_exceptions'])
    desi.main([fname, f2, '--output_dir', out_c, '--templ_lib',
               desi_library, '--coalesce', '2',
               '--process_status_file', status,
               '--throw_exceptions'])
    for base in ('test', 'test2'):
        tabs = fitsio.read(os.path.join(out_s, f'rvtab-{base}.fits'))
        tabc = fitsio.read(os.path.join(out_c, f'rvtab-{base}.fits'))
        rvs, rvc = tabs['RVTAB'].data, tabc['RVTAB'].data
        assert len(rvc['VRAD']) == NFIB - 1
        np.testing.assert_array_equal(rvs['TARGETID'], rvc['TARGETID'])
        for col in ('VRAD', 'VRAD_ERR', 'TEFF', 'LOGG', 'FEH',
                    'ALPHAFE', 'CHISQ_TOT', 'RVS_WARN', 'SUCCESS',
                    'VRAD_CCF', 'CHISQ_CCF'):
            np.testing.assert_allclose(
                np.asarray(rvs[col], float),
                np.asarray(rvc[col], float),
                rtol=0, atol=1e-8, err_msg=col)
        mods = fitsio.read(os.path.join(out_s, f'rvmod-{base}.fits'))
        modc = fitsio.read(os.path.join(out_c, f'rvmod-{base}.fits'))
        for s in DESI_ARMS:
            np.testing.assert_allclose(
                mods[f'{s.upper()}_MODEL'].data,
                modc[f'{s.upper()}_MODEL'].data, rtol=0, atol=1e-6)
    with open(status) as fp:
        lines = fp.read().strip().splitlines()
    assert len(lines) == 2 and all('SUCCESS' in ln for ln in lines)


def test_desi_pipeline_prep_matches_serial(coadd_file, desi_library,
                                           tmp_path):
    """With more files than one coalesce window, proc_many's lookahead
    prep thread prepares group N+1 (and pre-dispatches its CCF tiles,
    ccf.fit_batch_async) while group N fits; results must match the
    strictly serial per-file run exactly, per-file outputs and status
    lines included."""
    import shutil
    fname, truth = coadd_file
    names = [fname]
    for k in (2, 3, 4):
        fk = str(tmp_path / f'coadd-pl{k}.fits')
        shutil.copy(fname, fk)
        names.append(fk)
    out_s = str(tmp_path / 'out_serial_pl')
    out_p = str(tmp_path / 'out_pipelined')
    status = str(tmp_path / 'status_pl.txt')
    desi.main(names + ['--output_dir', out_s, '--templ_lib',
                       desi_library, '--coalesce', '1',
                       '--throw_exceptions'])
    assert os.environ.get('RVST_PIPELINE_PREP', '1') != '0'
    desi.main(names + ['--output_dir', out_p, '--templ_lib',
                       desi_library, '--coalesce', '2',
                       '--process_status_file', status,
                       '--throw_exceptions'])
    for base in ('test', 'pl2', 'pl3', 'pl4'):
        rvs = fitsio.read(
            os.path.join(out_s, f'rvtab-{base}.fits'))['RVTAB'].data
        rvp = fitsio.read(
            os.path.join(out_p, f'rvtab-{base}.fits'))['RVTAB'].data
        assert len(rvp['VRAD']) == NFIB - 1
        np.testing.assert_array_equal(rvs['TARGETID'], rvp['TARGETID'])
        for col in ('VRAD', 'VRAD_ERR', 'TEFF', 'LOGG', 'FEH',
                    'ALPHAFE', 'CHISQ_TOT', 'RVS_WARN', 'SUCCESS',
                    'VRAD_CCF', 'CHISQ_CCF'):
            np.testing.assert_allclose(
                np.asarray(rvs[col], float), np.asarray(rvp[col], float),
                rtol=0, atol=1e-8, err_msg=f'{base}:{col}')
    with open(status) as fp:
        lines = fp.read().strip().splitlines()
    assert len(lines) == 4 and all('SUCCESS' in ln for ln in lines)


def test_desi_defer_tail_matches_sync(coadd_file, desi_library,
                                      tmp_path, monkeypatch):
    """The deferred post-NM tail (run_tail_async: polish -> device
    unpack -> refine -> Hessians -> models dispatched without fetches,
    materialized by the writer thread) must reproduce the synchronous
    phase-by-phase path exactly."""
    fname, truth = coadd_file
    out_s = str(tmp_path / 'out_sync_tail')
    out_d = str(tmp_path / 'out_defer_tail')
    monkeypatch.setenv('RVST_DEFER_TAIL', '0')
    desi.main([fname, '--output_dir', out_s, '--templ_lib',
               desi_library, '--throw_exceptions'])
    monkeypatch.setenv('RVST_DEFER_TAIL', '1')
    desi.main([fname, '--output_dir', out_d, '--templ_lib',
               desi_library, '--throw_exceptions'])
    rvs = fitsio.read(
        os.path.join(out_s, 'rvtab-test.fits'))['RVTAB'].data
    rvd = fitsio.read(
        os.path.join(out_d, 'rvtab-test.fits'))['RVTAB'].data
    np.testing.assert_array_equal(rvs['TARGETID'], rvd['TARGETID'])
    for col in ('VRAD', 'VRAD_ERR', 'VSINI', 'TEFF', 'LOGG', 'FEH',
                'ALPHAFE', 'TEFF_ERR', 'CHISQ_TOT', 'CHISQ_C_TOT',
                'RVS_WARN', 'SUCCESS', 'VRAD_CCF', 'VRAD_SKEW'):
        np.testing.assert_allclose(
            np.asarray(rvs[col], float), np.asarray(rvd[col], float),
            rtol=0, atol=1e-8, err_msg=col)
    mods_s = fitsio.read(os.path.join(out_s, 'rvmod-test.fits'))
    mods_d = fitsio.read(os.path.join(out_d, 'rvmod-test.fits'))
    for s in ('B', 'R', 'Z'):
        np.testing.assert_allclose(
            np.asarray(mods_s[f'{s}_MODEL'].data, float),
            np.asarray(mods_d[f'{s}_MODEL'].data, float),
            rtol=0, atol=1e-8, err_msg=s)


def test_desi_coalesce_all_empty_group(coadd_file, desi_library,
                                       tmp_path):
    """A coalesced group in which EVERY file selects zero fibers must
    still write per-file empty outputs and record SUCCESS status lines
    (regression: proc_desi_group's early return used to bypass
    defer_finish, crashing proc_many's (counts, finish) unpacking)."""
    import shutil
    fname, _ = coadd_file
    f2 = str(tmp_path / 'coadd-empty2.fits')
    shutil.copy(fname, f2)
    outdir = str(tmp_path / 'out_empty_group')
    status = str(tmp_path / 'status_empty.txt')
    desi.main([fname, f2, '--output_dir', outdir, '--templ_lib',
               desi_library, '--coalesce', '2', '--objtypes', 'ELG',
               '--process_status_file', status, '--throw_exceptions'])
    for base in ('test', 'empty2'):
        tab = fitsio.read(os.path.join(outdir, f'rvtab-{base}.fits'))
        assert len(tab['RVTAB'].data['VRAD']) == 0, base
        assert os.path.exists(os.path.join(outdir, f'rvmod-{base}.fits'))
    with open(status) as fp:
        lines = fp.read().strip().splitlines()
    assert len(lines) == 2 and all('SUCCESS' in ln for ln in lines)


def _truncate_coadd(fname, out, ncut=7):
    """Copy a coadd with every spectral HDU cut by ``ncut`` pixels —
    an arm-structure-incompatible file for sub-group partitioning."""
    f = fitsio.read(fname)
    specs = [dict(kind='image', data=None)]
    spectral = ('_WAVELENGTH', '_FLUX', '_IVAR', '_MASK')
    for h in f.hdus[1:]:
        if isinstance(h.data, dict):
            specs.append(dict(kind='table',
                              data=list(h.data.items()), name=h.name))
        else:
            d = h.data
            if any(h.name.endswith(sfx) for sfx in spectral):
                d = d[..., :-ncut]
            specs.append(dict(kind='image', data=d, name=h.name))
    fitsio.write(out, specs)


def test_desi_coalesce_incompatible_files(coadd_file, desi_library,
                                          tmp_path):
    """A coalesce window mixing incompatible arm structures splits
    into independent sub-group fits (_arm_group_key): both files'
    outputs are written with the right row counts."""
    fname, truth = coadd_file
    f3 = str(tmp_path / 'coadd-test3.fits')
    _truncate_coadd(fname, f3)
    outdir = str(tmp_path / 'out_mixed')
    desi.main([fname, f3, '--output_dir', outdir, '--templ_lib',
               desi_library, '--coalesce', '2', '--fitarm', 'b',
               '--throw_exceptions'])
    for base in ('test', 'test3'):
        tab = fitsio.read(os.path.join(outdir, f'rvtab-{base}.fits'))
        rv = tab['RVTAB'].data
        assert len(rv['VRAD']) == NFIB - 1, base
        assert np.isfinite(rv['VRAD']).all(), base


def test_desi_async_write_crash_isolation(coadd_file, desi_library,
                                          tmp_path, monkeypatch):
    """Output writes run on proc_many's writer thread (one file's
    RVTAB/RVMOD write overlaps the next file's fit); a write failure
    must still be crash-isolated — FAILURE in the status file, crash
    log written, and the other file unaffected."""
    import shutil
    from rvspecfit_tpu.survey import desi as desi_mod
    fname, _ = coadd_file
    f2 = str(tmp_path / 'coadd-wfail.fits')
    shutil.copy(fname, f2)
    real_write = desi_mod._write_outputs

    def failing_write(tab_ofname, *args, **kwargs):
        # match the FILE (rvtab-wfail.fits), not the output dir, which
        # also contains 'wfail'
        if 'wfail' in os.path.basename(tab_ofname):
            raise RuntimeError('injected write failure')
        return real_write(tab_ofname, *args, **kwargs)

    monkeypatch.setattr(desi_mod, '_write_outputs', failing_write)
    monkeypatch.chdir(tmp_path)      # crash logs land here
    outdir = str(tmp_path / 'out_wfail')
    status = str(tmp_path / 'status_wfail.txt')
    desi.main([fname, f2, '--output_dir', outdir, '--templ_lib',
               desi_library, '--targetid', '39620000001',
               '--process_status_file', status])
    with open(status) as fp:
        stat = {ln.split()[0]: ln.split()[1]
                for ln in fp.read().strip().splitlines()}
    assert stat[fname] == 'SUCCESS'
    assert stat[f2] == 'FAILURE'
    assert any(p.name.startswith('crash_') for p in tmp_path.iterdir())
    tab = fitsio.read(os.path.join(outdir, 'rvtab-test.fits'))
    assert len(tab['RVTAB'].data['VRAD']) == 1
