"""rvst_prewarm — populate the persistent compilation cache for the
production fit shapes so a fresh fleet process starts fitting in
seconds instead of paying the first-file XLA compiles.

The reference has no analogue (its scipy/numba pipeline has no
compile step); on TPU every distinct jitted program of the batched
fitter (NM ladder widths, polish, refine, Hessian, models, CCF) is
compiled once per (shape, option) signature.  With the persistent
cache (``rvspecfit_tpu.utils.enable_compilation_cache``, also enabled
by the survey drivers) those compiles are keyed by HLO hash and
shared across processes — but only after something has produced them.
This tool does exactly that: it synthesizes an exposure shaped like
your data (same arm wavelength grids, same fiber-ladder rung, same
options) and runs the production driver on it once, end to end, into
a throwaway directory.

Shapes come from ``--like <coadd.fits>`` (the natural spelling:
point at any one production file; only its wavelength grids and
RESOLUTION band width are read — the spectra are synthetic) or from
the template library's own setup grids (``--setups``).

What this does NOT fix: remote-compile backends (e.g. a tunneled
device) pay a per-process executable *ingest* cost that no on-disk
cache can remove — see STATUS.md for measured numbers.  On a local
TPU host, compile time dominates and this tool removes it.
"""
from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def synth_coadd_like(out_fname, waves, nfibers, resol_ndiag=None,
                     seed=0):
    """Write a synthetic DESI-format coadd with the given per-setup
    wavelength grids (dict name -> (npix,) array).  Spectra are fake
    stars at moderate S/N so the fit converges at production-like
    iteration counts; ``resol_ndiag`` (dict name -> int or None) adds
    a Gaussian band RESOLUTION extension of that width."""
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.io import fitsio

    rng = np.random.RandomState(seed)
    c = 299792.458
    vel = rng.uniform(-300, 300, nfibers)
    teff = rng.uniform(4500, 9500, nfibers)
    logg = rng.uniform(1.0, 4.8, nfibers)
    feh = rng.uniform(-1.9, -0.1, nfibers)
    alpha = rng.uniform(0.05, 0.95, nfibers)

    hdus = [dict(kind='image', data=None)]
    for s, lam in waves.items():
        su = s.upper()
        npix = len(lam)
        flux = np.zeros((nfibers, npix), np.float32)
        for i in range(nfibers):
            lam_rest = lam / (1 + vel[i] / c)
            sp = simulation.fake_spectrum(lam_rest, teff[i], logg[i],
                                          feh[i], alpha[i], wresol=2.0)
            flux[i] = sp + rng.normal(size=npix) * (sp / 50.0)
        esp = np.abs(flux) / 50.0 + 1e-10
        hdus += [
            dict(kind='image', data=lam, name=f'{su}_WAVELENGTH'),
            dict(kind='image', data=flux, name=f'{su}_FLUX'),
            dict(kind='image', data=(1.0 / esp**2).astype(np.float32),
                 name=f'{su}_IVAR'),
            dict(kind='image', data=np.zeros((nfibers, npix), np.int32),
                 name=f'{su}_MASK')]
        nd = (resol_ndiag or {}).get(s)
        if nd:
            x = np.arange(nd) - nd // 2
            band = np.exp(-0.5 * (x / 1.5)**2)
            band /= band.sum()
            res = np.tile(band[None, :, None],
                          (nfibers, 1, npix)).astype(np.float32)
            hdus.append(dict(kind='image', data=res,
                             name=f'{su}_RESOLUTION'))
    hdus.append(dict(kind='table', name='FIBERMAP', data=[
        ('TARGETID', np.arange(nfibers, dtype=np.int64) + 1),
        ('TARGET_RA', np.linspace(0.0, 359.0, nfibers)),
        ('TARGET_DEC', np.zeros(nfibers)),
        ('FIBER', np.arange(nfibers, dtype=np.int32)),
        ('OBJTYPE', np.array(['TGT'] * nfibers)),
        ('FIBERSTATUS', np.zeros(nfibers, np.int32)),
        ('DESI_TARGET', np.full(nfibers, 1 << 61, np.int64)),
    ]))
    fitsio.write(out_fname, hdus, overwrite=True)


def main(args=None):
    parser = argparse.ArgumentParser(
        description='Populate the persistent compilation cache for '
                    'the production DESI-fit shapes.')
    parser.add_argument('--config', type=str, default=None)
    parser.add_argument('--templ_lib', type=str, default=None)
    parser.add_argument('--like', type=str, default=None,
                        help='existing coadd whose arm wavelength '
                             'grids (and RESOLUTION band width) set '
                             'the prewarm shapes; spectra are NOT '
                             'read')
    parser.add_argument('--setups', type=str, default='b,r,z')
    parser.add_argument('--nfibers', type=int, default=500,
                        help='fiber-ladder rung to warm (the driver '
                             'quantizes file sizes to 64/128/256/500)')
    parser.add_argument('--npoly', type=int, default=10)
    parser.add_argument('--resolution_matrix', action='store_true',
                        default=False)
    parser.add_argument('--no_ccf_continuum_normalize',
                        dest='ccf_continuum_normalize',
                        action='store_false', default=True)
    parser.add_argument('--log_level', type=str, default='INFO')
    args = parser.parse_args(args)
    logging.basicConfig(level=getattr(logging, args.log_level.upper()))

    from rvspecfit_tpu.io import fitsio
    from rvspecfit_tpu.survey import desi
    from rvspecfit_tpu import utils

    setups = args.setups.split(',')
    waves, resol_ndiag = {}, {}
    if args.like:
        fp = fitsio.read(args.like)
        for s in setups:
            su = s.upper()
            waves[s] = np.asarray(fp[f'{su}_WAVELENGTH'].data,
                                  np.float64).ravel()
            resol_ndiag[s] = (fp[f'{su}_RESOLUTION'].data.shape[1]
                              if f'{su}_RESOLUTION' in fp and
                              args.resolution_matrix else None)
    else:
        # shapes from the template library's own setup grids (good
        # when no survey file is at hand yet).  The trim margin must
        # cover the full Doppler search range: at max_vel the data
        # wavelengths map to rest-frame lam*(1 +- ~v/c), so a fixed
        # few-Angstrom margin fails the fitter's template-coverage
        # check at |v| = 1000 km/s (~16 A at 4900 A)
        config = utils.read_config(
            args.config, dict(template_lib=args.templ_lib)
            if args.templ_lib else None)
        from rvspecfit_tpu.pipeline.library import load_template_model
        c_kms = 299792.458
        vmax = max(abs(float(config['min_vel'])),
                   abs(float(config['max_vel'])))
        frac = 1.25 * vmax / c_kms       # 25% safety + spline support
        for s in setups:
            tm = load_template_model(f'desi_{s}', config)
            lam = np.asarray(tm.geom.xs, np.float64)
            sel = (lam > lam[0] * (1 + frac)) & \
                  (lam < lam[-1] * (1 - frac))
            waves[s] = lam[sel]
            resol_ndiag[s] = 11 if args.resolution_matrix else None

    tmpdir = tempfile.mkdtemp(prefix='rvst_prewarm_')
    try:
        coadd = os.path.join(tmpdir, 'coadd-prewarm.fits')
        synth_coadd_like(coadd, waves, args.nfibers,
                         resol_ndiag=resol_ndiag)
        logging.info('prewarm exposure: %d fibers x %s',
                     args.nfibers,
                     {s: len(w) for s, w in waves.items()})
        t0 = time.time()
        cli = [coadd, '--output_dir', os.path.join(tmpdir, 'out'),
               '--setups', args.setups, '--npoly', str(args.npoly),
               '--throw_exceptions']
        if args.config:
            cli += ['--config', args.config]
        if args.templ_lib:
            cli += ['--templ_lib', args.templ_lib]
        if args.resolution_matrix:
            cli += ['--resolution_matrix']
        if not args.ccf_continuum_normalize:
            cli += ['--no_ccf_continuum_normalize']
        desi.main(cli)
        logging.info('prewarm complete in %.1f s; persistent cache '
                     'populated for these shapes', time.time() - t0)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
