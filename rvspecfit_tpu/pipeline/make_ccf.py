"""CCF template bank construction (offline, CPU).

Equivalent of the reference rvs_make_ccf
(reference: py/rvspecfit/make_ccf.py): subsample the prepared
template set uniformly in parameter space via a Morton (Z-order)
space-filling curve, continuum-normalize each template with a robust
log-space spline fit, resample onto a uniform log-lambda grid with a
power-of-two point count, and store rfft(model) and rfft(model^2) for
the runtime FFT cross-correlation (fit/ccf.py).

``preprocess_data`` is shared with the runtime: it masks suspicious
pixels, infills bad ones, continuum-normalizes and resamples the
observed spectrum onto the same log-lambda grid with proper inverse-
variance propagation.
"""
from __future__ import annotations

import argparse
import logging
import os
import shlex
import sys
import time

import numpy as np
import scipy.interpolate
import scipy.signal
import scipy.stats

from rvspecfit_tpu import serializer
from rvspecfit_tpu import __version__ as git_rev
from rvspecfit_tpu.ops import continuum as continuum_mod
from rvspecfit_tpu.ops import vsini as vsini_mod
from rvspecfit_tpu.pipeline.make_interpol import SPECS_H5_NAME

C_KMS = 299792.458


def get_continuum_prefix(continuum):
    return '' if continuum else 'nocont_'


def get_ccf_info_name(setup, continuum=True):
    return 'ccf_' + get_continuum_prefix(continuum) + '%s.h5' % setup


def get_ccf_dat_name(setup, continuum=True):
    return 'ccfdat_' + get_continuum_prefix(continuum) + '%s.npz' % setup


def get_ccf_mod_name(setup, continuum=True):
    return 'ccfmod_' + get_continuum_prefix(continuum) + '%s.npy' % setup


def interleave_bits(x):
    """(nsamp, ndim) values in [0, 1] -> Morton (Z-order) integers
    (reference: make_ccf.py:39-56)."""
    x = np.asarray(x)
    if x.min() < 0 or x.max() > 1:
        raise ValueError('values must be within [0, 1]')
    nsamp, ndim = x.shape
    max_bits = 64 // ndim
    maxv = 2**max_bits
    xi = np.minimum((x * maxv).astype(np.int64), maxv - 1)
    out = np.zeros(nsamp, dtype=np.int64)
    for bit in range(max_bits):
        for i in range(ndim):
            out += ((xi[:, i] >> bit) & 1) << (bit * ndim + i)
    return out


def get_mortoncurve_id(x):
    """Rank-normalize each parameter column, then Morton-encode —
    a spatial hash giving uniform subsampling when sorted."""
    xr = np.array([scipy.stats.rankdata(col, method='dense') - 1
                   for col in np.asarray(x).T]).T
    xf = xr / np.maximum(xr.max(axis=0), 1)
    return interleave_bits(xf)


def get_ccf_config(logl0=None, logl1=None, npoints=None, splinestep=1000,
                   maxcontpts=20):
    """CCF configuration dict (reference: make_ccf.py:67-102)."""
    ret = dict(logl0=logl0, logl1=logl1, npoints=npoints, continuum=True,
               maxcontpts=maxcontpts)
    if splinestep is None:
        ret['continuum'] = False
    else:
        ret['splinestep'] = max(
            splinestep,
            3e5 * (np.exp((logl1 - logl0) / maxcontpts) - 1))
    return ret


def get_continuum(lam0, spec0, espec0, ccfconf=None):
    """Robust smooth continuum of one spectrum: quadratic spline in
    log-flux with nodes every splinestep km/s, soft-L1 loss.  Thin
    single-spectrum wrapper over the batched IRLS fitter
    (ops/continuum.py; reference semantics: make_ccf.py:105-152)."""
    return continuum_mod.fit_continuum(lam0, spec0, espec0,
                                       ccfconf=ccfconf)


def preprocess_model(logl, lammodel, model0, vsini=None, ccfconf=None):
    """Continuum-normalize (optionally rotation-broaden) one template
    and resample onto the uniform log-lambda CCF grid
    (reference: make_ccf.py:167-214)."""
    if vsini is not None and vsini != 0:
        # template grids are log-uniform; use the analytic kernel
        lnstep = np.log(lammodel[1] / lammodel[0])
        hw = vsini_mod.kernel_half_width(float(vsini), lnstep)
        kern = np.asarray(vsini_mod.rotation_kernel(
            float(vsini), lnstep, hw))
        m = scipy.signal.convolve(model0, kern, mode='same')
    else:
        m = model0
    if ccfconf['continuum']:
        cont = get_continuum(lammodel, m,
                             np.maximum(m * 1e-5, 1e-2 * np.median(m)),
                             ccfconf=ccfconf)
        cont = np.maximum(cont, 1e-2 * np.median(cont))
    else:
        cont = 1.0
    if not (np.log(lammodel[0]) <= logl[0] <= np.log(lammodel[-1])) or \
            not (np.log(lammodel[0]) <= logl[-1] <= np.log(lammodel[-1])):
        logging.warning('CCF wavelength range exceeds template coverage')
    return scipy.interpolate.interp1d(np.log(lammodel), m / cont,
                                      bounds_error=False,
                                      fill_value=1.0)(logl)


def preprocess_model_list(lammodels, models, params, ccfconf, vsinis=None,
                          chunk=256):
    """Prepare all (template x vsini) combinations, vectorized over
    templates: one batched robust-continuum program per chunk instead
    of the reference's per-template Python loop
    (reference: make_ccf.py:217-285).
    """
    logl = np.linspace(ccfconf['logl0'], ccfconf['logl1'],
                       ccfconf['npoints'])
    lammodels = np.asarray(lammodels, np.float64)
    models = np.asarray(models, np.float64)
    if vsinis is None:
        vsinis = [None]

    # expand the (template x vsini) grid; each vsini broadens the
    # whole template block with one shared kernel
    blocks, retparams, retvsinis = [], [], []
    lnstep = np.log(lammodels[1] / lammodels[0])
    for vsini in vsinis:
        if vsini is not None and vsini != 0:
            hw = vsini_mod.kernel_half_width(float(vsini), lnstep)
            kern = np.asarray(vsini_mod.rotation_kernel(
                float(vsini), lnstep, hw))[None, :]
            blk = scipy.signal.fftconvolve(models, kern, mode='same',
                                           axes=1)
        else:
            blk = models
        blocks.append(blk)
        retparams.extend(list(params))
        retvsinis.extend([vsini] * len(models))
    big = np.concatenate(blocks, axis=0)              # (M, npixt)

    if ccfconf['continuum']:
        med = np.median(big, axis=1)
        espec = np.maximum(big * 1e-5, 1e-2 * med[:, None])
        conts = []
        for i0 in range(0, len(big), chunk):
            conts.append(continuum_mod.fit_continuum(
                lammodels, big[i0:i0 + chunk], espec[i0:i0 + chunk],
                ccfconf=ccfconf))
            logging.info('CCF template continua %d/%d',
                         min(i0 + chunk, len(big)), len(big))
        cont = np.concatenate(conts, axis=0)
        cmed = np.median(cont, axis=1)
        cont = np.maximum(cont, 1e-2 * cmed[:, None])
        big = big / cont

    if not (np.log(lammodels[0]) <= logl[0] <= np.log(lammodels[-1])) \
            or not (np.log(lammodels[0]) <= logl[-1]
                    <= np.log(lammodels[-1])):
        logging.warning('CCF wavelength range exceeds template coverage')

    # shared-grid linear resample of all rows onto the log-lambda grid
    loglam = np.log(lammodels)
    pos = np.searchsorted(loglam, logl) - 1
    ins = (pos >= 0) & (pos <= len(loglam) - 2)
    out = np.ones((len(big), len(logl)))
    li = pos[ins]
    w = (logl[ins] - loglam[li]) / (loglam[li + 1] - loglam[li])
    out[:, ins] = big[:, li] * (1 - w)[None, :] \
        + big[:, li + 1] * w[None, :]
    return out, np.array(retparams), retvsinis


def interp_masker(lam, spec, badmask):
    """Fill bad pixels by linear interpolation from good neighbors
    (edges use the nearest good value).  Single-spectrum wrapper over
    the vectorized infill (ops/continuum.py; reference semantics:
    make_ccf.py:288-327)."""
    return continuum_mod.infill_bad_pixels(
        lam, np.asarray(spec)[None, :],
        np.asarray(badmask, bool)[None, :])[0]


def preprocess_data(lam, spec0, espec, ccfconf=None, badmask=None,
                    maxerr=10):
    """Mask/infill/normalize an observed spectrum and resample onto
    the CCF log-lambda grid with ivar propagation.  Single-spectrum
    wrapper over the batched preprocessing (ops/continuum.py;
    reference semantics: make_ccf.py:330-414)."""
    res1, res2 = continuum_mod.preprocess_batch(
        lam, np.asarray(spec0)[None, :], np.asarray(espec)[None, :],
        badmask=None if badmask is None else
        np.asarray(badmask, bool)[None, :],
        ccfconf=ccfconf, maxerr=maxerr)
    return res1[0], res2[0]


def ccf_executor(spec_setup, ccfconf, prefix=None, oprefix=None, every=10,
                 vsinis=None, revision='', cmdline=''):
    """Build and save the CCF artifacts for one setup
    (reference: make_ccf.py:417-493)."""
    d = serializer.load_dict_from_hdf5(
        os.path.join(prefix, SPECS_H5_NAME % spec_setup))
    vec, specs, lam = d['vec'], np.asarray(d['specs']), d['lam']
    parnames = list(d['parnames'])
    if d.get('log_spec', True):
        specs = np.exp(specs)

    morton = get_mortoncurve_id(np.asarray(vec).T)
    inds = np.argsort(morton)[::every]
    specs = specs[inds]
    vec = np.asarray(vec).T[inds]

    models, params, vsinis_list = preprocess_model_list(
        lam, specs, vec, ccfconf, vsinis=vsinis)
    ffts = np.fft.rfft(models, axis=1)
    fft2s = np.fft.rfft(models**2, axis=1)

    cont = ccfconf['continuum']
    os.makedirs(oprefix, exist_ok=True)
    info = dict(params=params, ccfconf=ccfconf,
                vsinis=[-1.0 if v is None else float(v)
                        for v in vsinis_list],
                vsini_is_none=[v is None for v in vsinis_list],
                parnames=parnames, revision=revision, cmdline=cmdline,
                git_rev=git_rev)
    serializer.save_dict_to_hdf5(
        os.path.join(oprefix, get_ccf_info_name(spec_setup, cont)), info)
    np.savez(os.path.join(oprefix, get_ccf_dat_name(spec_setup, cont)),
             fft=ffts, fft2=fft2s)
    np.save(os.path.join(oprefix, get_ccf_mod_name(spec_setup, cont)),
            models)
    logging.info('wrote %d CCF templates for %s', len(models), spec_setup)


def to_power_two(i):
    return 2**int(np.ceil(np.log2(i)))


def main(args=None):
    if args is None:
        args = sys.argv[1:]
    cmdline = shlex.join(['rvst_make_ccf'] + list(args))
    parser = argparse.ArgumentParser(
        description='Create Fourier-transformed CCF templates')
    parser.add_argument('--prefix', type=str, required=True)
    parser.add_argument('--oprefix', type=str, default='templ_data/')
    parser.add_argument('--setup', type=str, required=True)
    parser.add_argument('--lambda0', type=float, required=True)
    parser.add_argument('--lambda1', type=float, required=True)
    parser.add_argument('--step', type=float, required=True)
    parser.add_argument('--nocontinuum', action='store_true',
                        default=False)
    parser.add_argument('--revision', type=str, default='')
    parser.add_argument('--vsinis', type=str, default=None,
                        help='comma-separated vsini values')
    parser.add_argument('--every', type=int, default=30)
    args = parser.parse_args(args)

    npoints = to_power_two(int((args.lambda1 - args.lambda0) / args.step))
    ccfconf = get_ccf_config(
        logl0=np.log(args.lambda0), logl1=np.log(args.lambda1),
        npoints=npoints,
        splinestep=None if args.nocontinuum else 1000)
    vsinis = None
    if args.vsinis is not None:
        vsinis = [float(x) for x in args.vsinis.split(',')]
    ccf_executor(args.setup, ccfconf, args.prefix, args.oprefix,
                 args.every, vsinis, revision=args.revision,
                 cmdline=cmdline)


if __name__ == '__main__':
    main()
