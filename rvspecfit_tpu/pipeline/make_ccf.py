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
import scipy.optimize
import scipy.signal
import scipy.stats

from rvspecfit_tpu import serializer
from rvspecfit_tpu import __version__ as git_rev
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


def _continuum_model(p, nodes, lam):
    spl = scipy.interpolate.UnivariateSpline(nodes, p, s=0, k=2)
    return np.exp(np.clip(spl(lam), -100, 100))


def _continuum_resid(p, nodes, lam, spec, espec):
    return (_continuum_model(p, nodes, lam) - spec) / espec


def get_continuum(lam0, spec0, espec0, ccfconf=None):
    """Robust smooth continuum: quadratic spline in log-flux with
    nodes every splinestep km/s, soft-L1 least squares
    (reference: make_ccf.py:105-152)."""
    lammin = lam0.min()
    logstep = np.log(1 + ccfconf['splinestep'] / 3e5)
    n = int(np.ceil(np.log(lam0.max() / lammin) / logstep))
    nodes = lammin * np.exp(np.arange(n) * logstep)
    nodesedges = lammin * np.exp((-0.5 + np.arange(n + 1)) * logstep)
    medspec = np.median(spec0)
    if medspec <= 0:
        medspec = abs(medspec) or 1.0
        logging.warning('Spectrum has non-positive median')
    bs = scipy.stats.binned_statistic(lam0, spec0, 'median',
                                      bins=nodesedges)
    p0 = np.log(np.maximum(bs.statistic, 1e-3 * medspec))
    p0[~np.isfinite(p0)] = np.log(medspec)
    res = scipy.optimize.least_squares(
        _continuum_resid, p0, loss='soft_l1',
        args=(nodes, lam0, spec0, espec0))
    return _continuum_model(res['x'], nodes, lam0)


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


def preprocess_model_list(lammodels, models, params, ccfconf, vsinis=None):
    """Prepare all (template x vsini) combinations
    (reference: make_ccf.py:217-285)."""
    logl = np.linspace(ccfconf['logl0'], ccfconf['logl1'],
                       ccfconf['npoints'])
    if vsinis is None:
        vsinis = [None]
    out, retparams, retvsinis = [], [], []
    total = len(models) * len(vsinis)
    i = 0
    for imodel, m0 in enumerate(models):
        for vsini in vsinis:
            out.append(preprocess_model(logl, lammodels, m0, vsini,
                                        ccfconf))
            retparams.append(params[imodel])
            retvsinis.append(vsini)
            i += 1
            if i % max(1, total // 10) == 0:
                logging.info('CCF templates %d/%d', i, total)
    return np.array(out), np.array(retparams), retvsinis


def interp_masker(lam, spec, badmask):
    """Fill bad pixels by linear interpolation from good neighbors
    (edges use the nearest good value; reference: make_ccf.py:288-327)."""
    spec1 = np.array(spec)
    xbad = np.nonzero(badmask)[0]
    xgood = np.nonzero(~badmask)[0]
    if len(xgood) == 0:
        logging.warning('All pixels masked for CCF preprocessing')
        spec1[~np.isfinite(spec1)] = 1
        return spec1
    if len(xbad) == 0:
        return spec1
    pos = np.searchsorted(xgood, xbad)
    left = pos == 0
    right = pos == len(xgood)
    mid = ~left & ~right
    l1 = lam[xgood[pos[mid] - 1]]
    l2 = lam[xgood[pos[mid]]]
    s1 = spec[xgood[pos[mid] - 1]]
    s2 = spec[xgood[pos[mid]]]
    l0 = lam[xbad[mid]]
    spec1[xbad[left]] = spec[xgood[0]]
    spec1[xbad[right]] = spec[xgood[-1]]
    spec1[xbad[mid]] = (-(l1 - l0) * s2 + (l2 - l0) * s1) / (l2 - l1)
    return spec1


def preprocess_data(lam, spec0, espec, ccfconf=None, badmask=None,
                    maxerr=10):
    """Mask/infill/normalize an observed spectrum and resample onto
    the CCF log-lambda grid with ivar propagation
    (reference: make_ccf.py:330-414)."""
    ccf_logl = np.linspace(ccfconf['logl0'], ccfconf['logl1'],
                           ccfconf['npoints'])
    ccf_lam = np.exp(ccf_logl)
    curespec = np.array(espec)
    curspec = np.array(spec0)
    if badmask is None:
        badmask = np.zeros(len(curespec), dtype=bool)
    else:
        badmask = np.array(badmask, dtype=bool)
    filtspec = scipy.signal.medfilt(curspec, 11)
    mederr = np.nanmedian(curespec)
    if ccfconf['continuum']:
        badmask |= (curespec > maxerr * mederr) | (filtspec <= 0)
    curespec[badmask] = 1e9 * mederr
    curspec = interp_masker(lam, curspec, badmask)
    if ccfconf['continuum']:
        cont = get_continuum(lam, curspec, curespec, ccfconf=ccfconf)
    else:
        cont = np.ones(len(lam))
    curivar = 1.0 / curespec**2
    curivar[badmask] = 0
    medv = np.median(curspec)
    if medv > 0:
        cont = np.maximum(1e-2 * medv, cont)
    else:
        cont = np.maximum(cont, 1)
    c_spec = np.asarray(spec0) / cont
    curivar = cont**2 * curivar
    c_spec[badmask] = 0

    xind = np.searchsorted(lam, ccf_lam) - 1
    insub = (xind >= 0) & (xind <= len(lam) - 2)
    res1 = np.zeros(len(ccf_logl))
    res2 = np.zeros(len(ccf_logl))
    li = xind[insub]
    ri = li + 1
    rw = (ccf_lam[insub] - lam[li]) / (lam[ri] - lam[li])
    lw = 1 - rw
    res1[insub] = lw * c_spec[li] + rw * c_spec[ri]
    liv, riv = curivar[li], curivar[ri]
    res2[insub] = liv * riv / (lw**2 * riv + rw**2 * liv +
                               ((liv * riv) == 0).astype(int))
    return res1, res2


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
