"""Statistical accuracy harness: RV pull-distribution check.

Equivalent of the reference accuracy harness
(reference: tests/accuracy.py + tests/runall_accuracy.py): fit many
randomized synthetic spectra at a given S/N and report the median RV
bias, the median reported uncertainty, the RV scatter, and the pull
standard deviation std((v_fit - v_true)/sigma_v), which should be ~1
when the errors are calibrated.

The reference farms 1000 fits over a 24-process CPU pool; here the
whole trial set is one fiber batch through the batched TPU fitter.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.utils import freeze

C_KMS = 299792.458


def run_accuracy(ntrials=1000, snr=300.0, npix=400, resol=1000.0,
                 seed=1, templates=None, config=None, microbatch=None,
                 fit_start=(6000.0, 3.0, -1.0, 0.5), npoly=10,
                 nm_chunk=64, fatol=None, maxiter=None):
    """Fit ``ntrials`` random synthetic spectra; return pull statistics.

    Runs the production pipeline (NM with the loose production
    defaults + the gradient polish + exact velocity refinement).
    """
    if config is None:
        config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                             max_vsini=500, min_vsini=1e-2,
                             min_vel_step=0.2, second_minimizer=True,
                             template_lib=''))
    if templates is None:
        tm = simulation.build_template_model(6, 6, 6, 4, npix=4096)
        templates = {'acc': tm}
    else:
        tm = templates['acc']

    rng = np.random.RandomState(seed)
    v0 = rng.uniform(-500, 500, ntrials)
    teff = rng.uniform(4500, 9500, ntrials)
    logg = rng.uniform(1.0, 4.5, ntrials)
    feh = rng.uniform(-1.8, -0.2, ntrials)
    alpha = rng.uniform(0.1, 0.9, ntrials)

    lam = np.linspace(4600, 5400, npix)
    wres = 5000.0 / resol / 2.35
    flux = np.zeros((ntrials, npix))
    ivar = np.zeros((ntrials, npix))
    for i in range(ntrials):
        lam_rest = lam / (1 + v0[i] / C_KMS)
        sp = simulation.fake_spectrum(lam_rest, teff[i], logg[i], feh[i],
                                      alpha[i], wresol=wres)
        esp = sp / snr
        flux[i] = sp + rng.normal(size=npix) * esp
        ivar[i] = 1.0 / esp**2

    arm = BatchArm('acc', lam, flux, ivar)
    bf = BatchedFitter([arm], templates, config,
                       options={'npoly': npoly}, microbatch=microbatch)
    scan = bf.scan_velocities(
        np.arange(config['min_vel'], config['max_vel'],
                  config['vel_step0']),
        np.tile(fit_start, (ntrials, 1)))
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(zip(tm.parnames, fit_start)), [], None, False)
    nm_kwargs = dict(nm_chunk=nm_chunk)
    if fatol is not None:
        nm_kwargs['fatol'] = fatol
    if maxiter is not None:
        nm_kwargs['maxiter'] = maxiter
    nmres = bf.run_neldermead(mapper, scan['best_vel'], **nm_kwargs)
    xbest, fun = nmres['x'], nmres['fun']
    if config.get('second_minimizer'):
        pol = bf.run_polish(mapper, xbest, fun0=fun, steps=3)
        xbest = pol['x']
    vel_b, params_b, _ = mapper.unpack_host(xbest)
    ref = bf.refine_velocities(vel_b, params_b)

    dv = ref['best_vel'] - v0
    sig = ref['vel_err']
    pull = dv / np.where(sig > 0, sig, np.inf)
    stats = dict(
        ntrials=int(ntrials), snr=float(snr),
        median_bias=float(np.median(dv)),
        median_err=float(np.median(sig)),
        scatter=float(0.5 * np.subtract(*np.percentile(dv, [84, 16]))),
        # pull_std is the reference's metric — a plain np.std of the
        # pulls (reference: tests/runall_accuracy.py:30-39), which IS
        # sensitive to the tails the pull test exists to catch;
        # pull_std_robust (percentile-based) is reported alongside to
        # separate core calibration from outlier fibers
        pull_std=float(np.std(pull)),
        pull_std_robust=float(
            0.5 * np.subtract(*np.percentile(pull, [84, 16]))),
        frac_within_3sig=float(np.mean(np.abs(pull) < 3)),
    )
    return stats, dict(v0=v0, vfit=ref['best_vel'], verr=sig,
                       params=params_b)


def main(args=None):
    parser = argparse.ArgumentParser(
        description='RV accuracy / pull-distribution harness')
    parser.add_argument('--ntrials', type=int, default=1000)
    parser.add_argument('--snr', type=float, default=300.0)
    parser.add_argument('--npix', type=int, default=400)
    parser.add_argument('--seed', type=int, default=1)
    parser.add_argument('--microbatch', type=int, default=None)
    parser.add_argument('--nm_chunk', type=int, default=64,
                        help='chunked NM for remote TPU backends')
    parser.add_argument('--fatol', type=float, default=None)
    parser.add_argument('--maxiter', type=int, default=None)
    parser.add_argument('--output', type=str, default=None,
                        help='also write the stats (plus git rev / '
                        'device / timestamp provenance) to this JSON '
                        'file — used for the committed VALIDATION.json '
                        'calibration artifact')
    args = parser.parse_args(args)
    logging.basicConfig(level=logging.INFO)
    # honor JAX_PLATFORMS even when a site hook pre-imported jax with
    # a pinned platform (env alone is ignored once jax is in
    # sys.modules — same pattern as tests/conftest.py)
    from rvspecfit_tpu.utils import (enable_compilation_cache,
                                     honor_jax_platforms_env)
    honor_jax_platforms_env()
    enable_compilation_cache()
    stats, _ = run_accuracy(ntrials=args.ntrials, snr=args.snr,
                            npix=args.npix, seed=args.seed,
                            microbatch=args.microbatch,
                            nm_chunk=args.nm_chunk, fatol=args.fatol,
                            maxiter=args.maxiter)
    print(json.dumps(stats))
    if args.output:
        import datetime
        import subprocess
        import jax
        rec = dict(stats)
        try:
            rec['git_rev'] = subprocess.check_output(
                ['git', 'rev-parse', 'HEAD'],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))).decode().strip()
        except Exception:
            rec['git_rev'] = 'unknown'
        rec['device'] = str(jax.devices()[0])
        rec['backend'] = jax.default_backend()
        rec['date'] = datetime.datetime.now().isoformat()
        with open(args.output, 'w') as fp:
            json.dump(rec, fp, indent=1)


if __name__ == '__main__':
    main()
