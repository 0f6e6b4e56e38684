"""Shared setup for the on-chip sweep/A-B tools.

Every sweep tool drives the same synthetic 500-fiber 3-arm bench
exposure through the production BatchedFitter; this module owns that
~55-line setup so the tools cannot drift apart (same templates, same
CCF bank cache, same mapper and fitter options as bench.py).
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NFIBERS = int(os.environ.get('SWEEP_NFIBERS', '500'))
MICROBATCH = int(os.environ.get('SWEEP_MICROBATCH', str(NFIBERS)))


def enable_cache():
    from rvspecfit_tpu.utils import enable_compilation_cache
    enable_compilation_cache()


def build_setup(nfibers=None, microbatch=None, npoly=10, warm=True,
                skip=('models', 'hessian'), snr=50.0, seed=7):
    """Build the bench exposure + fitter.

    Returns a dict with bf, mapper, truth, arms, banks, config, tm
    and ``run_ccf()`` (returns the CCF result dict).  ``skip`` follows
    BatchedFitter.warm — sweeps that never call hessian_errors or
    best_models should leave both skipped (warming them inflates the
    reported warm-up on remote-compile backends).
    """
    enable_cache()
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
    from rvspecfit_tpu.fit import ccf as ccf_mod
    from rvspecfit_tpu.fit import vel_fit
    from rvspecfit_tpu.utils import freeze

    nfibers = nfibers or NFIBERS
    microbatch = microbatch or min(MICROBATCH, nfibers)
    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=True, template_lib=''))
    tm = simulation.build_template_model(6, 6, 6, 4, npix=4096,
                                         lam0=4550.0, lam1=5450.0)
    arms_data, truth = simulation.make_exposure(nfibers, npix_arm=1024,
                                                snr=snr, seed=seed)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}
    bank = simulation.build_ccf_bank_cached(
        os.path.join(_REPO, '.bench_ccf_bank.npy'),
        nt=6, nl=6, nf=6, na=4, npix=4096,
        lam0=4550.0, lam1=5450.0, every=8)
    banks = {n: bank for n in arms_data}
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    bf = BatchedFitter(arms, templates, config, options={'npoly': npoly},
                       microbatch=microbatch)
    if warm:
        t0 = time.time()
        bf.warm(mapper, skip=skip)
        print(f'threaded warm-up: {time.time() - t0:.1f} s', flush=True)

    def run_ccf(ccf_microbatch=None):
        with np.errstate(divide='ignore'):
            return ccf_mod.fit_batch(
                [(a.name, a.lam, a.flux,
                  1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
                 for a in arms], config, banks=banks,
                microbatch=ccf_microbatch)

    return dict(bf=bf, mapper=mapper, truth=truth, arms=arms,
                banks=banks, config=config, tm=tm, run_ccf=run_ccf,
                nfibers=nfibers)
