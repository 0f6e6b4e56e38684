#!/usr/bin/env python
"""Sweep NM stopping settings against recovery quality on chip.

Builds the bench exposure once, then for each (xatol_frac, fatol,
maxiter, polish_steps) config runs CCF -> NM -> polish -> refine ->
Hessian, reporting phase walls, NM iteration profile, final chi2
statistics, and RV recovery.  The question: how loose can NM run
(fewer iterations) before the Newton polish + exact velocity
refinement stop recovering the same optimum?
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NFIBERS = 500
NPIX_ARM = 1024
MICROBATCH = 125


def main():
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    print(f'backend: {jax.default_backend()}', flush=True)

    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
    from rvspecfit_tpu.fit import ccf as ccf_mod
    from rvspecfit_tpu.fit import vel_fit
    from rvspecfit_tpu.utils import freeze

    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=True, template_lib=''))
    tm = simulation.build_template_model(6, 6, 6, 4, npix=4096,
                                         lam0=4550.0, lam1=5450.0)
    arms_data, truth = simulation.make_exposure(NFIBERS,
                                                npix_arm=NPIX_ARM,
                                                snr=50.0, seed=7)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}
    bank = simulation.build_ccf_bank_cached(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.bench_ccf_bank.npy'),
        nt=6, nl=6, nf=6, na=4, npix=4096, lam0=4550.0, lam1=5450.0,
        every=8)
    banks = {n: bank for n in arms_data}
    bf = BatchedFitter(arms, templates, config, options={'npoly': 10},
                       microbatch=MICROBATCH)
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    scales = mapper.scales()

    with np.errstate(divide='ignore'):
        cres = ccf_mod.fit_batch(
            [(a.name, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
             for a in arms], config, banks=banks, microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    ref_fun = None
    configs = [
        dict(name='baseline', xfrac=0.03, fatol=1e-2, maxiter=768,
             steps=2),
        dict(name='loose8', xfrac=0.08, fatol=5e-2, maxiter=384,
             steps=2),
        dict(name='loose15', xfrac=0.15, fatol=2e-1, maxiter=256,
             steps=3),
        dict(name='loose25', xfrac=0.25, fatol=5e-1, maxiter=192,
             steps=3),
    ]
    for cfg in configs:
        # warm pass (compile) then timed pass
        for it in range(2):
            t0 = time.time()
            nmres = bf.run_neldermead(
                mapper, cres['best_vel'], x0=x0, nm_chunk=64,
                fatol=cfg['fatol'], xatol=tuple(scales * cfg['xfrac']),
                maxiter=cfg['maxiter'])
            t1 = time.time()
            pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                                steps=cfg['steps'])
            t2 = time.time()
            vel_b, params_b, _ = mapper.unpack_host(pol['x'])
            ref = bf.refine_velocities(vel_b, params_b)
            t3 = time.time()
        errs, _, bad = bf.hessian_errors(ref['best_vel'], params_b,
                                         parnames=tm.parnames)
        t4 = time.time()
        dv = ref['best_vel'] - truth['vel']
        ok = np.abs(dv) < np.maximum(10.0, 5 * ref['vel_err'])
        fun = pol['fun']
        if ref_fun is None:
            ref_fun = fun.copy()
        dfun = fun - ref_fun
        print(f"{cfg['name']:9s} NM={t1-t0:5.1f}s pol={t2-t1:4.1f}s "
              f"ref={t3-t2:4.1f}s hes={t4-t3:4.1f}s | "
              f"conv={nmres['converged'].sum():3d} "
              f"ok={ok.sum():3d}/500 "
              f"med|dv|={np.median(np.abs(dv)):.3f} "
              f"dchi2: med={np.median(dfun):+.3f} "
              f"p99={np.percentile(dfun, 99):+.2f} "
              f"max={dfun.max():+.2f} badhess={bad.sum()}",
              flush=True)


if __name__ == '__main__':
    main()
