#!/usr/bin/env python
"""Diagnose BAD_HESSIAN fibers of the bench pipeline.

Runs the production pipeline on the bench exposure, then for every
fiber whose Hessian inversion failed (or whose inverse had negative
diagonal entries) prints: the fitted parameters, their distance to
the template-grid edges, the Hessian eigenvalues, and the truth
values.  This answers VERDICT round-2 item #3: each warning should
map to an explanation (grid-edge pinning / degenerate direction),
not a mystery.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NFIBERS = 500
MICROBATCH = 125


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

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
    arms_data, truth = simulation.make_exposure(
        NFIBERS, npix_arm=1024, snr=50.0, seed=7)
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
    with np.errstate(divide='ignore'):
        cres = ccf_mod.fit_batch(
            [(a.name, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
             for a in arms], config, banks=banks, microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)
    nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
    pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'], steps=3)
    vel_b, params_b, _ = mapper.unpack_host(pol['x'])
    ref = bf.refine_velocities(vel_b, params_b)

    # recompute hessians and inspect
    import jax.numpy as jnp
    from rvspecfit_tpu.fit.likelihood import chisq_trials_core

    def half_chisq(arms_slice, templates, vel, param, vsini):
        return 0.5 * chisq_trials_core(
            arms_slice, templates, vel[None], param[None, :],
            vsini[None], badchi=bf.badchi, use_vsini=bf.use_vsini,
            half_widths=bf._half_widths, outside_penalty=True,
            solve_dtype=bf.solve_dtype)[0]

    hess_fn = jax.jit(jax.vmap(jax.hessian(half_chisq, argnums=3),
                               in_axes=(bf.arm_axes_ad, None, 0, 0, 0)))
    hs = np.asarray(bf._run_mb(
        hess_fn, jnp.asarray(ref['best_vel'], bf.dtype),
        jnp.asarray(params_b, bf.dtype),
        jnp.zeros(NFIBERS, bf.dtype), arms=bf.arms_ad), np.float64)

    errs, covars, bad = bf.hessian_errors(ref['best_vel'], params_b,
                                          parnames=tm.parnames)
    print(f'bad hessians: {bad.sum()} / {NFIBERS}')
    lo = np.array([4000.0, 0.5, -2.0, 0.0])
    hi = np.array([10000.0, 5.0, 0.0, 1.0])
    names = tm.parnames
    for i in np.nonzero(bad)[0]:
        p = params_b[i]
        at_edge = [(names[j], round(float(p[j]), 3))
                   for j in range(4)
                   if p[j] <= lo[j] + 1e-3 * (hi[j] - lo[j])
                   or p[j] >= hi[j] - 1e-3 * (hi[j] - lo[j])]
        h_i = hs[i]
        if not np.isfinite(h_i).all():
            ev = 'non-finite Hessian entries'
        else:
            try:
                evals = np.linalg.eigvalsh(h_i)
                ev = (f'{np.format_float_scientific(evals[0], 2)}..'
                      f'{np.format_float_scientific(evals[-1], 2)}')
            except np.linalg.LinAlgError:
                ev = 'eigvalsh did not converge'
        print(f'fiber {i}: params={np.round(p, 3)} '
              f'truth=({truth["teff"][i]:.0f},{truth["logg"][i]:.2f},'
              f'{truth["feh"][i]:.2f},{truth["alpha"][i]:.2f}) '
              f'vel={ref["best_vel"][i]:+.1f} '
              f'eigvals={ev} '
              f'at_edge={at_edge}')


if __name__ == '__main__':
    main()
