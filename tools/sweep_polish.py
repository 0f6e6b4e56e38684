"""On-chip A/B of the gradient-polish stage configurations.

The polish (``second_minimizer``) costs ~1.6 s of the 9.7 s steady
exposure; its dominant device cost is the per-step AD Hessian
(forward-over-reverse, ~n tangents x the gradient cost).  This sweep
measures, from one shared NM result:

* steps 3 vs 2 (the step ladder already tries fractional steps, so
  fewer Newton iterations may suffice), and
* RVST_POLISH_FREEZE_H=1 (Hessian evaluated once per tile, gradient
  every step) vs the default re-evaluated Hessian,

against wall time, the post-refine chi-square, and RV recovery.
Quality gate: median/95p delta-chi-square vs the best configuration
and the fraction of fibers worse by >1.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NFIBERS = 500
MICROBATCH = 500


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
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
    arms_data, truth = simulation.make_exposure(NFIBERS, npix_arm=1024,
                                                snr=50.0, seed=7)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}
    bank_cache = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        '.bench_ccf_bank.npy')
    bank = simulation.build_ccf_bank_cached(
        bank_cache, nt=6, nl=6, nf=6, na=4, npix=4096,
        lam0=4550.0, lam1=5450.0, every=8)
    banks = {n: bank for n in arms_data}
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)

    bf = BatchedFitter(arms, templates, config, options={'npoly': 10},
                       microbatch=MICROBATCH)
    t0 = time.time()
    bf.warm(mapper, skip=('models',))
    print(f'threaded warm-up: {time.time() - t0:.1f} s', flush=True)

    with np.errstate(divide='ignore'):
        cres = ccf_mod.fit_batch(
            [(a.name, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
             for a in arms], config, banks=banks, microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)
    nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
    print(f'shared NM done: {int(nmres["converged"].sum())}/{NFIBERS} '
          'converged', flush=True)

    def run(steps, freeze_h):
        if freeze_h:
            os.environ['RVST_POLISH_FREEZE_H'] = '1'
        else:
            os.environ.pop('RVST_POLISH_FREEZE_H', None)
        # warm (first call compiles/ingests), then time a steady call
        bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                      steps=steps)
        t0 = time.time()
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=steps)
        t_pol = time.time() - t0
        vel_b, params_b, _ = mapper.unpack_host(pol['x'])
        t0 = time.time()
        ref = bf.refine_velocities(vel_b, params_b)
        t_ref = time.time() - t0
        dv = ref['best_vel'] - truth['vel']
        return dict(t_pol=round(t_pol, 2), t_ref=round(t_ref, 2),
                    fun=np.asarray(pol['fun'], np.float64),
                    nmoved=int(pol['moved'].sum()),
                    med_adv=round(float(np.median(np.abs(dv))), 4),
                    p95_adv=round(float(np.percentile(np.abs(dv), 95)),
                                  3))

    configs = [(3, False), (3, True), (2, False), (2, True)]
    results = []
    for steps, fh in configs:
        r = run(steps, fh)
        results.append((steps, fh, r))
    base_fun = results[0][2]['fun']
    for steps, fh, r in results:
        dchi = r['fun'] - base_fun
        out = dict(steps=steps, freeze_h=fh, t_pol=r['t_pol'],
                   t_ref=r['t_ref'], nmoved=r['nmoved'],
                   med_adv=r['med_adv'], p95_adv=r['p95_adv'],
                   med_dchi=round(float(np.median(dchi)), 4),
                   p95_dchi=round(float(np.percentile(dchi, 95)), 4),
                   n_dchi_gt1=int((dchi > 1.0).sum()))
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
