"""On-chip sweep of the NM initial-simplex scale vs fit quality.

The CCF start is typically within a few km/s / one grid cell of the
optimum, so a smaller-than-natural first simplex may converge in fewer
iterations; too small and it must rebuild its size through expansions
(or converge prematurely to the wrong basin).  The scale is a program
INPUT (run_neldermead reads RVST_NM_SIMPLEX_SCALE per call), so the
whole sweep shares one compiled program set.
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

    with np.errstate(divide='ignore'):
        cres = ccf_mod.fit_batch(
            [(a.name, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
             for a in arms], config, banks=banks)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    def run(scale):
        os.environ['RVST_NM_SIMPLEX_SCALE'] = str(scale)
        t0 = time.time()
        nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
        t_nm = time.time() - t0
        t0 = time.time()
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=3)
        t_pol = time.time() - t0
        xbest, fun = pol['x'], pol['fun']
        vel_b, params_b, _ = mapper.unpack_host(xbest)
        ref = bf.refine_velocities(vel_b, params_b)
        dv = ref['best_vel'] - truth['vel']
        return dict(t_nm=round(t_nm, 2), t_pol=round(t_pol, 2),
                    fun=np.asarray(fun, np.float64),
                    med_adv=round(float(np.median(np.abs(dv))), 4),
                    p95_adv=round(float(np.percentile(np.abs(dv), 95)),
                                  3),
                    evals=int(nmres.get('obj_evals', 0)),
                    nconv=int(nmres['converged'].sum()))

    scales = [float(s) for s in (sys.argv[1:] or
                                 ['1.0', '1.0', '0.7', '0.5', '0.35',
                                  '0.25'])]
    base_fun = None
    for i, s in enumerate(scales):
        r = run(s)
        if i == 0:
            print(f'warm-up pass done ({r["t_nm"]:.1f}s NM)', flush=True)
            continue
        if base_fun is None:
            base_fun = r['fun']
        dchi = r['fun'] - base_fun
        out = dict(scale=s, t_nm=r['t_nm'], t_pol=r['t_pol'],
                   med_adv=r['med_adv'], p95_adv=r['p95_adv'],
                   nconv=r['nconv'], evals=r['evals'],
                   med_dchi=round(float(np.median(dchi)), 4),
                   p95_dchi=round(float(np.percentile(dchi, 95)), 3),
                   n_dchi_gt1=int((dchi > 1.0).sum()))
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
