"""On-chip A/B of the NM stage vs alternating scan/Newton descent.

The velocity refinement is a *global* scan (full-range pass + window
passes) and the gradient polish is a damped-Newton descent over the
template parameters — so alternating them is block-coordinate descent
on (vel | params) that starts from the CCF guess, with no Nelder-Mead
at all.  This measures whether that path reaches the same optima as
the production NM stage at a fraction of its wall time (NM is ~2/3 of
the steady-state cost; round-3 throughput work).

Compares, per fiber, the final refined chi-square and RV against the
full NM(384,2)+polish baseline.
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
             for a in arms], config, banks=banks, microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    def report(tag, t, ref, params_b, base=None):
        dv = ref['best_vel'] - truth['vel']
        out = dict(scheme=tag, t=round(t, 2),
                   med_adv=round(float(np.median(np.abs(dv))), 4),
                   p95_adv=round(float(np.percentile(np.abs(dv), 95)),
                                 3))
        if base is not None:
            dchi = ref['best_chi'] - base['best_chi']
            ddv = np.abs(ref['best_vel'] - base['best_vel'])
            out.update(
                med_dchi=round(float(np.median(dchi)), 4),
                p95_dchi=round(float(np.percentile(dchi, 95)), 3),
                n_dchi_gt1=int((dchi > 1.0).sum()),
                n_dchi_ltm1=int((dchi < -1.0).sum()),
                p95_ddv=round(float(np.percentile(ddv, 95)), 3))
        print(json.dumps(out), flush=True)
        return ref

    def baseline():
        t0 = time.time()
        nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=3)
        vel_b, params_b, _ = mapper.unpack_host(pol['x'])
        ref = bf.refine_velocities(vel_b, params_b)
        return time.time() - t0, ref, params_b

    def newton(rounds):
        """rounds: list of polish step counts; a refine pass runs
        before each polish round and once at the end."""
        t0 = time.time()
        x = x0.copy()
        for steps in rounds:
            vel_b, params_b, _ = mapper.unpack_host(x)
            ref = bf.refine_velocities(vel_b, params_b)
            x[:, 0] = ref['best_vel']
            pol = bf.run_polish(mapper, x, steps=steps)
            x = np.asarray(pol['x'], np.float64)
        vel_b, params_b, _ = mapper.unpack_host(x)
        ref = bf.refine_velocities(vel_b, params_b)
        return time.time() - t0, ref, params_b

    # warm-up passes (compiles): baseline programs + polish(2)
    baseline()
    newton([3, 2])

    t, ref, p = baseline()
    base = report('nm384x2+polish3+refine', t, ref, p)
    for rounds in ([3, 2], [3], [3, 2, 2], [2, 2]):
        t, ref, p = newton(rounds)
        report('newton' + 'x'.join(str(r) for r in rounds), t, ref, p,
               base=base)


if __name__ == '__main__':
    main()
