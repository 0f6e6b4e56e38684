"""Measure threaded vs sequential pipeline warm-up on chip.

Warm-up is dominated by per-program first-execution cost on the
remote-compile TPU backend (server-side executable ingest) even when
every program is a persistent-cache hit (round-3 measurement: 470 s
warm-up, 0 cache writes).  Tracing holds the GIL but the server RPC
wait does not, so dispatching each phase's first call from its own
thread should overlap the ingest.

Each phase gets dummy inputs of the production shape; results are
discarded.  Prints per-phase thread times and the total wall.
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NFIBERS = 500
MICROBATCH = 500


def main():
    t_start = time.time()
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
    print(f'setup: {time.time() - t_start:.1f}s', flush=True)

    x_dummy = np.tile(mapper.start_vector(0.0), (NFIBERS, 1))
    vel_dummy = np.zeros(NFIBERS)
    params_dummy = np.tile(
        np.array([6000.0, 3.0, -1.0, 0.5]), (NFIBERS, 1))

    def w_ccf():
        with np.errstate(divide='ignore'):
            ccf_mod.fit_batch(
                [(a.name, a.lam, a.flux,
                  1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
                 for a in arms], config, banks=banks, microbatch=125)

    def w_nm():
        bf.run_neldermead(mapper, vel_dummy, x0=x_dummy, maxiter=64,
                          maxrestart=1)

    def w_polish():
        bf.run_polish(mapper, x_dummy, steps=3)

    def w_refine():
        bf.refine_velocities(vel_dummy, params_dummy)

    def w_hessian():
        bf.hessian_errors(vel_dummy, params_dummy, parnames=tm.parnames)

    phases = [('ccf', w_ccf), ('nm', w_nm), ('polish', w_polish),
              ('refine', w_refine), ('hessian', w_hessian)]

    t0 = time.time()
    times = {}

    def runner(name, fn):
        t = time.time()
        fn()
        times[name] = time.time() - t
        print(f'  [{time.time() - t0:7.1f}s] {name} warm '
              f'({times[name]:.1f}s in thread)', flush=True)

    threads = [threading.Thread(target=runner, args=p) for p in phases]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    warm_wall = time.time() - t0
    print(f'threaded warm-up wall: {warm_wall:.1f}s '
          f'(sum of phases {sum(times.values()):.1f}s)', flush=True)

    # steady-state check: the real pipeline once, timed
    with np.errstate(divide='ignore'):
        cres = ccf_mod.fit_batch(
            [(a.name, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
             for a in arms], config, banks=banks, microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)
    t0 = time.time()
    with np.errstate(divide='ignore'):
        cres = ccf_mod.fit_batch(
            [(a.name, a.lam, a.flux,
              1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), None)
             for a in arms], config, banks=banks, microbatch=125)
    nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
    pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'], steps=3)
    vel_b, params_b, _ = mapper.unpack_host(pol['x'])
    ref = bf.refine_velocities(vel_b, params_b)
    bf.hessian_errors(ref['best_vel'], params_b, parnames=tm.parnames)
    el = time.time() - t0
    dv = ref['best_vel'] - truth['vel']
    print(f'steady: {el:.2f}s ({NFIBERS / el:.1f} fibers/s) '
          f'med|dv|={np.median(np.abs(dv)):.3f}', flush=True)
    print(f'total: {time.time() - t_start:.1f}s', flush=True)


if __name__ == '__main__':
    main()
