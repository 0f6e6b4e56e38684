#!/usr/bin/env python
"""Time the compiled NM init/chunk programs directly on chip.

Separates the NM phase wall into: init-eval cost, per-chunk device
cost at full width (and how it scales down the tile-width ladder),
and the host fetch/repack overhead between rounds — the breakdown the
MFU accounting can't see (shrink evaluations and frozen-but-padded
instances are invisible to the executed-trial counter).
"""
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
    import jax.numpy as jnp

    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
    from rvspecfit_tpu.fit import ccf as ccf_mod
    from rvspecfit_tpu.fit import vel_fit
    from rvspecfit_tpu.fit import neldermead as nm
    from rvspecfit_tpu.utils import freeze

    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=True, template_lib=''))
    tm = simulation.build_template_model(6, 6, 6, 4, npix=4096,
                                         lam0=4550.0, lam1=5450.0)
    arms_data, _ = simulation.make_exposure(NFIBERS, npix_arm=1024,
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

    scales = mapper.scales().astype(np.float64)
    xatol = tuple(scales * float(os.environ.get('RVST_NM_XATOL_FRAC',
                                                '0.08')))
    chunk = 64
    init_p, chunk_p = bf._nm_programs(mapper, None, 5e-2, xatol, chunk)
    dt = bf.dtype

    simplex = np.array(nm.build_simplex(
        jnp.asarray(x0), scales, seed=vel_fit.SIMPLEX_SEED), np.float64)
    idx = jnp.asarray(np.arange(NFIBERS), jnp.int32)

    # --- init program
    out = jax.block_until_ready(init_p(jnp.asarray(simplex, dt), idx,
                                       bf.arms, bf.templates))
    t0 = time.perf_counter()
    out = jax.block_until_ready(init_p(jnp.asarray(simplex, dt), idx,
                                       bf.arms, bf.templates))
    t_init = time.perf_counter() - t0
    p = np.asarray(out, np.float64)
    np1 = simplex.shape[1]
    nvec = simplex.shape[2]
    sim = p[:, :np1 * nvec].reshape(-1, np1, nvec)
    fv = p[:, np1 * nvec:np1 * nvec + np1]
    done = p[:, -2] > 0.5
    print(f'init: {t_init*1e3:.1f} ms ({int(done.sum())} converged at '
          f'start)', flush=True)

    # --- chunk rounds at full width, as the production driver runs them
    total_iters = 0
    for rnd in range(6):
        t0 = time.perf_counter()
        out = jax.block_until_ready(chunk_p(
            jnp.asarray(sim, dt), jnp.asarray(fv, dt),
            jnp.asarray(done), idx, bf.arms, bf.templates))
        t_rnd = time.perf_counter() - t0
        p = np.asarray(out, np.float64)
        sim = p[:, :np1 * nvec].reshape(-1, np1, nvec)
        fv = p[:, np1 * nvec:np1 * nvec + np1]
        done = p[:, -2] > 0.5
        it = int(p[0, -1])
        total_iters += it
        print(f'round {rnd}: {t_rnd:.3f} s for {it} iters '
              f'({t_rnd/max(it,1)*1e3:.1f} ms/iter), '
              f'{int((~done).sum())}/{NFIBERS} unconverged', flush=True)
        if done.all():
            break
    print(f'total: {total_iters} iters', flush=True)


if __name__ == '__main__':
    main()
