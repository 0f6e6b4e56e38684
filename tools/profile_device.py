#!/usr/bin/env python
"""Loop-amortized device timing of the likelihood's building blocks.

Each component runs R times inside one jitted fori_loop with the
output fed back into the carry (so XLA cannot dead-code it), which
amortizes the ~25 ms axon dispatch latency and exposes true device
time per call.  This is the breakdown behind the NM phase's
~10.8 ms/iteration device cost.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NFIBERS = 500
NPIX_ARM = 1024
MICROBATCH = int(os.environ.get('PROF_MICROBATCH', '125'))
K = 4
R = 20  # repetitions inside the loop


def main():
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    import jax.numpy as jnp
    print(f'backend: {jax.default_backend()}', flush=True)

    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
    from rvspecfit_tpu.fit import vel_fit
    from rvspecfit_tpu.fit.likelihood import (template_stage,
                                              _eval_doppler)
    from rvspecfit_tpu.ops import spline as spline_mod
    from rvspecfit_tpu.ops import chisq as chisq_mod
    from rvspecfit_tpu.utils import freeze

    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=False, template_lib=''))
    tm = simulation.build_template_model(6, 6, 6, 4, npix=4096,
                                         lam0=4550.0, lam1=5450.0)
    arms_data, _ = simulation.make_exposure(NFIBERS, npix_arm=NPIX_ARM,
                                            snr=50.0, seed=7)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}
    bf = BatchedFitter(arms, templates, config, options={'npoly': 10},
                       microbatch=MICROBATCH)

    dt = bf.dtype
    b = MICROBATCH
    rng = np.random.RandomState(0)
    params = jnp.asarray(np.stack([
        rng.uniform(5000, 9000, (b, K)),
        rng.uniform(1.5, 4.5, (b, K)),
        rng.uniform(-1.8, -0.2, (b, K)),
        rng.uniform(0.1, 0.9, (b, K))], axis=-1), dt)
    vels = jnp.asarray(rng.uniform(-400, 400, (b, K)), dt)
    vsinis = jnp.zeros((b, K), dt)
    arms_tile = bf._slice_arms(0, b, b)

    def loop_time(name, make_body, carry0, n=3):
        """make_body() -> body(i, carry); times R iterations."""
        body = make_body()
        fn = jax.jit(lambda c: jax.lax.fori_loop(0, R, body, c))
        jax.block_until_ready(fn(carry0))  # compile
        t0 = time.perf_counter()
        for _ in range(n):
            out = jax.block_until_ready(fn(carry0))
        per = (time.perf_counter() - t0) / n / R
        print(f'{name:42s} {per*1e3:8.3f} ms/call', flush=True)
        return per

    eps = jnp.asarray(1e-12, dt)

    # full objective
    def mk_full():
        def body(i, c):
            v, p = c
            chi = bf._chisq_fibers.__wrapped__(arms_tile, bf.templates, v, p, vsinis)
            return v + eps * jnp.mean(chi), p
        return body
    t_full = loop_time('full chisq_fibers (B=125,K=4)', mk_full,
                       (vels, params))

    # template interp only
    flatp = params.reshape(-1, 4)

    def mk_interp():
        def body(i, c):
            spec, outside = tm.eval_batch(c)
            return c + eps * jnp.mean(spec)
        return body
    t_int = loop_time('  interp eval_batch (500 trials)', mk_interp, flatp)

    # spline_coeffs only
    spec0, _ = jax.jit(tm.eval_batch)(flatp)

    def mk_coeffs():
        def body(i, c):
            cf = spline_mod.spline_coeffs(tm.geom, c)
            return c + eps * jnp.mean(cf)
        return body
    t_co = loop_time('  spline_coeffs (500 x 4096)', mk_coeffs, spec0)

    # full template stage
    def mk_stage():
        def body(i, c):
            cf, outside, crap, fin = template_stage(tm, c, vsinis.reshape(-1),
                                                    False, None)
            return c + eps * jnp.mean(cf)
        return body
    t_st = loop_time('  template_stage total', mk_stage, flatp)

    # doppler eval per arm (pallas on)
    coeffs0 = jax.jit(
        lambda s: spline_mod.spline_coeffs(tm.geom, s))(spec0)
    cK = coeffs0.reshape(b, K, *coeffs0.shape[1:])
    arm0 = arms_tile[0]

    def mk_dop():
        def body(i, c):
            v, cf = c
            val = jax.vmap(lambda vv, cc: _eval_doppler(arm0, tm, cc, vv))(
                v, cf)
            return v + eps * jnp.mean(val), cf
        return body
    t_dp = loop_time('  eval_doppler 1 arm (Pallas)', mk_dop, (vels, cK))

    # doppler eval per arm, XLA gather path
    import dataclasses as _dc
    arm0_ad = _dc.replace(arm0, pallas_window=None)

    def mk_dop_xla():
        def body(i, c):
            v, cf = c
            val = jax.vmap(
                lambda vv, cc: _eval_doppler(arm0_ad, tm, cc, vv))(v, cf)
            return v + eps * jnp.mean(val), cf
        return body
    t_dpx = loop_time('  eval_doppler 1 arm (XLA gather)', mk_dop_xla,
                      (vels, cK))

    # chisq per arm
    val0 = jax.jit(jax.vmap(
        lambda vv, cc: _eval_doppler(arm0, tm, cc, vv)))(vels, cK)

    def mk_chi():
        def body(i, c):
            def one_fiber(dvec, espinv, lsum, vv):
                return jax.vmap(lambda t: chisq_mod.chisq_continuum_marg(
                    dvec, t * espinv, arm0.polys, lsum))(vv)
            chi = jax.vmap(one_fiber)(arm0.dvec, arm0.espec_inv,
                                      arm0.log_espec_sum, c)
            return c + eps * jnp.mean(chi)[None, None, None]
        return body
    t_ch = loop_time('  chisq_marg 1 arm', mk_chi, val0)

    print(f'accounting: stage {t_st*1e3:.2f} + 3*dop {3*t_dp*1e3:.2f} '
          f'+ 3*chi {3*t_ch*1e3:.2f} = '
          f'{(t_st + 3*t_dp + 3*t_ch)*1e3:.2f} vs full {t_full*1e3:.2f}')


if __name__ == '__main__':
    main()
