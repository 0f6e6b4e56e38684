#!/usr/bin/env python
"""Time the compiled NM init/chunk programs directly on chip.

Separates the NM phase wall into: init-eval cost, per-chunk device
cost at full width (and how it scales down the tile-width ladder),
and the host fetch/repack overhead between rounds — the breakdown the
MFU accounting can't see (shrink evaluations and frozen-but-padded
instances are invisible to the executed-trial counter).
"""
import os
import time

import numpy as np

from _sweep_common import build_setup, NFIBERS


def main():
    import jax
    import jax.numpy as jnp
    from rvspecfit_tpu.fit import neldermead as nm
    from rvspecfit_tpu.fit import vel_fit

    s = build_setup(warm=False)
    bf, mapper = s['bf'], s['mapper']
    cres = s['run_ccf']()
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
