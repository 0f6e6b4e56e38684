#!/usr/bin/env python
"""On-chip A/B of the Doppler spline evaluation: XLA gather path vs
the Pallas windowed-DMA kernel (ops/pallas_spline.py).

Run on the real TPU (no env overrides).  Prints per-path steady-state
times for a DESI-like shape sweep and the speedup, plus a correctness
check.  Use this to decide whether RVST_PALLAS_SPLINE=1 should become
the default on hardware.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu.ops import spline as spline_mod
from rvspecfit_tpu.ops import pallas_spline as ps


def bench_case(rows, npix_t, npix_d, iters=20):
    rng = np.random.RandomState(0)
    lam_t = np.exp(np.linspace(np.log(4550.0), np.log(5450.0), npix_t))
    geom = spline_mod.SplineGeometry.from_knots(lam_t, log_step=True)
    ys = jnp.asarray((1.0 + 0.03 * rng.randn(rows, npix_t))
                     .astype(np.float32))
    coeffs = spline_mod.spline_coeffs(geom, ys)

    lam_d = np.linspace(4600.0, 5400.0, npix_d)
    idx0 = spline_mod.fractional_index(geom, lam_d)
    shifts = rng.uniform(-300, 300, rows) / 3e5 / geom.step
    u = jnp.asarray((idx0[None, :] + shifts[:, None])
                    .astype(np.float32))
    window = ps.window_size(idx0)

    xla = jax.jit(jax.vmap(
        lambda c, uu: spline_mod.spline_eval_index(geom, c, uu)[0]))
    pall = jax.jit(lambda c, uu: ps.spline_eval_index_pallas(
        geom, c, uu, window)[0])

    a = xla(coeffs, u).block_until_ready()
    b = pall(coeffs, u).block_until_ready()
    err = float(jnp.max(jnp.abs(a - b)))

    def timeit(fn):
        fn(coeffs, u).block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            r = fn(coeffs, u)
        r.block_until_ready()
        return (time.time() - t0) / iters

    t_xla = timeit(xla)
    t_pal = timeit(pall)
    print(f'rows={rows:4d} npix_t={npix_t} npix_d={npix_d} '
          f'window={window}: xla {t_xla*1e3:7.2f} ms  '
          f'pallas {t_pal*1e3:7.2f} ms  speedup {t_xla/t_pal:5.2f}x  '
          f'maxerr {err:.2e}')


def main():
    print('backend:', jax.default_backend(), jax.devices())
    for rows in (32, 125):
        bench_case(rows, 4096, 1024)


if __name__ == '__main__':
    main()
