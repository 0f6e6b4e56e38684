"""Golden tests of the Pallas windowed-DMA spline evaluation kernel
(interpret mode on CPU) against ops.spline.spline_eval_index."""
import numpy as np
import jax.numpy as jnp

from rvspecfit_tpu.ops import spline as spline_mod
from rvspecfit_tpu.ops import pallas_spline as ps


def _setup(npix_t=1500, npix_d=700, log_step=True, rows=3, seed=0):
    rng = np.random.RandomState(seed)
    if log_step:
        lam_t = np.exp(np.linspace(np.log(4500.0), np.log(5500.0),
                                   npix_t))
    else:
        lam_t = np.linspace(4500.0, 5500.0, npix_t)
    geom = spline_mod.SplineGeometry.from_knots(lam_t,
                                                log_step=log_step)
    ys = jnp.asarray(
        1.0 + 0.1 * rng.randn(rows, npix_t).cumsum(axis=1) / 30.0)
    coeffs = spline_mod.spline_coeffs(geom, ys)       # (R, 4, n-1)

    lam_d = np.linspace(4600.0, 5400.0, npix_d)
    idx0 = spline_mod.fractional_index(geom, lam_d)
    # per-row Doppler-like shifts
    shifts = rng.uniform(-30, 30, rows)
    if log_step:
        u = idx0[None, :] + (shifts / 3e5 / geom.step)[:, None]
    else:
        u = idx0[None, :] + (shifts / 3e5)[:, None] \
            * (lam_d / geom.step)[None, :]
    return geom, coeffs, jnp.asarray(u), idx0


def test_kernel_matches_spline_eval_log():
    geom, coeffs, u, idx0 = _setup(log_step=True)
    window = ps.window_size(idx0)
    got, inr = ps.spline_eval_index_pallas(geom, coeffs, u, window,
                                           interpret=True)
    import jax
    ref, inr_ref = jax.vmap(
        lambda c, uu: spline_mod.spline_eval_index(geom, c, uu))(
        coeffs, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-7, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(inr), np.asarray(inr_ref))


def test_kernel_matches_spline_eval_linear():
    geom, coeffs, u, idx0 = _setup(log_step=False, npix_t=1200,
                                   npix_d=513, rows=2, seed=3)
    window = ps.window_size(idx0)
    got, _ = ps.spline_eval_index_pallas(geom, coeffs, u, window,
                                         interpret=True)
    import jax
    ref, _ = jax.vmap(
        lambda c, uu: spline_mod.spline_eval_index(geom, c, uu))(
        coeffs, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-7, atol=1e-9)


def test_batched_fitter_pallas_matches_xla(monkeypatch):
    """The full fused likelihood through the Pallas path (interpret
    mode, vmapped over fibers via the custom batching rule) matches
    the XLA gather path, including the straggler AD-Hessian phase
    which must silently fall back to XLA (no VJP for the kernel)."""
    import os
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
    from rvspecfit_tpu.utils import freeze

    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2,
                         min_vel_step=0.2, second_minimizer=False,
                         template_lib=''))
    tm = simulation.build_template_model(4, 4, 4, 3, npix=1024)
    arms_data, _ = simulation.make_exposure(5, npix_arm=300, seed=0)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}

    import jax
    b = 5
    vels = jnp.asarray(np.tile(np.linspace(-200, 200, 4), (b, 1)))
    params = jnp.asarray(np.tile([6000.0, 3.0, -1.0, 0.5], (b, 4, 1)))
    vsin = jnp.zeros((b, 4))

    monkeypatch.setenv('RVST_PALLAS_SPLINE', 'interpret')
    bf1 = BatchedFitter(arms, templates, config, options={'npoly': 6})
    assert bf1.arms[0].pallas_window is not None
    got = np.asarray(bf1._chisq_fibers(bf1.arms, bf1.templates, vels,
                                       params, vsin))
    errs1, _, _ = bf1.hessian_errors(np.zeros(b),
                                     np.asarray(params[:, 0, :]),
                                     parnames=tm.parnames)

    monkeypatch.setenv('RVST_PALLAS_SPLINE', '0')
    bf0 = BatchedFitter(arms, templates, config, options={'npoly': 6})
    assert bf0.arms[0].pallas_window is None
    ref = np.asarray(bf0._chisq_fibers(bf0.arms, bf0.templates, vels,
                                       params, vsin))
    errs0, _, _ = bf0.hessian_errors(np.zeros(b),
                                     np.asarray(params[:, 0, :]),
                                     parnames=tm.parnames)

    np.testing.assert_allclose(got, ref, rtol=2e-4)
    np.testing.assert_allclose(errs1, errs0, rtol=1e-5)


def test_kernel_odd_sizes_and_small_window():
    """npix not a multiple of the tile; tiny template grid."""
    geom, coeffs, u, idx0 = _setup(npix_t=300, npix_d=301, rows=2,
                                   seed=5)
    window = ps.window_size(idx0, tile=256)
    got, _ = ps.spline_eval_index_pallas(geom, coeffs, u, window,
                                         tile=256, interpret=True)
    import jax
    ref, _ = jax.vmap(
        lambda c, uu: spline_mod.spline_eval_index(geom, c, uu))(
        coeffs, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-7, atol=1e-9)
