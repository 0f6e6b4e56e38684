"""Golden tests of the natural-cubic-spline kernel vs scipy.

Mirrors the reference test strategy (reference: tests/test_spline.py —
C spline vs scipy CubicSpline(bc_type='natural') on linear and log
grids).
"""
import numpy as np
import scipy.interpolate
import jax
import jax.numpy as jnp

from rvspecfit_tpu.ops import spline


def test_linear_grid():
    rng = np.random.RandomState(42)
    x = np.linspace(1000, 2000, 1000)
    y = 1e-5 * x**2 + rng.normal(size=len(x))
    xnew = rng.uniform(1000.001, 1999.0, size=10000)
    ref = scipy.interpolate.CubicSpline(x, y, bc_type='natural')(xnew)

    geom = spline.SplineGeometry.from_knots(x, log_step=False)
    val, ok = spline.spline_fit_eval(geom, jnp.asarray(y), jnp.asarray(xnew))
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(val), ref, rtol=1e-8, atol=1e-8)


def test_log_grid():
    rng = np.random.RandomState(3)
    x = 10**np.linspace(3, 4, 1000)
    y = np.sin(x / 10) + rng.normal(size=len(x))
    xnew = rng.uniform(1001.0, 9000.0, size=10000)
    ref = scipy.interpolate.CubicSpline(x, y, bc_type='natural')(xnew)

    geom = spline.SplineGeometry.from_knots(x, log_step=True)
    val, ok = spline.spline_fit_eval(geom, jnp.asarray(y), jnp.asarray(xnew))
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(val), ref, rtol=1e-7, atol=1e-7)


def test_batched_construct_matches_single():
    rng = np.random.RandomState(7)
    x = np.linspace(1.0, 2.0, 64)
    ys = rng.normal(size=(5, 64))
    geom = spline.SplineGeometry.from_knots(x, log_step=False)
    batched = spline.spline_coeffs(geom, jnp.asarray(ys))
    for i in range(5):
        single = spline.spline_coeffs(geom, jnp.asarray(ys[i]))
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), rtol=1e-12)


def test_out_of_range_masked():
    x = np.linspace(0.0, 1.0, 16)
    y = x**3
    geom = spline.SplineGeometry.from_knots(x, log_step=False)
    q = jnp.asarray([-0.5, 0.5, 1.5])
    val, ok = spline.spline_fit_eval(geom, jnp.asarray(y), q)
    assert np.array_equal(np.asarray(ok), [False, True, False])
    assert np.isfinite(np.asarray(val)).all()


def test_banded_inverse_matches_scan_solve():
    """The banded-inverse construction (geometric grids, n >= 120)
    must agree with the associative-scan tridiagonal solve to float64
    round-off; both paths golden vs scipy elsewhere."""
    import dataclasses
    rng = np.random.RandomState(11)
    for log_step in (False, True):
        x = (10**np.linspace(3, 3.1, 512) if log_step
             else np.linspace(4000.0, 5000.0, 512))
        geom = spline.SplineGeometry.from_knots(x, log_step=log_step)
        assert geom.inv_kernel is not None, 'banded path inactive'
        geom_scan = dataclasses.replace(geom, inv_kernel=None,
                                        inv_top=None, inv_bot=None)
        ys = jnp.asarray(rng.normal(size=(3, 512)))
        banded = np.asarray(spline.spline_coeffs(geom, ys))
        scan = np.asarray(spline.spline_coeffs(geom_scan, ys))
        scale = np.abs(scan).max()
        np.testing.assert_allclose(banded, scan, rtol=0, atol=1e-10 * scale)


def test_jit_and_grad():
    x = np.linspace(1.0, 2.0, 128)
    geom = spline.SplineGeometry.from_knots(x, log_step=False)
    y = jnp.sin(jnp.asarray(x) * 3.0)

    @jax.jit
    def f(shift):
        val, _ = spline.spline_fit_eval(geom, y, jnp.asarray([1.5]) + shift)
        return val[0]

    g = jax.grad(f)(0.0)
    # derivative of sin(3x) at 1.5 is 3 cos(4.5)
    np.testing.assert_allclose(float(g), 3 * np.cos(4.5), rtol=1e-4)
