"""C++ CPU spline vs scipy (mirrors reference tests/test_spline.py)."""
import numpy as np
import scipy.interpolate

from rvspecfit_tpu.native import CPUSpline, get_library


def test_native_builds():
    assert get_library() is not None


def test_linear_grid_matches_scipy():
    rng = np.random.RandomState(0)
    x = np.linspace(1000, 2000, 1000)
    y = 1e-5 * x**2 + rng.normal(size=len(x))
    q = rng.uniform(1000.01, 1999.0, size=10000)
    ref = scipy.interpolate.CubicSpline(x, y, bc_type='natural')(q)
    got = CPUSpline(x, y, log_step=False)(q)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_log_grid_matches_scipy():
    rng = np.random.RandomState(1)
    x = 10**np.linspace(3, 4, 1000)
    y = np.sin(x / 10) + rng.normal(size=len(x))
    q = rng.uniform(1001.0, 9000.0, size=10000)
    ref = scipy.interpolate.CubicSpline(x, y, bc_type='natural')(q)
    got = CPUSpline(x, y, log_step=True)(q)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_out_of_range_is_nan():
    x = np.linspace(0, 1, 32)
    sp = CPUSpline(x, x**2)
    out = sp(np.array([-0.5, 0.5, 1.5]))
    assert np.isnan(out[0]) and np.isnan(out[2])
    assert np.isfinite(out[1])
