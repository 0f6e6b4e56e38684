"""Tests of the analytic rotational-broadening kernel.

The kernel weights are verified against a brute-force numerical
integration of the triangular pixel basis against the limb-darkened
rotation profile (independent of the closed-form primitives used in
the implementation).
"""
import numpy as np
import jax.numpy as jnp

from rvspecfit_tpu.ops import vsini as vs


def brute_force_kernel(r, half_width, eps=0.6, nquad=200001):
    x = np.linspace(-1, 1, nquad)
    prof = (2 * (1 - eps) * np.sqrt(1 - x**2)
            + np.pi / 2 * eps * (1 - x**2)) / (np.pi * (1 - eps / 3))
    ks = np.arange(-half_width, half_width + 1)
    w = np.zeros(len(ks))
    for i, k in enumerate(ks):
        tri = np.clip(1 - np.abs(k - r * x), 0, None)
        w[i] = np.trapezoid(tri * prof, x)
    return w / w.sum()


def test_kernel_matches_quadrature_large():
    log_step = 1e-5
    hw = vs.kernel_half_width(100.0, log_step)
    r = (60.0 / vs.SPEED_OF_LIGHT) / log_step
    got = np.asarray(vs.rotation_kernel(60.0, log_step, hw))
    ref = brute_force_kernel(r, hw)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_kernel_matches_quadrature_subpixel():
    log_step = 1e-4
    hw = vs.kernel_half_width(50.0, log_step)
    r = (1.0 / vs.SPEED_OF_LIGHT) / log_step  # ~0.03 pixel
    got = np.asarray(vs.rotation_kernel(1.0, log_step, hw))
    ref = brute_force_kernel(r, hw)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_zero_vsini_is_identity():
    log_step = 1e-5
    hw = vs.kernel_half_width(300.0, log_step)
    rng = np.random.RandomState(0)
    spec = rng.normal(size=512)
    out = np.asarray(vs.broaden(jnp.asarray(spec), 0.0, log_step, hw))
    np.testing.assert_allclose(out, spec, atol=1e-12)


def test_flux_conserved_and_line_broadened():
    log_step = 2e-5
    n = 4096
    lam = np.exp(np.log(5000) + (np.arange(n) - n // 2) * log_step)
    spec = 1 - 0.9 * np.exp(-0.5 * ((lam - 5000) / 0.5)**2)
    hw = vs.kernel_half_width(200.0, log_step)
    out = np.asarray(vs.broaden(jnp.asarray(spec), 150.0, log_step, hw))
    # equivalent width preserved in the interior (the zero-padded
    # edges droop, exactly like the reference's scipy 'same' conv;
    # template libraries carry velocity padding so edges never matter)
    inner = slice(hw, n - hw)
    assert abs((1 - out[inner]).sum() - (1 - spec[inner]).sum()) < 1e-6 * n
    # line depth reduced substantially
    assert out.min() > 0.5
    assert spec.min() < 0.15
