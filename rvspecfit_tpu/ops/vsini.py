"""Rotational (vsini) broadening with an analytic limb-darkened kernel.

Equivalent of the reference's analytic piecewise-linear-signal
rotation convolution (reference: py/rvspecfit/spec_fit.py:495-682),
re-derived for fixed-shape jit execution:

The rotation profile for limb-darkening coefficient eps is
K(x) ~ c1 sqrt(1-x^2) + c2 (1-x^2) on x in [-1, 1].  Assuming the
spectrum is piecewise linear between log-uniform pixels, the discrete
weight at integer pixel offset k is the exact integral of the
triangular basis function against K, expressed through the closed-form
primitives of K and x*K.  This is robust at sub-pixel vsini (no
sampling of a narrow kernel).

TPU design: the reference builds a kernel whose *length* depends on
vsini (dynamic shape).  Here the kernel is computed over a static
maximum half-width (derived from max_vsini at trace time) with
analytically-zero weights beyond the true support, so the whole thing
is one fixed-shape vectorized expression plus one fixed-size
convolution that XLA lowers efficiently.  vsini==0 degenerates to an
exact delta kernel, so no branching is needed and d(kernel)/d(vsini)
is available for gradient-based fitting.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SPEED_OF_LIGHT = 299792.458  # km/s


def kernel_half_width(max_vsini, log_step):
    """Static kernel half-width in pixels for a given max vsini."""
    rmax = (max_vsini / SPEED_OF_LIGHT) / log_step
    return int(np.ceil(rmax + 1)) + 1


def _primitives(x, eps):
    """Primitives (indefinite integrals) of K(x) and x K(x)."""
    x = jnp.clip(x, -1.0, 1.0)
    norm = np.pi * (1.0 - eps / 3.0)
    c1 = 2.0 * (1.0 - eps) / norm
    c2 = (np.pi / 2.0) * eps / norm
    sq = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    k0 = c1 * 0.5 * (x * sq + jnp.arcsin(x)) + c2 * (x - x**3 / 3.0)
    k1 = (c1 * (-1.0 / 3.0) * (1.0 - x * x) * sq
          + c2 * (x * x / 2.0 - x**4 / 4.0))
    return k0, k1


def _segment_integral(xa, xb, slope, intercept, eps):
    """Integral_{xa}^{xb} (slope*x + intercept) K(x) dx, 0 if xb<=xa."""
    k0b, k1b = _primitives(xb, eps)
    k0a, k1a = _primitives(xa, eps)
    val = slope * (k1b - k1a) + intercept * (k0b - k0a)
    return jnp.where(xb > xa, val, 0.0)


def rotation_kernel(vsini, log_step, half_width, eps=0.6, dtype=None):
    """Discrete rotation kernel of static length 2*half_width+1.

    Parameters
    ----------
    vsini : traced scalar, km/s (>= 0; 0 gives an exact delta kernel)
    log_step : static float, ln-lambda pixel step
    half_width : static int (from :func:`kernel_half_width`)
    eps : limb darkening coefficient

    Returns
    -------
    (2*half_width+1,) normalized weights, centered.
    """
    r_true = (vsini / SPEED_OF_LIGHT) / log_step    # broadening in pixels
    r = jnp.maximum(r_true, 1e-6)                   # safe divisor
    k = jnp.arange(0, half_width + 1, dtype=jnp.result_type(r, 0.0))
    # rising leg of the triangular basis: support x in [k/R, (k+1)/R]
    w = _segment_integral(jnp.clip(k / r, -1, 1),
                          jnp.clip((k + 1) / r, -1, 1),
                          slope=-r, intercept=1.0 + k, eps=eps)
    # falling leg: support x in [(k-1)/R, k/R]
    w = w + _segment_integral(jnp.clip((k - 1) / r, -1, 1),
                              jnp.clip(k / r, -1, 1),
                              slope=r, intercept=1.0 - k, eps=eps)
    full = jnp.concatenate([w[:0:-1], w])
    full = full / jnp.sum(full)
    # r -> 0 limit: exact delta (the formula itself already converges
    # to the delta kernel, but guard the r<=1e-6 clamp region).
    delta = jnp.zeros_like(full).at[half_width].set(1.0)
    full = jnp.where(r_true <= 1e-6, delta, full)
    if dtype is not None:
        full = full.astype(dtype)
    return full


def convolve_kernel_same(spec, kernel):
    """'same'-mode 1-D convolution with a static-length kernel.

    Implemented as a static shift-and-FMA stencil over the 2*hw+1
    kernel taps rather than a conv primitive: per-trial kernels under
    vmap turn lax convolutions into grouped convolutions that execute
    pathologically (100x+) slowly, while the stencil is plain
    vectorized FMA work on any backend.  Zero-padding semantics match
    numpy's mode='same'.
    """
    (n,) = spec.shape
    (klen,) = kernel.shape
    hw = (klen - 1) // 2
    padded = jnp.pad(spec, (hw, hw))
    out = jnp.zeros_like(spec)
    # out[i] = sum_j kernel[j] * spec[i + hw - j]
    for j in range(klen):
        out = out + kernel[j] * jax.lax.dynamic_slice_in_dim(
            padded, 2 * hw - j, n)
    return out


def broaden(spec, vsini, log_step, half_width, eps=0.6):
    """Apply rotational broadening to a log-uniform spectrum."""
    kern = rotation_kernel(vsini, log_step, half_width, eps=eps,
                           dtype=spec.dtype)
    return convolve_kernel_same(spec, kern)
