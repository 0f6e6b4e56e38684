"""Pallas TPU kernel: fused CCF product-contraction.

The batched CCF (fit/ccf.fit_batch, the TPU replacement for the
reference's per-fiber FFT loop, reference py/rvspecfit/fitter_ccf.py:
62-253) computes, per arm,

    chi2[b, t, v] = -2 c0[b, t, v] + c1[b, t, v]        (continuum)
    chi2[b, t, v] = -c0[b, t, v]^2 / c1[b, t, v]        (no continuum)

where c0/c1 are circular cross-correlations of the template bank's
FFT rows (T, F) with the exposure's spectrum/ivar FFT rows (B, F),
evaluated directly at the fractional lags of the common velocity grid
through two (F, V) DFT matrices (see fit/ccf._corr_at_lags).

The XLA formulation materializes the (B, T, F) complex products in
HBM before contracting them over frequency — ~440 MB per microbatch
tile per arm, which makes the whole CCF phase HBM-bandwidth-bound
(measured 2.9-3.6 s of the 500-fiber bench against a ~40 ms MXU
roofline).  This kernel fuses product and contraction: per grid cell
the bank block and the DFT matrices sit in VMEM, each fiber's product
rows are formed on the VPU and immediately contracted on the MXU, so
the (B, T, F) intermediate never exists.

Layout notes:

* the two real/imag contractions fold into ONE matmul per (fiber,
  correlation): with P = [pr, -pi] laid out on a doubled frequency
  axis and E = [ecos; esin] stacked the same way,
  c = pr @ ecos - pi @ esin = P @ E — half the MXU dispatches;
* frequency is zero-padded to a lane multiple (padded products are
  zero, contributing nothing to the contraction); velocity is padded
  to a lane multiple and sliced off outside; templates are padded to
  the sublane granularity and sliced off outside (a zero template row
  would otherwise win the arm-summed argmin);
* the fiber axis is tiled at ``bb`` rows per grid cell with a static
  unroll (dynamic sublane starts are a Mosaic hazard; bb is small).

Numerics match fit/ccf._ccf_batch_cont/_ccf_batch_nocont to float
rounding (golden-tested in tests/test_pallas_ccf.py with interpret
mode on CPU); enabled on TPU backends by default through
RVST_PALLAS_CCF (same policy shape as RVST_PALLAS_SPLINE).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def use_pallas_ccf():
    """Policy: ON by default on TPU backends, OFF elsewhere.
    RVST_PALLAS_CCF=1 force on, =0 off, =interpret (CPU-interpreted,
    for tests).  Returns False | True | 'interpret'."""
    flag = os.environ.get('RVST_PALLAS_CCF', '')
    if flag in ('0', 'off'):
        return False
    if flag == 'interpret':
        return 'interpret'
    if flag:
        return True
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _kernel(t_ref, t2_ref, s_ref, iv_ref, e_ref, o_ref, *, bb,
            continuum):
    from rvspecfit_tpu.ops.prec import matmul_precision
    hp = matmul_precision('ccf')
    ar, ai = t_ref[0], t_ref[1]          # (Tp, Fp) bank
    a2r, a2i = t2_ref[0], t2_ref[1]
    e = e_ref[...]                       # (2 Fp, Vb) [ecos; esin]
    dt = ar.dtype
    for b in range(bb):                  # static unroll
        br, bi = s_ref[0, b], s_ref[1, b]          # (Fp,)
        wr, wi = iv_ref[0, b], iv_ref[1, b]
        # c0 = (ar br - ai bi) @ ecos - (ar bi + ai br) @ esin
        p = jnp.concatenate(
            [ar * br[None, :] - ai * bi[None, :],
             -(ar * bi[None, :] + ai * br[None, :])], axis=1)
        c0 = jax.lax.dot(p, e, precision=hp, preferred_element_type=dt)
        q = jnp.concatenate(
            [a2r * wr[None, :] - a2i * wi[None, :],
             -(a2r * wi[None, :] + a2i * wr[None, :])], axis=1)
        c1 = jax.lax.dot(q, e, precision=hp, preferred_element_type=dt)
        if continuum:
            o_ref[b] = -2.0 * c0 + c1
        else:
            o_ref[b] = -(c0 * c0) / c1


@functools.partial(jax.jit, static_argnames=('continuum', 'bb',
                                             'vblock', 'interpret'))
def ccf_chisq_pallas(tfft, t2fft, sfft_conj, ivfft_conj, ecos, esin,
                     continuum=True, bb=8, vblock=512, interpret=False):
    """Fused (B, T, V) CCF chi-square contributions for one arm.

    tfft, t2fft : (2, T, F) stacked real/imag bank FFTs
    sfft_conj, ivfft_conj : (2, B, F) stacked real/imag exposure FFTs
    ecos, esin : (F, V) DFT-at-lags matrices
    Same contract as fit/ccf._ccf_batch_cont / _ccf_batch_nocont.
    """
    _, t, f = tfft.shape
    b = sfft_conj.shape[1]
    v = ecos.shape[1]
    dt = tfft.dtype
    fp = (-f) % 128
    tp = (-t) % 8
    bp = (-b) % bb
    padf = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, fp))) if fp else x
    tfft = padf(tfft)
    t2fft = padf(t2fft)
    sfft_conj = padf(sfft_conj)
    ivfft_conj = padf(ivfft_conj)
    if tp:
        tfft = jnp.pad(tfft, ((0, 0), (0, tp), (0, 0)))
        t2fft = jnp.pad(t2fft, ((0, 0), (0, tp), (0, 0)))
    if bp:
        sfft_conj = jnp.pad(sfft_conj, ((0, 0), (0, bp), (0, 0)))
        ivfft_conj = jnp.pad(ivfft_conj, ((0, 0), (0, bp), (0, 0)))
    vb = min(vblock, int(np.ceil(v / 128.0)) * 128)
    vp = (-v) % vb
    # [ecos; esin] stacked on the (padded) frequency axis, matching
    # the kernel's [pr, -pi] product layout
    estack = jnp.concatenate(
        [jnp.pad(ecos.astype(dt), ((0, fp), (0, vp))),
         jnp.pad(esin.astype(dt), ((0, fp), (0, vp)))], axis=0)
    t_pad, f_pad, b_pad, v_pad = t + tp, f + fp, b + bp, v + vp

    kern = functools.partial(_kernel, bb=bb, continuum=continuum)
    out = pl.pallas_call(
        kern,
        grid=(b_pad // bb, v_pad // vb),
        in_specs=[
            pl.BlockSpec((2, t_pad, f_pad), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((2, t_pad, f_pad), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((2, bb, f_pad), lambda i, j: (0, i, 0)),
            pl.BlockSpec((2, bb, f_pad), lambda i, j: (0, i, 0)),
            pl.BlockSpec((2 * f_pad, vb), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bb, t_pad, vb), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad, v_pad), dt),
        interpret=bool(interpret),
    )(tfft, t2fft, sfft_conj, ivfft_conj, estack)
    return out[:b, :t, :v]
