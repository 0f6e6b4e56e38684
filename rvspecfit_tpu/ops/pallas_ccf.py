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
a bank block and a DFT-matrix block sit in VMEM, each fiber's product
rows are formed on the VPU and immediately contracted on the MXU, so
the (B, T, F) intermediate never exists.

Layout notes:

* grid (fibers/bb, T/tb, V/vb), velocity innermost: the bank block is
  constant along v, the DFT blocks are constant along t and cheap to
  restream along v, the spectrum rows are constant along both inner
  axes;
* blocks are sized for the ~16 MB/core VMEM budget (banks 2x(2, tb,
  Fp), DFT 2x(Fp, vb), products 4x(tb, Fp) live values);
* frequency is zero-padded to a lane multiple (padded products are
  zero, contributing nothing to the contraction); velocity/template
  pads are sliced off outside (a zero template row would otherwise
  win the arm-summed argmin);
* the fiber axis unrolls statically at ``bb`` rows per cell (dynamic
  sublane starts are a Mosaic hazard; bb is small).

Numerics match fit/ccf._ccf_batch_cont/_ccf_batch_nocont to float
rounding (golden-tested in tests/test_pallas_ccf.py with interpret
mode on CPU); enabled on TPU backends by default through
RVST_PALLAS_CCF (same policy shape as RVST_PALLAS_SPLINE), with a
runtime fallback to the XLA formulation in fit_batch.
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


def _kernel(t_ref, t2_ref, s_ref, iv_ref, ec_ref, es_ref, o_ref, *, bb,
            continuum):
    from rvspecfit_tpu.ops.prec import pallas_precision
    hp = pallas_precision('ccf')
    ar, ai = t_ref[0], t_ref[1]          # (tb, Fp) bank block
    a2r, a2i = t2_ref[0], t2_ref[1]
    ec = ec_ref[...]                     # (Fp, vb)
    es = es_ref[...]
    dt = ar.dtype
    dot = functools.partial(jax.lax.dot, precision=hp,
                            preferred_element_type=dt)
    for b in range(bb):                  # static unroll
        br, bi = s_ref[0, b], s_ref[1, b]          # (Fp,)
        wr, wi = iv_ref[0, b], iv_ref[1, b]
        # c0 = (ar br - ai bi) @ ecos - (ar bi + ai br) @ esin
        c0 = dot(ar * br[None, :] - ai * bi[None, :], ec) \
            - dot(ar * bi[None, :] + ai * br[None, :], es)
        c1 = dot(a2r * wr[None, :] - a2i * wi[None, :], ec) \
            - dot(a2r * wi[None, :] + a2i * wr[None, :], es)
        if continuum:
            o_ref[b] = -2.0 * c0 + c1
        else:
            o_ref[b] = -(c0 * c0) / c1


@functools.partial(jax.jit, static_argnames=('continuum', 'bb',
                                             'tblock', 'vblock',
                                             'interpret'))
def ccf_chisq_pallas(tfft, t2fft, sfft_conj, ivfft_conj, ecos, esin,
                     continuum=True, bb=8, tblock=64, vblock=128,
                     interpret=False):
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
    # block sizes that minimize padding: split the axis into the same
    # number of blocks its cap implies, then round the block (not the
    # axis) up to the tiling granularity
    ceil_div = lambda a, q: -(-a // q)
    tb = ceil_div(ceil_div(t, max(1, ceil_div(t, tblock))), 8) * 8
    vb = ceil_div(ceil_div(v, max(1, ceil_div(v, vblock))), 128) * 128
    fp = (-f) % 128
    tp = (-t) % tb
    bp = (-b) % bb
    vp = (-v) % vb
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
    ec = jnp.pad(ecos.astype(dt), ((0, fp), (0, vp)))
    es = jnp.pad(esin.astype(dt), ((0, fp), (0, vp)))
    t_pad, f_pad, b_pad, v_pad = t + tp, f + fp, b + bp, v + vp

    kern = functools.partial(_kernel, bb=bb, continuum=continuum)
    # fp32-contract (HIGHEST) dots need more matmul scratch than the
    # default 16 MiB scoped-VMEM budget allows at these block shapes
    # (measured 17.6 MiB at B=500); v5e cores carry 128 MiB of VMEM,
    # so raise the scope rather than shrink the blocks
    compiler_params = None
    if not interpret:
        try:
            from jax.experimental.pallas import tpu as pltpu
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024)
        except (ImportError, TypeError):
            pass
    # grid order (v, t, b) — the last axis iterates innermost, so the
    # cheapest-to-restream blocks change fastest: the spectrum rows
    # (0.3 MB) cycle per cell, the bank blocks (2 x 1.1 MB) only per
    # t step, and the DFT matrices (2 x 2.2 MB) only per v step —
    # ~170 MB of input traffic per arm call vs ~1.5 GB with the fiber
    # axis outermost
    out = pl.pallas_call(
        kern,
        grid=(v_pad // vb, t_pad // tb, b_pad // bb),
        in_specs=[
            pl.BlockSpec((2, tb, f_pad), lambda v, t, b: (0, t, 0)),
            pl.BlockSpec((2, tb, f_pad), lambda v, t, b: (0, t, 0)),
            pl.BlockSpec((2, bb, f_pad), lambda v, t, b: (0, b, 0)),
            pl.BlockSpec((2, bb, f_pad), lambda v, t, b: (0, b, 0)),
            pl.BlockSpec((f_pad, vb), lambda v, t, b: (0, v)),
            pl.BlockSpec((f_pad, vb), lambda v, t, b: (0, v)),
        ],
        out_specs=pl.BlockSpec((bb, tb, vb),
                               lambda v, t, b: (b, t, v)),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad, v_pad), dt),
        interpret=bool(interpret),
        **({} if compiler_params is None
           else dict(compiler_params=compiler_params)),
    )(tfft, t2fft, sfft_conj, ivfft_conj, ec, es)
    return out[:b, :t, :v]
