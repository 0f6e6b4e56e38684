"""Pallas TPU kernel: windowed-DMA Doppler spline evaluation.

The hot inner op of the fused likelihood is evaluating T per-trial
cubic splines at npix Doppler-shifted query points
(ops/spline.spline_eval_index).  XLA lowers the coefficient lookup to
a generic gather; but the queries of one row are MONOTONIC in pixel
(wavelengths increase), so the coefficients a pixel tile needs form a
narrow contiguous window of knot intervals.  This kernel exploits
that structure (the plan named in docs/performance.md):

* grid (R/8, npix/TILE): one program per (8-row block, pixel tile) —
  TPU block shapes need sublane multiples of 8;
* per row the kernel reads the tile's first query index, DMAs the
  coefficient window coeffs[r, :, s0:s0+W] from HBM to VMEM (W
  static, derived from the query spacing at build time; the 8 row
  DMAs are issued together and awaited together);
* the per-pixel interval lookup becomes a LOCAL index into the
  window, realized as a one-hot (W, TILE) matmul on the MXU — the
  canonical TPU gather trick;
* the cubic is evaluated on the VPU and written back.

Coefficients are carried in a transposed, padded (R, 4, n_pad) layout
so the window slice is lane-contiguous.

Numerics match ops/spline.spline_eval_index (the cancellation-free
fractional-index form) to float rounding; golden-tested in
tests/test_pallas_spline.py with interpret mode on CPU; A/B'd on
hardware by tools/ab_pallas_spline.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256   # on-chip sweep: 256 beats 512/128 (tools/ab)
ROWS = 8          # rows per program (TPU sublane granularity)


def window_size(idx0, tile=DEFAULT_TILE, margin=4):
    """Static coefficient-window size for query indices spaced like
    ``idx0`` (host float64 (npix,)): the max index span of any pixel
    tile, rounded up to a lane multiple."""
    idx0 = np.asarray(idx0, np.float64)
    npix = len(idx0)
    span = 0.0
    for i0 in range(0, npix, tile):
        seg = idx0[i0:i0 + tile]
        span = max(span, float(seg[-1] - seg[0]))
    w = int(np.ceil(span)) + margin
    # +128: the DMA start is rounded DOWN to a lane-tile multiple of
    # 128 inside the kernel, so the window must absorb the rounding
    return max(128, int(np.ceil(w / 128.0)) * 128) + 128


def pack_coeffs(coeffs, window):
    """(..., n-1, 4) spline coefficients -> padded transposed
    (..., 4, n_pad) layout for the kernel (n_pad multiple of 128 and
    >= n-1 + window so window slices never clip)."""
    nm1 = coeffs.shape[-2]
    n_pad = int(np.ceil((nm1 + window) / 128.0)) * 128
    ct = jnp.swapaxes(coeffs, -1, -2)                # (..., 4, n-1)
    pad = [(0, 0)] * (ct.ndim - 1) + [(0, n_pad - nm1)]
    return jnp.pad(ct, pad)


def _kernel(u_ref, coeffs_hbm, out_ref, scratch, sems, *, window, nm1,
            x0, step, log_step, expm1_step):
    rb = pl.program_id(0)
    u = u_ref[:, :]                                   # (ROWS, TILE)
    dt = u.dtype

    # per-row window starts: first query of each row's tile (queries
    # are monotonic in pixel), clamped into the padded axis and
    # rounded down to the 128-lane tiling the DMA engine requires
    s0 = jnp.clip(jnp.floor(u[:, 0]).astype(jnp.int32) - 1, 0, nm1 - 1)
    s0 = (s0 // 128) * 128

    dmas = []
    for j in range(ROWS):
        start = pl.multiple_of(s0[j], 128)
        dma = pltpu.make_async_copy(
            coeffs_hbm.at[rb * ROWS + j, :, pl.ds(start, window)],
            scratch.at[j], sems.at[j])
        dma.start()
        dmas.append(dma)

    idx = jnp.clip(jnp.floor(u), 0, nm1 - 1)          # (ROWS, TILE)
    frac = u - idx
    lidx = jnp.clip(idx.astype(jnp.int32) - s0[:, None], 0, window - 1)

    # offsets from the interval edges, cancellation-free
    if log_step:
        xl = dt.type(x0) * jnp.exp(idx * dt.type(step))
        # expm1 is not lowered by Pallas TPU; frac*step <= step < 1e-2
        # for any real template grid, so a cubic Taylor of expm1 is
        # exact to float32 (relative error < step^3/24 ~ 1e-13)
        z = frac * dt.type(step)
        ef = z * (1.0 + z * (0.5 + z * dt.type(1.0 / 6.0)))
        dxl = xl * ef
        dxr = xl * (dt.type(expm1_step) - ef)
    else:
        dxl = frac * dt.type(step)
        dxr = (1.0 - frac) * dt.type(step)

    tile = u.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (window, tile), 0)
    vals = []
    for j in range(ROWS):
        # one-hot gather on the MXU: (4, W) x (W, TILE) -> (4, TILE)
        onehot = (cols == lidx[j][None, :]).astype(dt)
        dmas[j].wait()
        # HIGHEST precision: the default MXU f32 path multiplies in
        # bf16 passes, corrupting the gathered coefficients (~4e-3)
        cf = jax.lax.dot_general(
            scratch[j], onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dt)
        vals.append(cf[0] * dxl[j] * dxl[j] * dxl[j]
                    + cf[1] * dxr[j] * dxr[j] * dxr[j]
                    + cf[2] * dxl[j] + cf[3] * dxr[j])
    out_ref[:, :] = jnp.stack(vals, axis=0)


@functools.partial(jax.jit, static_argnames=(
    'window', 'nm1', 'x0', 'step', 'log_step', 'tile', 'interpret'))
def _eval_packed(coeffs_packed, u, *, window, nm1, x0, step, log_step,
                 tile, interpret=False):
    rr, npix = u.shape
    kern = functools.partial(
        _kernel, window=window, nm1=nm1, x0=x0, step=step,
        log_step=log_step,
        expm1_step=float(np.expm1(step)) if log_step else 0.0)
    return pl.pallas_call(
        kern,
        grid=(rr // ROWS, npix // tile),
        in_specs=[
            pl.BlockSpec((ROWS, tile), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ROWS, tile), lambda r, t: (r, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rr, npix), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((ROWS, 4, window), coeffs_packed.dtype),
            pltpu.SemaphoreType.DMA((ROWS,)),
        ],
        interpret=interpret,
    )(u, coeffs_packed)


@functools.lru_cache(maxsize=None)
def _batched_eval_fn(window, nm1, x0, step, log_step, tile, interpret):
    """custom_vmap wrapper of _eval_packed: the fused likelihood vmaps
    the evaluation over the fiber axis, but Pallas cannot auto-batch
    an ANY-memory-space operand — instead the batch axis is flattened
    into the kernel's row grid (rows are independent)."""

    @jax.custom_batching.custom_vmap
    def run(packed, u):
        return _eval_packed(packed, u, window=window, nm1=nm1, x0=x0,
                            step=step, log_step=log_step, tile=tile,
                            interpret=interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, packed, u):
        pb, ub = in_batched
        if not ub:
            u = jnp.broadcast_to(u[None], (axis_size,) + u.shape)
        if not pb:
            packed = jnp.broadcast_to(packed[None],
                                      (axis_size,) + packed.shape)
        b, r = u.shape[0], u.shape[1]
        out = run(packed.reshape((b * r,) + packed.shape[2:]),
                  u.reshape((b * r, u.shape[2])))
        return out.reshape(u.shape), True

    return run


def spline_eval_index_pallas(geom, coeffs, u, window, tile=DEFAULT_TILE,
                             interpret=False):
    """Batched Doppler spline evaluation via the windowed-DMA kernel.

    geom : ops.spline.SplineGeometry
    coeffs : (R, n-1, 4) per-row spline coefficients
    u : (R, npix) fractional knot indices, monotonic per row
    window : static window size from :func:`window_size`

    Returns (vals (R, npix), inrange (R, npix)) — same contract as
    ops.spline.spline_eval_index.
    """
    rr, npix = u.shape
    nm1 = coeffs.shape[-2]
    if geom.log_step and float(geom.step) > 0.01:
        raise ValueError('pallas spline kernel assumes a fine log '
                         'grid (step < 0.01); got %g' % geom.step)
    packed = pack_coeffs(coeffs, window)
    rpad = (-rr) % ROWS
    if rpad:
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(packed[-1:],
                                      (rpad,) + packed.shape[1:])])
        u_in = jnp.concatenate(
            [u, jnp.broadcast_to(u[-1:], (rpad, npix))])
    else:
        u_in = u
    cpad = (-npix) % tile
    if cpad:
        u_in = jnp.pad(u_in, ((0, 0), (0, cpad)))
    run = _batched_eval_fn(window, nm1, float(geom.x0),
                           float(geom.step), bool(geom.log_step),
                           tile, interpret)
    vals = run(packed, u_in)
    vals = vals[:rr, :npix]
    inrange = (u >= 0) & (u < nm1)
    return vals, inrange
