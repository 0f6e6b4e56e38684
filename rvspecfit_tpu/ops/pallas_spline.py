"""Pallas TPU kernel: windowed Doppler spline evaluation.

The hot inner op of the fused likelihood is evaluating T per-trial
cubic splines at npix Doppler-shifted query points
(ops/spline.spline_eval_index).  XLA lowers the coefficient lookup to
a generic gather; but the queries of one row are MONOTONIC in pixel
(wavelengths increase), so the coefficients a pixel tile needs form a
narrow contiguous window of knot intervals.  This kernel exploits
that structure:

* grid (R/8, npix/TILE): one program per (8-row block, pixel tile) —
  TPU block shapes need sublane multiples of 8;
* the coefficient rows ride the ordinary Pallas block pipeline
  (auto double-buffered block loads, one block per row-group reused
  across all of its pixel tiles — v1 of this kernel issued manual
  per-tile window DMAs instead, whose per-cell latency dominated the
  whole call);
* per row the kernel reads the tile's first query index and takes the
  static-width coefficient window as an in-VMEM dynamic slice (W
  static, derived from the query spacing at build time);
* the per-pixel interval lookup becomes a LOCAL index into the
  window, realized as a one-hot (W, TILE) matmul on the MXU — the
  canonical TPU gather trick;
* the cubic is evaluated on the VPU and written back.

Two sharing modes:

* per-row coefficients (``spline_eval_index_pallas``) — each row is
  one optimizer trial with its own template;
* shared coefficients (``spline_eval_index_pallas_shared``) — all V
  rows of one fiber's velocity scan share ONE template.  v1 broadcast
  the coefficients to every row before the call, which materialized
  (B*V, n, 4) in HBM — gigabytes for a refinement scan; here the
  block index map points every row-group of a fiber at the same
  (1, 4, n_pad) block, so HBM holds one copy per fiber.

Coefficients are carried in a padded planes-first (R, 4, n_pad)
layout so the window slice is lane-contiguous; ops/spline emits
planes-first natively, so packing is a pad with no transposition.

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
ROWS = 8          # minimum rows per program (TPU sublane granularity)
# per-cell coefficient block cap: rows * 4 * n_pad * itemsize must fit
# comfortably in VMEM next to its double buffer
_BLOCK_BYTES = 4 << 20


def _auto_rows(rr, n_pad, itemsize=4):
    """Rows per grid cell: as many as the VMEM block budget allows.

    Mosaic's per-cell overhead (scalar prologue + DMA orchestration,
    ~10 us) dominated the v2 kernel at 8 rows/cell (measured ~250
    cells x 10 us ~ whole-call cost); 32 rows cuts the cell count 4x.
    """
    rows = ROWS
    while rows < 32 and rows * 2 * 4 * n_pad * itemsize <= _BLOCK_BYTES \
            and rr % (rows * 2) == 0:
        rows *= 2
    return rows


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
    # +128: the window start is rounded DOWN to a 128-lane multiple
    # inside the kernel, so the window must absorb the rounding
    return max(128, int(np.ceil(w / 128.0)) * 128) + 128


def pack_coeffs(coeffs, window):
    """(..., 4, n-1) planes-first spline coefficients -> padded
    (..., 4, n_pad) layout for the kernel (n_pad multiple of 128 and
    >= n-1 + window so window slices never clip).  No transposition:
    spline_coeffs emits planes-first natively, so packing is a pad
    only (the old trailing-4 layout cost a full HBM transposition
    copy per objective call)."""
    nm1 = coeffs.shape[-1]
    n_pad = int(np.ceil((nm1 + window) / 128.0)) * 128
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n_pad - nm1)]
    return jnp.pad(coeffs, pad)


def _kernel(u_ref, coeffs_ref, out_ref, *, window, nm1, x0, step,
            log_step, expm1_step, shared):
    u = u_ref[:, :]                                   # (rows, TILE)
    dt = u.dtype
    rows = u.shape[0]

    # per-row window starts: first query of each row's tile (queries
    # are monotonic in pixel), rounded down to a 128-lane multiple so
    # the dynamic window slice stays tiling-aligned
    s0 = jnp.clip(jnp.floor(u[:, 0]).astype(jnp.int32) - 1, 0, nm1 - 1)
    s0 = (s0 // 128) * 128

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
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows, window, tile), 1)
    # static-width coefficient windows: in-VMEM dynamic slices of the
    # pipelined block (no manual DMA); slices are per row (s0 differs
    # by the rows' velocity spread), but the gather matmuls run as ONE
    # batched dot_general over the row axis — v2 issued 8 sequential
    # (4, W) x (W, T) matmuls whose serialization dominated the cell
    wins = []
    for j in range(rows):
        start = pl.multiple_of(s0[j], 128)
        wins.append(coeffs_ref[0 if shared else j, :,
                               pl.ds(start, window)])
    wins = jnp.stack(wins, axis=0)                    # (rows, 4, W)
    # one-hot gather on the MXU, batched over rows:
    # (ROWS, 4, W) x (ROWS, W, TILE) -> (ROWS, 4, TILE)
    onehot = (cols == lidx[:, None, :]).astype(dt)
    # >= HIGH precision: the single-pass MXU f32 path multiplies in
    # bf16, corrupting the gathered coefficients (~4e-3); bf16x3
    # (HIGH) recovers near-f32 exactness since the one-hot factor is
    # exactly representable
    from rvspecfit_tpu.ops.prec import matmul_precision
    cf = jax.lax.dot_general(
        wins, onehot, (((2,), (1,)), ((0,), (0,))),
        precision=matmul_precision('chisq'),
        preferred_element_type=dt)
    out_ref[:, :] = (cf[:, 0] * dxl * dxl * dxl
                     + cf[:, 1] * dxr * dxr * dxr
                     + cf[:, 2] * dxl + cf[:, 3] * dxr)


@functools.partial(jax.jit, static_argnames=(
    'window', 'nm1', 'x0', 'step', 'log_step', 'tile', 'rows_per_coeff',
    'interpret'))
def _eval_packed(coeffs_packed, u, *, window, nm1, x0, step, log_step,
                 tile, rows_per_coeff=1, interpret=False):
    """coeffs_packed: (ncoeff, 4, n_pad); u: (rr, npix) with
    rr = ncoeff * rows_per_coeff; consecutive groups of
    ``rows_per_coeff`` rows share one coefficient row."""
    rr, npix = u.shape
    n_pad = coeffs_packed.shape[-1]
    shared = rows_per_coeff > 1
    if shared:
        # one coefficient plane per cell: cell rows must not straddle
        # coefficient-row boundaries
        rows = ROWS
        while rows < 32 and rows_per_coeff % (rows * 2) == 0 \
                and rr % (rows * 2) == 0:
            rows *= 2
    else:
        rows = _auto_rows(rr, n_pad, coeffs_packed.dtype.itemsize)
    if shared and rows_per_coeff % rows:
        raise ValueError('rows_per_coeff must be a multiple of rows')
    kern = functools.partial(
        _kernel, window=window, nm1=nm1, x0=x0, step=step,
        log_step=log_step,
        expm1_step=float(np.expm1(step)) if log_step else 0.0,
        shared=shared)
    if shared:
        cspec = pl.BlockSpec(
            (1, 4, n_pad),
            lambda r, t, _rpc=rows_per_coeff, _rw=rows:
            (r * _rw // _rpc, 0, 0))
    else:
        cspec = pl.BlockSpec((rows, 4, n_pad), lambda r, t: (r, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(rr // rows, npix // tile),
        in_specs=[
            pl.BlockSpec((rows, tile), lambda r, t: (r, t)),
            cspec,
        ],
        out_specs=pl.BlockSpec((rows, tile), lambda r, t: (r, t)),
        out_shape=jax.ShapeDtypeStruct((rr, npix), u.dtype),
        interpret=interpret,
    )(u, coeffs_packed)


@functools.lru_cache(maxsize=None)
def _batched_eval_fn(window, nm1, x0, step, log_step, tile, interpret):
    """custom_vmap wrapper of _eval_packed: the fused likelihood vmaps
    the evaluation over the fiber axis, but Pallas cannot auto-batch
    the coefficient operand — instead the batch axis is flattened
    into the kernel's row grid (rows are independent).

    Row/column padding lives in the PRIMAL, after any vmap axes have
    been flattened into the row count: padding per-fiber before the
    vmap rounded each fiber's K rows up to the sublane granularity
    (K=4 -> 8), doubling the kernel's work across the exposure."""

    @jax.custom_batching.custom_vmap
    def run(packed, u):
        rr, npix = u.shape
        n_pad = packed.shape[-1]
        rgran = _auto_rows(32 * ((rr + 31) // 32), n_pad,
                           packed.dtype.itemsize) if rr >= 32 else ROWS
        rpad = (-rr) % rgran
        if rpad:
            packed = jnp.concatenate(
                [packed, jnp.broadcast_to(packed[-1:],
                                          (rpad,) + packed.shape[1:])])
            u = jnp.concatenate(
                [u, jnp.broadcast_to(u[-1:], (rpad, npix))])
        cpad = (-npix) % tile
        if cpad:
            u = jnp.pad(u, ((0, 0), (0, cpad)))
        out = _eval_packed(packed, u, window=window, nm1=nm1, x0=x0,
                           step=step, log_step=log_step, tile=tile,
                           interpret=interpret)
        return out[:rr, :npix]

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


@functools.lru_cache(maxsize=None)
def _shared_eval_fn(window, nm1, x0, step, log_step, tile, vpad,
                    interpret):
    """custom_vmap wrapper of the shared-coefficient (velocity scan)
    mode: one coefficient row serves ``vpad`` query rows.  The fiber
    batch axis is flattened into the row grid; HBM carries ONE
    coefficient copy per fiber (v1 broadcast it per row)."""

    @jax.custom_batching.custom_vmap
    def run(packed, u):
        # packed (1, 4, n_pad) [or (B, ...)], u (vpad, npix)
        return _eval_packed(packed, u, window=window, nm1=nm1, x0=x0,
                            step=step, log_step=log_step, tile=tile,
                            rows_per_coeff=vpad, interpret=interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, packed, u):
        pb, ub = in_batched
        if not ub:
            u = jnp.broadcast_to(u[None], (axis_size,) + u.shape)
        if not pb:
            packed = jnp.broadcast_to(packed[None],
                                      (axis_size,) + packed.shape)
        b = u.shape[0]
        out = run(packed.reshape((b * packed.shape[1],)
                                 + packed.shape[2:]),
                  u.reshape((b * u.shape[1], u.shape[2])))
        return out.reshape(u.shape), True

    return run


def spline_eval_index_pallas(geom, coeffs, u, window, tile=DEFAULT_TILE,
                             interpret=False):
    """Batched Doppler spline evaluation via the windowed kernel.

    geom : ops.spline.SplineGeometry
    coeffs : (R, 4, n-1) per-row planes-first spline coefficients
    u : (R, npix) fractional knot indices, monotonic per row
    window : static window size from :func:`window_size`

    Returns (vals (R, npix), inrange (R, npix)) — same contract as
    ops.spline.spline_eval_index.  Row/tile padding happens inside
    the custom_vmap primal so a vmap over fibers pads the flattened
    row total once, not each fiber's K rows separately.
    """
    nm1 = coeffs.shape[-1]
    _check_geom(geom)
    packed = pack_coeffs(coeffs, window)
    run = _batched_eval_fn(window, nm1, float(geom.x0),
                           float(geom.step), bool(geom.log_step),
                           tile, interpret)
    vals = run(packed, u)
    inrange = (u >= 0) & (u < nm1)
    return vals, inrange


def spline_eval_index_pallas_shared(geom, coeffs, u, window,
                                    tile=DEFAULT_TILE, interpret=False):
    """Velocity-scan evaluation: ONE spline, many query rows.

    coeffs : (4, n-1) single-template planes-first coefficients
    u : (V, npix) fractional indices (V query rows, e.g. velocities)

    Rows are padded to the sublane granularity internally; under vmap
    over a fiber axis, each fiber keeps a single coefficient copy in
    HBM (the v1 path broadcast coefficients per row, materializing
    (B*V, n, 4)).
    """
    v, npix = u.shape
    nm1 = coeffs.shape[-1]
    _check_geom(geom)
    vpad_n = (-v) % (32 if v >= 32 else ROWS)
    u_in = u if not vpad_n else jnp.concatenate(
        [u, jnp.broadcast_to(u[-1:], (vpad_n, npix))])
    vpad = v + vpad_n
    cpad = (-npix) % tile
    if cpad:
        u_in = jnp.pad(u_in, ((0, 0), (0, cpad)))
    packed = pack_coeffs(coeffs[None], window)        # (1, 4, n_pad)
    run = _shared_eval_fn(window, nm1, float(geom.x0),
                          float(geom.step), bool(geom.log_step),
                          tile, vpad, interpret)
    vals = run(packed, u_in)
    vals = vals[:v, :npix]
    inrange = (u >= 0) & (u < nm1)
    return vals, inrange


def _check_geom(geom):
    if geom.log_step and float(geom.step) > 0.01:
        raise ValueError('pallas spline kernel assumes a fine log '
                         'grid (step < 0.01); got %g' % geom.step)
