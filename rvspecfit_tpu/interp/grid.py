"""Regular-grid multilinear template interpolation, TPU-native.

Equivalent of the reference GridInterp/GridOutsideCheck
(reference: py/rvspecfit/spec_inter.py:62-194), redesigned for batched
jit execution:

* n-d multilinear interpolation on a possibly-gappy rectilinear grid
  (``idgrid`` of spectrum ids, -1 marks holes), vertex weights
  prod_i x_i^{S_i} (1-x_i)^{1-S_i} over the 2^ndim unit-cube corners;
* nearest-neighbor fallback outside the grid or at holes.  The
  reference queries a cKDTree; here the nearest template is found by
  a brute-force distance argmin over all templates in the same
  ptp-scaled metric — identical answers, fully vectorized, and
  negligible cost next to the spectrum gathers;
* the outside-grid indicator returns the scaled nearest-neighbor
  distance (used by the likelihood as a smooth out-of-grid penalty).

The corner accumulation loops over the (static) 2^ndim corners and
gathers one (ntrial, npix) slab per corner, avoiding an
(ntrial, 2^ndim, npix) intermediate.
"""
from __future__ import annotations

import dataclasses
import itertools
import os

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu.ops.prec import matmul_precision


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GridInterpState:
    """Device-resident state for regular-grid interpolation."""

    uvecs: tuple              # tuple of (len_i,) arrays, per dimension
    idgrid: jnp.ndarray       # (prod(lens),) int32 flattened, -1 = hole
    vecs_scaled: jnp.ndarray  # (nspec, ndim) template params / ptp
    ptp_inv: jnp.ndarray      # (ndim,)
    dats: jnp.ndarray         # (nspec, npix) stored (log-)spectra
    lens: tuple               # static grid shape
    log_spec: bool            # static: exponentiate output

    def tree_flatten(self):
        children = (self.uvecs, self.idgrid, self.vecs_scaled,
                    self.ptp_inv, self.dats)
        return children, (self.lens, self.log_spec)

    @classmethod
    def tree_unflatten(cls, aux, children):
        lens, log_spec = aux
        uvecs, idgrid, vecs_scaled, ptp_inv, dats = children
        return cls(uvecs, idgrid, vecs_scaled, ptp_inv, dats, lens, log_spec)

    @property
    def ndim(self):
        return len(self.lens)

    @property
    def npix(self):
        return self.dats.shape[1]

    @classmethod
    def build(cls, uvecs, idgrid, vecs, dats, log_spec=True, dtype=None):
        """Host-side constructor.

        Parameters
        ----------
        uvecs : list of per-dimension sorted unique grid values
        idgrid : (lens...) int array of spectrum ids, -1 for holes
        vecs : (ndim, nspec) mapped parameters of each spectrum
        dats : (nspec, npix) stored spectra (log if log_spec)
        """
        vecs = np.asarray(vecs, dtype=np.float64)
        ptp = np.ptp(vecs, axis=1)
        ptp = np.where(ptp == 0, 1.0, ptp)
        lens = tuple(int(len(u)) for u in uvecs)
        if dtype is None:
            dtype = jnp.zeros(0).dtype
        return cls(
            uvecs=tuple(jnp.asarray(np.asarray(u, np.float64), dtype=dtype)
                        for u in uvecs),
            idgrid=jnp.asarray(np.asarray(idgrid).reshape(-1), jnp.int32),
            vecs_scaled=jnp.asarray((vecs / ptp[:, None]).T, dtype=dtype),
            ptp_inv=jnp.asarray(1.0 / ptp, dtype=dtype),
            dats=jnp.asarray(dats),
            lens=lens,
            log_spec=bool(log_spec))


def _corner_list(ndim):
    return list(itertools.product((0, 1), repeat=ndim))


# grids up to this many spectra interpolate via a one-hot MXU matmul
# (see interp_batch); larger ones fall back to per-corner gathers
_ONEHOT_MAX_NSPEC = int(os.environ.get('RVST_ONEHOT_MAX_NSPEC', 4096))


def interp_batch(state: GridInterpState, params):
    """Interpolate spectra for a batch of mapped parameter vectors.

    Parameters
    ----------
    state : GridInterpState
    params : (ntrial, ndim) mapped parameters

    Returns
    -------
    spec : (ntrial, npix) interpolated spectra (exponentiated if
        the state stores log-spectra)
    outside : (ntrial,) 0 inside the grid, else the ptp-scaled
        nearest-template distance (smooth out-of-grid indicator)
    """
    ndim = state.ndim
    nt = params.shape[0]
    dt = state.uvecs[0].dtype
    params = params.astype(dt)

    finite = jnp.isfinite(params).all(axis=1)
    p_safe = jnp.where(finite[:, None], params, 0.0)

    pos = []
    frac = []
    inb = jnp.ones(nt, dtype=bool)
    for i in range(ndim):
        u = state.uvecs[i]
        pi = jnp.searchsorted(u, p_safe[:, i], side='right') - 1
        inb = inb & (pi >= 0) & (pi < state.lens[i] - 1)
        pic = jnp.clip(pi, 0, state.lens[i] - 2)
        x = (p_safe[:, i] - u[pic]) / (u[pic + 1] - u[pic])
        pos.append(pic)
        frac.append(x)

    # strides of the flattened idgrid
    strides = np.ones(ndim, dtype=np.int64)
    for i in range(ndim - 2, -1, -1):
        strides[i] = strides[i + 1] * state.lens[i + 1]

    corners = _corner_list(ndim)
    ids = []        # per corner: (nt,) spectrum ids
    weights = []    # per corner: (nt,)
    all_known = inb
    for corner in corners:
        flat = jnp.zeros(nt, dtype=jnp.int32)
        w = jnp.ones(nt, dtype=dt)
        for i in range(ndim):
            flat = flat + (pos[i] + corner[i]) * np.int32(strides[i])
            w = w * jnp.where(corner[i] == 1, frac[i], 1.0 - frac[i])
        cid = state.idgrid[flat]
        all_known = all_known & (cid >= 0)
        ids.append(cid)
        weights.append(w)

    # nearest template in the ptp-scaled metric (fallback + distance)
    q = p_safe * state.ptp_inv[None, :]                    # (nt, ndim)
    d2 = (jnp.sum(q * q, axis=1)[:, None]
          - 2.0 * jnp.dot(q, state.vecs_scaled.T,
                          precision=matmul_precision('interp'))
          + jnp.sum(state.vecs_scaled * state.vecs_scaled, axis=1)[None, :])
    nearest = jnp.argmin(d2, axis=1)
    nn_dist = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

    # non-finite parameters: reference behavior is spectrum id 0
    fallback_id = jnp.where(finite, nearest, 0)

    nspec = state.dats.shape[0]
    if nspec <= _ONEHOT_MAX_NSPEC:
        # one-hot matmul: fold the 2^ndim corner weights (plus the
        # nearest-template fallback) into an (nt, nspec) weight matrix
        # and take ONE MXU matmul against the spectrum table.  The
        # per-corner gather formulation lowers to 2^ndim large
        # dynamic-slice DMAs per call, which dominate the NM objective
        # wall clock on TPU (latency-bound DMA churn, measured 33% of
        # device busy time); the matmul streams the table once at full
        # HBM bandwidth and runs on the MXU.  Scales linearly with
        # nspec, so very large grids keep the gather path below.
        spec_ids = jnp.arange(nspec, dtype=jnp.int32)[None, :]
        wmat = jnp.zeros((nt, nspec), dtype=state.dats.dtype)
        w_ok = all_known.astype(state.dats.dtype)
        for cid, w in zip(ids, weights):
            wmat = wmat + (w * w_ok)[:, None] * (
                cid[:, None] == spec_ids).astype(state.dats.dtype)
        wmat = wmat + (1.0 - w_ok)[:, None] * (
            fallback_id[:, None] == spec_ids).astype(state.dats.dtype)
        spec = jnp.dot(wmat, state.dats,
                       precision=matmul_precision('interp'))
    else:
        acc = jnp.zeros((nt, state.npix), dtype=state.dats.dtype)
        for cid, w in zip(ids, weights):
            safe = jnp.where(all_known, cid, 0)
            acc = acc + jnp.where(all_known, w,
                                  0.0)[:, None] * state.dats[safe]
        fb = state.dats[fallback_id]
        spec = jnp.where(all_known[:, None], acc, fb)

    if state.log_spec:
        spec = jnp.exp(spec)
    outside = jnp.where(all_known, 0.0, nn_dist)
    return spec, outside


def interp_one(state: GridInterpState, param):
    spec, outside = interp_batch(state, param[None, :])
    return spec[0], outside[0]
