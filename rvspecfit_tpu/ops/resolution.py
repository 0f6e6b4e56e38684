"""Banded resolution-matrix convolution.

The instrument line-spread function is expressed as a banded matrix
acting on the template (reference: py/rvspecfit/spec_fit.py:410-492;
DESI provides the band directly in its RESOLUTION extension,
reference: py/rvspecfit/desi/desi_fit.py:682-748).

TPU design: a banded matvec is a stencil — for each diagonal offset d,
y += band_d * shift(x, d).  With a static, small set of offsets
(2W+1 ~ 11..25) this is a fixed-shape gather + multiply-add chain the
VPU handles at memory bandwidth; no sparse formats involved.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BandedMatrix:
    """Banded square matrix in diagonal storage.

    ``bands[j, i]`` is the element M[i, i + offsets[j]] (row-oriented
    storage: bands are indexed by *row*).  Out-of-range band entries
    are ignored (treated as zero).
    """

    offsets: tuple            # static ints
    bands: jnp.ndarray        # (noff, n)

    def tree_flatten(self):
        return (self.bands,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])

    @property
    def n(self):
        return self.bands.shape[-1]

    def matvec(self, x):
        """y[i] = sum_j bands[j, i] * x[i + offsets[j]]."""
        n = self.n
        y = jnp.zeros_like(x)
        for j, off in enumerate(self.offsets):
            shifted = jnp.roll(x, -off)
            idx = jnp.arange(n) + off
            valid = (idx >= 0) & (idx < n)
            y = y + jnp.where(valid, self.bands[j] * shifted, 0.0)
        return y

    def to_dense(self):
        n = self.n
        m = np.zeros((n, n))
        b = np.asarray(self.bands)
        for j, off in enumerate(self.offsets):
            for i in range(n):
                k = i + off
                if 0 <= k < n:
                    m[i, k] = b[j, i]
        return m


def gaussian_resolution_matrix(lam, resol=None, width=None, thresh=5.0):
    """Build a banded Gaussian LSF matrix (host-side, float64).

    Parameters
    ----------
    lam : (n,) wavelengths (monotonic increasing)
    resol : scalar or (n,) resolution R = lambda/dlambda (FWHM-based)
    width : scalar or (n,) Gaussian sigma in wavelength units
        (exactly one of resol/width must be given)
    thresh : kernel truncation in sigmas

    Returns
    -------
    BandedMatrix with rows normalized to unit sum — applying it to a
    constant vector returns (approximately) the constant.
    """
    lam = np.asarray(lam, dtype=np.float64)
    n = lam.shape[0]
    if (resol is None) == (width is None):
        raise ValueError('specify exactly one of resol or width')
    if resol is not None:
        sigs = lam / np.asarray(resol, dtype=np.float64) / 2.35
    else:
        sigs = np.broadcast_to(np.asarray(width, dtype=np.float64), (n,))
    if not np.all(np.diff(lam) > 0):
        raise ValueError('wavelengths must be increasing')

    lo = np.searchsorted(lam, lam - thresh * sigs, 'left')
    hi = np.minimum(np.searchsorted(lam, lam + thresh * sigs, 'right'),
                    n - 1)
    pix = np.arange(n)
    w = int(min(n, max(np.max(hi - pix), np.max(pix - lo))))
    offsets = np.arange(-w, w + 1)

    cols = pix[None, :] + offsets[:, None]            # (noff, n)
    valid = (cols >= 0) & (cols < n)
    cols_c = np.clip(cols, 0, n - 1)
    ker = np.exp(-0.5 * ((lam[cols_c] - lam[None, :]) / sigs[None, :])**2)
    ker = np.where(valid, ker, 0.0)
    ker = ker / ker.sum(axis=0, keepdims=True)
    # ker[j, i] is the weight of input pixel i+offsets[j] for output
    # pixel i, which is exactly row-oriented band storage.
    return BandedMatrix(tuple(int(o) for o in offsets), jnp.asarray(ker))


def banded_from_desi_resolution(resdata):
    """Wrap a DESI-style resolution array (noff, npix) as BandedMatrix.

    DESI stores dia-convention (scipy ``dia_matrix``) data: row k is
    diagonal offset (W - k), COLUMN-indexed — ``M[i, j] =
    resdata[k, j]`` with ``j - i = W - k``
    (reference: py/rvspecfit/desi/desi_fit.py:743-747).  BandedMatrix
    storage is ROW-indexed (``bands[k, i] = M[i, i + offsets[k]]``),
    so each diagonal is rolled from column- to row-indexing.  Values
    rolled around the edge land only at positions masked as invalid
    by the matvec.
    """
    resdata = np.asarray(resdata)
    noff = resdata.shape[0]
    w = noff // 2
    offsets = tuple(int(w - k) for k in range(noff))
    rows = np.stack([np.roll(resdata[k], k - w) for k in range(noff)])
    return BandedMatrix(offsets, jnp.asarray(rows))
