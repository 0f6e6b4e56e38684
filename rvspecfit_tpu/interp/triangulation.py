"""Delaunay (barycentric) template interpolation — CPU compatibility.

Equivalent of the reference TriInterp
(reference: py/rvspecfit/spec_inter.py:11-59).  Simplex location has
no efficient TPU analogue, so this interpolator is host-side only: it
is provided for parity with triangulation-type template libraries and
for offline validation.  For on-device fitting, either build the
library with --regulargrid, resample irregular grids with
rvst_regularize_grid, or train the NN interpolator.
"""
from __future__ import annotations

import numpy as np
import scipy.spatial


class TriInterp:
    """Barycentric linear interpolation inside Delaunay simplices."""

    def __init__(self, triang, dats, exp=True):
        self.triang = triang
        self.dats = dats
        self.exp = exp
        self.ndim = triang.ndim

    @classmethod
    def from_points(cls, points, dats, exp=True):
        return cls(scipy.spatial.Delaunay(np.asarray(points)), dats,
                   exp=exp)

    def __call__(self, p):
        p = np.asarray(p, dtype=np.float64)
        xid = int(self.triang.find_simplex(p))
        if xid == -1:
            return np.nan
        ndim = self.ndim
        b = np.empty(ndim + 1)
        b[:ndim] = self.triang.transform[xid, :ndim, :].dot(
            p - self.triang.transform[xid, ndim, :])
        b[ndim] = 1 - b[:ndim].sum()
        spec = (self.dats[self.triang.simplices[xid]] * b[:, None]).sum(
            axis=0)
        if self.exp:
            spec = np.exp(spec)
        if spec.size == 1:
            return float(spec[0])
        return spec

    def batch(self, ps):
        return np.array([self(p) for p in np.atleast_2d(ps)])
