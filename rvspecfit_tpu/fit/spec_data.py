"""Spectroscopic dataset containers.

``SpecData`` is the host-level immutable description of one observed
spectrum in one instrument arm (role of the reference SpecData,
py/rvspecfit/spec_fit.py:70-145).  The device-resident constants
derived from it (data vector, continuum basis, banded resolution)
live in ``ArmState`` (a pytree closed over by the jitted likelihood).
"""
from __future__ import annotations

import dataclasses
import itertools

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu.ops import basis as basis_mod
from rvspecfit_tpu.ops.resolution import BandedMatrix


def pallas_spline_window(idx0_host, geom=None):
    """Static window size for the windowed-DMA Doppler spline kernel;
    None = XLA gather path.

    Policy: ON by default on TPU backends (on-chip A/B: ~20% faster
    fused likelihood and ~2x faster compiles than the XLA gather,
    tools/ab_pallas_spline.py), OFF elsewhere.  Override with
    RVST_PALLAS_SPLINE=1 (force on), =interpret (CPU-interpreted,
    for tests), =0 (force off)."""
    import os
    flag = os.environ.get('RVST_PALLAS_SPLINE', '')
    if flag in ('0', 'off'):
        return None
    if geom is not None and bool(geom.log_step) \
            and float(geom.step) > 0.01:
        return None            # kernel's expm1 Taylor needs a fine grid
    if not flag:
        try:
            if jax.default_backend() != 'tpu':
                return None
        except Exception:
            return None
    from rvspecfit_tpu.ops import pallas_spline as ps
    return ps.window_size(idx0_host)

_objid_counter = itertools.count(1)


class SpecData:
    """One observed spectrum: name, wavelengths, flux, errors, mask.

    Immutable and hashable (by identity token) so it can key host-side
    caches of derived device state.
    """

    __slots__ = ('name', 'lam', 'spec', 'espec', 'badmask', 'resolution',
                 '_objid')

    def __init__(self, name, lam, spec, espec, badmask=None, resolution=None,
                 dtype=np.float64):
        self.name = str(name)
        self.lam = np.ascontiguousarray(lam, dtype=dtype)
        self.spec = np.ascontiguousarray(spec, dtype=dtype)
        self.espec = np.ascontiguousarray(espec, dtype=dtype)
        if badmask is None:
            badmask = np.zeros(len(self.spec), dtype=bool)
        self.badmask = np.ascontiguousarray(badmask, dtype=bool)
        if resolution is not None and not isinstance(resolution,
                                                     BandedMatrix):
            raise TypeError('resolution must be a BandedMatrix')
        self.resolution = resolution
        if not (len(self.lam) == len(self.spec) == len(self.espec)
                == len(self.badmask)):
            raise ValueError('inconsistent array lengths')
        self._objid = next(_objid_counter)

    def __hash__(self):
        return self._objid

    def __eq__(self, other):
        return self is other

    def __len__(self):
        return len(self.lam)

    def __repr__(self):
        return (f'SpecData({self.name!r}, npix={len(self.lam)}, '
                f'lam=[{self.lam[0]:.1f}..{self.lam[-1]:.1f}])')


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ArmState:
    """Device constants of one arm for the fused likelihood.

    ``idx0``/``lam_over_step`` are the float64-precomputed fractional
    template-grid indices of the arm pixels (and, for linear template
    grids, lam/step) enabling the cancellation-free Doppler index
    shift (ops.spline.spline_eval_index).
    """

    lam: jnp.ndarray            # (npix,)
    dvec: jnp.ndarray           # (npix,) spec/espec
    espec_inv: jnp.ndarray      # (npix,) 1/espec
    polys: jnp.ndarray          # (npoly, npix) continuum basis
    log_espec_sum: jnp.ndarray  # scalar
    band: BandedMatrix | None   # optional resolution matrix
    name: str                   # static
    setup: str                  # static: template setup key
    idx0: jnp.ndarray | None = None          # (npix,) fractional index
    lam_over_step: jnp.ndarray | None = None  # (npix,) linear grids
    pallas_window: int | None = None  # static: windowed-DMA kernel on

    def tree_flatten(self):
        children = (self.lam, self.dvec, self.espec_inv, self.polys,
                    self.log_espec_sum, self.band, self.idx0,
                    self.lam_over_step)
        return children, (self.name, self.setup, self.pallas_window)

    @classmethod
    def tree_unflatten(cls, aux, children):
        name, setup = aux[0], aux[1]
        window = aux[2] if len(aux) > 2 else None
        return cls(*children[:6], name, setup, *children[6:],
                   pallas_window=window)

    @property
    def npix(self):
        return self.lam.shape[0]

    @classmethod
    def build(cls, sd: SpecData, npoly=5, rbf=True, espec_systematic=None,
              resol_matrix=None, dtype=None, setup=None, geom=None,
              allow_pallas=False):
        """Derive device constants from a SpecData.

        ``espec_systematic`` is added in quadrature to the error vector
        (reference semantics: py/rvspecfit/spec_fit.py:933-940).
        ``resol_matrix`` is a per-call resolution override, mutually
        exclusive with the SpecData's own resolution
        (reference: py/rvspecfit/spec_fit.py:922-929).
        """
        espec = sd.espec
        if espec_systematic is not None:
            espec = np.sqrt(np.asarray(espec_systematic)**2 + espec**2)
        if resol_matrix is not None and sd.resolution is not None:
            raise ValueError('resol_params cannot be combined with a '
                             'per-SpecData resolution')
        band = resol_matrix if resol_matrix is not None else sd.resolution
        polys = basis_mod.continuum_basis(sd.lam, npoly, rbf=rbf)
        if dtype is None:
            dtype = jnp.zeros(0).dtype
        to = lambda x: jnp.asarray(x, dtype=dtype)
        if band is not None:
            band = BandedMatrix(band.offsets, band.bands.astype(dtype))
        idx0 = None
        lam_over_step = None
        window = None
        if geom is not None:
            from rvspecfit_tpu.ops.spline import fractional_index
            idx0_host = fractional_index(geom, sd.lam)
            idx0 = to(idx0_host)
            if not geom.log_step:
                lam_over_step = to(sd.lam / geom.step)
            # the single-object FusedChisq path differentiates through
            # the likelihood (BFGS polish, AD Hessian); the Pallas
            # kernel defines no VJP, so it stays off here by default —
            # the batched fitter opts in for its non-AD phases
            if allow_pallas:
                window = pallas_spline_window(idx0_host, geom)
        return cls(lam=to(sd.lam), dvec=to(sd.spec / espec),
                   espec_inv=to(1.0 / espec), polys=to(polys),
                   log_espec_sum=to(np.log(espec).sum()),
                   band=band, name=sd.name,
                   setup=setup if setup is not None else sd.name,
                   idx0=idx0, lam_over_step=lam_over_step,
                   pallas_window=window)
