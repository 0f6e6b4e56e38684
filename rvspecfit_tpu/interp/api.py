"""Template model: interpolator + wavelength geometry + param mapper.

The device-side counterpart of the reference SpecInterpolator registry
(reference: py/rvspecfit/spec_inter.py:197-398).  A TemplateModel
bundles everything the fused likelihood needs to evaluate a template
spectrum for a batch of stellar-parameter trial points:

* the interpolator state (regular-grid multilinear or NN MLP; the
  Delaunay interpolator of the reference is a CPU-side compatibility
  path, see interp/triangulation.py),
* the template wavelength grid as a spline geometry (for the Doppler
  resampling stage),
* the parameter mapper (log10 of selected dims), applied *in-graph*
  so the likelihood is differentiable in external parameters.

Loading from the on-disk template library is in
``rvspecfit_tpu.pipeline.library``.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu.ops.spline import SplineGeometry
from rvspecfit_tpu.interp import grid as grid_mod


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TemplateModel:
    """One spectral setup's template interpolator, device-resident."""

    kind: str                   # static: 'grid' | 'nn'
    state: object               # GridInterpState | nn.NNState (pytree)
    geom: SplineGeometry        # template wavelength geometry (pytree)
    parnames: tuple             # static parameter names
    log_ids: tuple              # static: indices log10-mapped
    extra: dict = dataclasses.field(default_factory=dict)  # provenance

    def tree_flatten(self):
        return (self.state, self.geom), (self.kind, self.parnames,
                                         self.log_ids, tuple(
                                             sorted(self.extra.items())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, parnames, log_ids, extra_items = aux
        state, geom = children
        return cls(kind, state, geom, parnames, log_ids, dict(extra_items))

    @property
    def lam(self):
        return np.asarray(self.geom.xs)

    @property
    def log_step(self):
        if not self.geom.log_step:
            raise ValueError('template grid is not log-uniform')
        return self.geom.step

    def map_params(self, params):
        """External -> interpolation space (in-graph, differentiable)."""
        if not self.log_ids:
            return params
        cols = []
        for i in range(params.shape[-1]):
            col = params[..., i]
            if i in self.log_ids:
                # guard: log of non-positive must not poison gradients
                col = jnp.log10(jnp.maximum(col, 1e-30))
            cols.append(col)
        return jnp.stack(cols, axis=-1)

    def eval_batch(self, params):
        """(T, ndim) external params -> ((T, npix) spectra, (T,) outside).

        The outside indicator is 0 inside the grid and a smooth
        positive distance outside (used for the chi-square penalty).
        """
        mapped = self.map_params(params)
        if self.kind == 'grid':
            return grid_mod.interp_batch(self.state, mapped)
        if self.kind == 'nn':
            from rvspecfit_tpu.interp import nn as nn_mod
            return nn_mod.interp_batch(self.state, mapped)
        raise ValueError(f'unknown interpolator kind {self.kind!r}')
