"""Parameter-space mappers (external stellar params -> interpolation space).

Equivalent of the reference LogParamMapper
(reference: py/rvspecfit/read_grid.py:114-167): selected parameter
dimensions (by default teff, index 0) are log10-transformed before
interpolation.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class LogMapper:
    """log10-transform selected parameter indices."""

    def __init__(self, log_ids=(0,)):
        self.log_ids = tuple(int(i) for i in (log_ids or ()))

    def forward(self, vec):
        """Map external params -> interpolation space.

        Works on numpy or jax arrays, last axis = parameter index.
        """
        if isinstance(vec, jnp.ndarray):
            out = vec
            for i in self.log_ids:
                out = out.at[..., i].set(jnp.log10(out[..., i]))
            return out
        out = np.array(vec, dtype=np.float64)
        for i in self.log_ids:
            out[..., i] = np.log10(out[..., i])
        return out

    def inverse(self, vec):
        if isinstance(vec, jnp.ndarray):
            out = vec
            for i in self.log_ids:
                out = out.at[..., i].set(10.0 ** out[..., i])
            return out
        out = np.array(vec, dtype=np.float64)
        for i in self.log_ids:
            out[..., i] = 10.0 ** out[..., i]
        return out

    def spec(self):
        """Serializable description."""
        return dict(mapper_class='LogMapper', log_ids=list(self.log_ids))


def mapper_from_spec(spec):
    if spec is None:
        return LogMapper(())
    name = spec.get('mapper_class')
    if name == 'LogMapper':
        return LogMapper(tuple(spec.get('log_ids') or ()))
    raise ValueError(f'Unknown mapper {name!r}')
