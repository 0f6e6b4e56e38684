"""Matmul precision policy for the TPU hot paths.

On TPU MXUs an f32 ``dot`` is emulated with bf16 passes:
``DEFAULT`` = 1 pass (bf16 inputs), ``HIGH`` = 3 passes (bf16x3,
near-f32 accuracy), ``HIGHEST`` = 6 passes (f32-exact).  Pass count
is proportional to MXU time, so precision choice is a 2-6x lever on
matmul-bound stages.

Roles and defaults:

- ``ccf`` (default ``high``): the CCF correlation matmuls only rank
  templates and seed the optimizer — bf16x3's ~2^-21 relative error
  is orders below the chi-square differences between templates
  (verified on chip: identical template picks and start velocities
  to HIGHEST at half the MXU passes).
- ``chisq`` (default ``highest``): the fused-likelihood normal-matrix
  contractions feed Cholesky solves of small ill-conditioned
  systems; keep f32-exact unless measured safe.
- ``interp`` (default ``highest``): template-grid/NN interpolation.

Override per role with ``RVST_PRECISION_<ROLE>=default|high|highest``
or globally with ``RVST_PRECISION``.  Read at trace time — set the
env before the first jit of the affected program.
"""
from __future__ import annotations

import os

import jax

_MAP = {
    'default': jax.lax.Precision.DEFAULT,
    'high': jax.lax.Precision.HIGH,
    'highest': jax.lax.Precision.HIGHEST,
}

_ROLE_DEFAULTS = {
    'ccf': 'high',
    'chisq': 'highest',
    'interp': 'highest',
}


def matmul_precision(role):
    """Precision for matmuls of the given role (see module doc)."""
    name = (os.environ.get('RVST_PRECISION_' + role.upper())
            or os.environ.get('RVST_PRECISION')
            or _ROLE_DEFAULTS.get(role, 'highest')).lower()
    if name not in _MAP:
        raise ValueError(f'unknown precision {name!r} for role {role!r}')
    return _MAP[name]


def pallas_precision(role):
    """Precision for dots INSIDE Pallas TPU kernels.

    Mosaic's dot lowering accepts only DEFAULT and HIGHEST
    (jax/_src/pallas/mosaic/lowering.py maps them to the MXU's native
    and fp32 contract modes; HIGH raises NotImplementedError).  Clamp
    HIGH up to HIGHEST — the fused kernels exist to kill HBM traffic,
    so the extra MXU passes are off the critical path — and leave the
    XLA-side programs free to keep bf16x3.
    """
    p = matmul_precision(role)
    return jax.lax.Precision.HIGHEST if p == jax.lax.Precision.HIGH \
        else p
