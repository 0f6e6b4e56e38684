"""Device-mesh scale-out for the batched fitter.

The reference's parallelism is a process/MPI task farm over
independent per-object fits (reference: py/rvspecfit/utils.py:113-318,
desi_fit.py:1471-1481).  The TPU-native equivalent has three levels:

1. within a chip: the fiber batch axis of BatchedFitter (vmap);
2. across chips: that same fiber axis laid out over a
   ``jax.sharding.Mesh`` data axis — jit + NamedSharding makes XLA
   partition every stage of the fused likelihood SPMD with no
   intra-fit communication (fits are independent), so the only
   collectives are for the final reductions the caller asks for;
3. across hosts: static file sharding (utils.ShardedFileQueue) over a
   jax.distributed world — replacing MPIFileQueue's dynamic farm.

Also provides the template-parallel layout for the CCF template bank
(templates sharded over chips, per-chip argmin + global argmin via
one tiny collective) used by fit/ccf.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rvspecfit_tpu.fit.spec_data import ArmState
from rvspecfit_tpu.ops.resolution import BandedMatrix


def make_mesh(n_data=None, devices=None, axis='data'):
    """1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices)
    return Mesh(np.array(devices[:n_data]), (axis,))


def pad_to_multiple(n, m):
    return ((n + m - 1) // m) * m


def shard_fitter(bf, mesh, axis='data'):
    """Lay the fiber axis of a BatchedFitter over the mesh data axis.

    Per-fiber leaves (dvec, espec_inv, log_espec_sum, band data) are
    sharded along ``axis``; shared leaves (lam, polys, template state)
    are replicated.  The fiber count must divide evenly over the mesh
    (pad the batch first with pad_to_multiple).
    """
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))

    def place(arm: ArmState):
        band = arm.band
        if band is not None:
            band = BandedMatrix(band.offsets,
                                jax.device_put(band.bands, row))
        return ArmState(
            lam=jax.device_put(arm.lam, repl),
            dvec=jax.device_put(arm.dvec, row),
            espec_inv=jax.device_put(arm.espec_inv, row),
            polys=jax.device_put(arm.polys, repl),
            log_espec_sum=jax.device_put(arm.log_espec_sum, row),
            band=band, name=arm.name, setup=arm.setup,
            idx0=None if arm.idx0 is None else
            jax.device_put(arm.idx0, repl),
            lam_over_step=None if arm.lam_over_step is None else
            jax.device_put(arm.lam_over_step, repl),
            pallas_window=arm.pallas_window)

    bf.arms = [place(a) for a in bf.arms]
    bf.templates = {k: jax.device_put(v, repl)
                    for k, v in bf.templates.items()}
    bf._fiber_sharding = row
    return bf


def shard_trials(bf, vels, params, vsinis=None):
    """Place per-fiber trial arrays on the fitter's fiber sharding."""
    sh = getattr(bf, '_fiber_sharding', None)
    put = (lambda x: x) if sh is None else (
        lambda x: jax.device_put(jnp.asarray(x, bf.dtype), sh))
    return (put(vels), put(params),
            None if vsinis is None else put(vsinis))
