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

``auto_shard`` is the driver entry point: a no-op on single-device
hosts, a fiber-axis mesh layout (with transparent padding to a mesh
multiple) when the host has several chips.
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


def _pad_rows(x, mult):
    """Pad the leading (fiber) axis to a multiple of ``mult`` by
    repeating the last row (NamedSharding requires even divisibility;
    padded rows are never gathered — tile index vectors only address
    real fibers)."""
    x = jnp.asarray(x)
    pad = (-x.shape[0]) % mult
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)


def place_arm_states(arms, row, repl, nmesh):
    """ArmState list with per-fiber leaves padded to the mesh multiple
    and sharded on ``row``; shared leaves replicated."""
    out = []
    for arm in arms:
        band = arm.band
        if band is not None:
            band = BandedMatrix(band.offsets, jax.device_put(
                _pad_rows(band.bands, nmesh), row))
        out.append(ArmState(
            lam=jax.device_put(arm.lam, repl),
            dvec=jax.device_put(_pad_rows(arm.dvec, nmesh), row),
            espec_inv=jax.device_put(_pad_rows(arm.espec_inv, nmesh),
                                     row),
            polys=jax.device_put(arm.polys, repl),
            log_espec_sum=jax.device_put(
                _pad_rows(arm.log_espec_sum, nmesh), row),
            band=band, name=arm.name, setup=arm.setup,
            idx0=None if arm.idx0 is None else
            jax.device_put(arm.idx0, repl),
            lam_over_step=None if arm.lam_over_step is None else
            jax.device_put(arm.lam_over_step, repl),
            pallas_window=arm.pallas_window))
    return out


def shard_fitter(bf, mesh, axis='data'):
    """Lay the fiber axis of a BatchedFitter over the mesh data axis.

    Per-fiber leaves (dvec, espec_inv, log_espec_sum, band data) are
    sharded along ``axis``; shared leaves (lam, polys, template state)
    are replicated.  A fiber count that does not divide the mesh is
    padded transparently (bf.nfibers is unchanged — the padded rows
    exist only in the stored device arrays, and every consumer
    addresses fibers by index < nfibers).
    """
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))
    nmesh = mesh.devices.size
    bf.arms = place_arm_states(bf.arms, row, repl, nmesh)
    bf.templates = {k: jax.device_put(v, repl)
                    for k, v in bf.templates.items()}
    bf._fiber_sharding = row
    bf._repl_sharding = repl
    bf._mesh_size = nmesh
    for attr in ('_arms_ad', '_arm_axes_ad'):
        if hasattr(bf, attr):
            delattr(bf, attr)
    return bf


def auto_shard(bf, devices=None, min_devices=2):
    """Driver-level scale-out: shard the fitter over all local devices
    when the host has more than one (reference equivalent: N worker
    processes per node, desi_fit.py:1471-1481).  Returns the Mesh, or
    None on single-device hosts (no-op)."""
    if devices is None:
        devices = jax.local_devices()
    if len(devices) < min_devices:
        return None
    mesh = make_mesh(devices=devices)
    shard_fitter(bf, mesh)
    return mesh


def shard_trials(bf, vels, params, vsinis=None):
    """Place per-fiber trial arrays on the fitter's fiber sharding."""
    sh = getattr(bf, '_fiber_sharding', None)
    put = (lambda x: x) if sh is None else (
        lambda x: jax.device_put(jnp.asarray(x, bf.dtype), sh))
    return (put(vels), put(params),
            None if vsinis is None else put(vsinis))
