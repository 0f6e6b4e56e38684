"""Build the n-d interpolator artifacts (offline, CPU).

Equivalent of the reference rvs_make_nd
(reference: py/rvspecfit/make_nd.py): consumes specs_{setup}.h5 and
produces interp_{setup}.h5 + interpdat_{setup}.npy.

Two interpolation types:
* ``regulargrid`` (the TPU-native one, default here): per-dimension
  unique values + an integer id grid with -1 holes — consumed on
  device by interp.grid.GridInterpState;
* ``triangulation``: scipy Delaunay over (perturbed, ghost-corner-
  padded) points — a CPU-side compatibility path (there is no good
  TPU analogue of simplex walking; convert irregular grids with
  rvst_regularize_grid or train the NN interpolator instead).

Unlike the reference, which pickles the Delaunay object into the h5
artifact, the triangulation artifact stores only the raw point set
and flags, and the triangulation is rebuilt deterministically at load
time — artifacts stay pickle-free and portable.
"""
from __future__ import annotations

import argparse
import logging
import os
import shlex
import sys

import numpy as np

from rvspecfit_tpu import serializer
from rvspecfit_tpu import __version__ as git_rev
from rvspecfit_tpu.interp.mapper import LogMapper
from rvspecfit_tpu.pipeline.make_interpol import SPECS_H5_NAME

INTERPOL_H5_NAME = 'interp_%s.h5'
INTERPOL_DAT_NAME = 'interpdat_%s.npy'
PERTURBATION_AMPLITUDE = 1e-6
EDGE_PAD_FRACTION = 0.2


def getedgevertices(vec):
    """Vertices of a padded bounding box around the points
    (reference: make_nd.py:18-52)."""
    ndim = vec.shape[0]
    span = np.ptp(vec, axis=1)
    lo = vec.min(axis=1) - EDGE_PAD_FRACTION * span
    hi = vec.max(axis=1) + EDGE_PAD_FRACTION * span
    corners = []
    for i in range(2**ndim):
        corners.append([hi[j] if (i >> j) & 1 else lo[j]
                        for j in range(ndim)])
    return np.array(corners).T


def execute(setup, prefix=None, regular=False, perturb=True, revision='',
            cmdline=''):
    """Build interp_{setup}.h5 (+ interpdat npy)
    (reference: make_nd.py:55-177)."""
    d = serializer.load_dict_from_hdf5(
        os.path.join(prefix, SPECS_H5_NAME % setup))
    vec = np.asarray(d['vec'], dtype=np.float64)
    specs = np.asarray(d['specs'])
    mapper = LogMapper(tuple(int(x) for x in d.get('log_ids', (0,))))
    vec_mapped = mapper.forward(vec.T).T
    if not np.isfinite(vec_mapped).all():
        raise RuntimeError('Mapped parameters are not finite')
    ndim = vec_mapped.shape[0]

    ret = dict(lam=d['lam'], log_step=bool(d['log_step']),
               parnames=list(d['parnames']),
               mapper_class='LogMapper',
               log_ids=list(d.get('log_ids', (0,))),
               revision=revision, lognorms=d['lognorms'],
               log_spec=bool(d.get('log_spec', True)),
               git_rev=git_rev, cmdline=cmdline)

    if regular:
        uvecs, vecids = [], []
        for i in range(ndim):
            u, inv = np.unique(vec_mapped[i], return_inverse=True)
            uvecs.append(u)
            vecids.append(inv)
        lens = [len(u) for u in uvecs]
        idgrid = np.full(lens, -1, dtype=np.int64)
        idgrid[tuple(vecids)] = np.arange(vec_mapped.shape[1])
        ret['interpolation_type'] = 'regulargrid'
        ret['uvecs'] = {f'dim{i}': u for i, u in enumerate(uvecs)}
        ret['idgrid'] = idgrid
        ret['vec'] = vec_mapped
    else:
        if perturb:
            rng = np.random.RandomState(1)
            vec_mapped = vec_mapped + rng.uniform(
                -PERTURBATION_AMPLITUDE, PERTURBATION_AMPLITUDE,
                size=vec_mapped.shape)
        edges = getedgevertices(vec_mapped)
        import scipy.spatial
        nearnei = scipy.spatial.cKDTree(vec_mapped.T).query(edges.T)[1]
        vec_all = np.hstack([vec_mapped, edges])
        specs = np.vstack([specs, specs[nearnei]])
        extraflags = np.concatenate([np.zeros(vec_mapped.shape[1]),
                                     np.ones(edges.shape[1])])
        ret['interpolation_type'] = 'triangulation'
        ret['vec'] = vec_all
        ret['extraflags'] = extraflags
        ret['lognorms'] = np.concatenate(
            [np.asarray(d['lognorms']), np.zeros(edges.shape[1])])
        # triangulation is rebuilt at load time (pickle-free artifact);
        # verify it builds now so failures surface in the pipeline
        scipy.spatial.Delaunay(vec_all.T)

    serializer.save_dict_to_hdf5(
        os.path.join(prefix, INTERPOL_H5_NAME % setup), ret)
    np.save(os.path.join(prefix, INTERPOL_DAT_NAME % setup),
            np.ascontiguousarray(specs))
    logging.info('wrote %s interpolator for setup %s',
                 ret['interpolation_type'], setup)


def main(args=None):
    if args is None:
        args = sys.argv[1:]
    cmdline = shlex.join(['rvst_make_nd'] + list(args))
    parser = argparse.ArgumentParser(
        description='Create n-d spectral interpolation artifacts')
    parser.add_argument('--prefix', type=str, required=True)
    parser.add_argument('--setup', type=str, required=True)
    parser.add_argument('--regulargrid', action='store_true')
    parser.add_argument('--revision', type=str, default='')
    args = parser.parse_args(args)
    execute(args.setup, prefix=args.prefix, revision=args.revision or '',
            regular=args.regulargrid, cmdline=cmdline)


if __name__ == '__main__':
    main()
