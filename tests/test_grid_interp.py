"""Tests of the regular-grid multilinear interpolator.

Verified against an independent numpy implementation of the same
semantics (multilinear inside, nearest-template fallback at holes /
outside, ptp-scaled nearest distance as the outside indicator).
"""
import itertools

import numpy as np
import jax.numpy as jnp

from rvspecfit_tpu.interp import grid


def numpy_reference(uvecs, idgrid, vecs, dats, p, log_spec):
    ndim = len(uvecs)
    lens = np.array([len(u) for u in uvecs])
    ptp = np.ptp(vecs, axis=1)
    scaled = vecs.T / ptp

    def nearest(pq):
        d = np.linalg.norm(scaled - pq / ptp, axis=1)
        return int(np.argmin(d)), float(np.min(d))

    out = np.exp if log_spec else (lambda x: x)
    if not np.all(np.isfinite(p)):
        return out(dats[0]), None
    pos = np.array([np.digitize(p[i], uvecs[i]) - 1 for i in range(ndim)])
    if np.any((pos < 0) | (pos >= lens - 1)):
        ni, nd = nearest(p)
        return out(dats[ni]), nd
    corners = np.array(list(itertools.product((0, 1), repeat=ndim)))
    vids = idgrid[tuple((pos[None, :] + corners).T)]
    if np.any(vids < 0):
        ni, nd = nearest(p)
        return out(dats[ni]), nd
    x = np.array([(p[i] - uvecs[i][pos[i]])
                  / (uvecs[i][pos[i] + 1] - uvecs[i][pos[i]])
                  for i in range(ndim)])
    w = np.prod(x[None, :]**corners * (1 - x[None, :])**(1 - corners), axis=1)
    return out(w @ dats[vids]), 0.0


def _make_grid(ndim=3, npix=37, holes=True, seed=0):
    rng = np.random.RandomState(seed)
    uvecs = [np.sort(rng.uniform(0, 1, size=5 + i)) for i in range(ndim)]
    lens = [len(u) for u in uvecs]
    pts = np.array(list(itertools.product(*uvecs))).T   # (ndim, nfull)
    nfull = pts.shape[1]
    keep = np.ones(nfull, dtype=bool)
    if holes:
        keep[rng.choice(nfull, size=nfull // 10, replace=False)] = False
    vecs = pts[:, keep]
    nspec = vecs.shape[1]
    dats = rng.normal(size=(nspec, npix))
    idgrid = np.full(lens, -1, dtype=int)
    # map kept points back onto the grid
    pos_full = np.array(list(itertools.product(*[range(n) for n in lens]))).T
    idgrid[tuple(pos_full[:, keep])] = np.arange(nspec)
    return uvecs, idgrid, vecs, dats


def test_matches_numpy_reference():
    uvecs, idgrid, vecs, dats = _make_grid()
    state = grid.GridInterpState.build(uvecs, idgrid, vecs, dats,
                                       log_spec=True)
    rng = np.random.RandomState(1)
    # queries: interior, outside, near-holes
    qs = np.vstack([
        rng.uniform(-0.2, 1.2, size=(60, 3)),
        vecs.T[:10] + 1e-4,
    ])
    spec, outside = grid.interp_batch(state, jnp.asarray(qs))
    spec = np.asarray(spec)
    outside = np.asarray(outside)
    for i, q in enumerate(qs):
        ref_spec, ref_dist = numpy_reference(uvecs, idgrid, vecs, dats, q,
                                             True)
        np.testing.assert_allclose(spec[i], ref_spec, rtol=1e-10,
                                   err_msg=f'query {i}')
        if ref_dist is not None:
            np.testing.assert_allclose(outside[i], ref_dist, atol=1e-10)


def test_nonfinite_params_use_first_spectrum():
    uvecs, idgrid, vecs, dats = _make_grid(holes=False)
    state = grid.GridInterpState.build(uvecs, idgrid, vecs, dats,
                                       log_spec=False)
    q = jnp.asarray([[np.nan, 0.5, 0.5]])
    spec, _ = grid.interp_batch(state, q)
    np.testing.assert_allclose(np.asarray(spec)[0], dats[0])


def test_exact_at_grid_nodes():
    uvecs, idgrid, vecs, dats = _make_grid(holes=False, seed=5)
    state = grid.GridInterpState.build(uvecs, idgrid, vecs, dats,
                                       log_spec=False)
    # query exactly at interior nodes -> exact template values
    qs = vecs.T[5:8]
    spec, outside = grid.interp_batch(state, jnp.asarray(qs))
    for i in range(3):
        np.testing.assert_allclose(np.asarray(spec)[i], dats[5 + i],
                                   atol=1e-9)
