"""Tests of the NN interpolator state, forward pass, hull-outside
indicator and checkpoint round-trip."""
import numpy as np
import scipy.spatial
import jax
import jax.numpy as jnp

from rvspecfit_tpu.interp import nn
from rvspecfit_tpu import serializer


def _mk_state(seed=0, withbn=False):
    key = jax.random.PRNGKey(seed)
    rng = np.random.RandomState(1)
    vecs = rng.uniform(-1, 1, size=(50, 4))
    eqs = nn.hull_equations(vecs)
    return nn.init_state(key, ndim=4, width=16, nlayers=2, npc=5,
                         npix=30, hull_eqs=eqs, withbn=withbn), vecs


def numpy_forward(state, x):
    xs = (x - np.asarray(state.mean)) / np.asarray(state.std)
    h = xs
    silu = lambda v: v / (1 + np.exp(-v))
    for (w, b), bn in zip(state.weights, state.bn):
        h = silu(h @ np.asarray(w) + np.asarray(b))
        if bn is not None:
            h = h * np.asarray(bn[0]) + np.asarray(bn[1])
    return h @ np.asarray(state.pc_w) + np.asarray(state.pc_b)


def test_forward_matches_numpy():
    state, _ = _mk_state(withbn=True)
    x = np.random.RandomState(2).normal(size=(7, 4))
    got = np.asarray(nn.forward(state, jnp.asarray(x)))
    ref = numpy_forward(state, x)
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_interp_batch_exp_and_outside():
    state, vecs = _mk_state()
    inside = vecs[:5]
    spec, outside = nn.interp_batch(state, jnp.asarray(inside))
    # hull vertices sit exactly on facets; allow roundoff-level values
    assert (np.asarray(outside) < 1e-20).all()
    assert (np.asarray(spec) > 0).all()

    far = np.array([[5.0, 5.0, 0.0, 0.0], [0.0, 0.0, -7.0, 2.0]])
    _, out_far = nn.interp_batch(state, jnp.asarray(far))
    out_far = np.asarray(out_far)
    assert (out_far > 0).all()

    # check the squared-distance values against scipy hull equations
    for i in range(2):
        sub = vecs[:, 2 * i:2 * i + 2]
        hull = scipy.spatial.ConvexHull(sub)
        p = far[i, 2 * i:2 * i + 2]
        d = np.max(hull.equations[:, :2] @ p + hull.equations[:, 2])
        others = far[i, 2 * (1 - i):2 * (1 - i) + 2]
        hull2 = scipy.spatial.ConvexHull(vecs[:, 2 * (1 - i):2 * (1 - i) + 2])
        d2 = np.max(hull2.equations[:, :2] @ others + hull2.equations[:, 2])
        expected = max(max(d, d2), 0)**2
        np.testing.assert_allclose(out_far[i], expected, rtol=1e-10)


def test_checkpoint_roundtrip(tmp_path):
    state, _ = _mk_state(withbn=True)
    fn = str(tmp_path / 'nn.h5')
    serializer.save_dict_to_hdf5(fn, nn.state_to_dict(state))
    state2 = nn.state_from_dict(serializer.load_dict_from_hdf5(fn))
    x = jnp.asarray(np.random.RandomState(3).normal(size=(4, 4)))
    np.testing.assert_allclose(np.asarray(nn.forward(state, x)),
                               np.asarray(nn.forward(state2, x)),
                               rtol=1e-12)
    # bad magic rejected
    d = nn.state_to_dict(state)
    d['checkpoint_magic'] = 'nope'
    try:
        nn.state_from_dict(d)
        assert False
    except RuntimeError:
        pass
