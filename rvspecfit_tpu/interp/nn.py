"""Neural-network template interpolator (inference + state).

TPU-native equivalent of the reference's torch MLP interpolator
(reference: py/rvspecfit/nn/NNInterpolator.py:14-91,
nn/RVSInterpolator.py:15-77).  Architecture (matching semantics):

    x -> standardize -> Linear(ndim, width) -> act
      -> [Linear(width, width) -> act (-> batchnorm)] * nlayers
      -> Linear(width, npc) -> act
      -> Linear(npc, npix)          # PCA-like bottleneck output layer
    spectrum = exp(clip(out, -300, 300))

The output standardization is folded into the last layer at training
time (reference train_interpolator.py:361-363) so inference is raw.
Batch-norm statistics are folded to an affine scale/shift for
inference.

The outside-grid indicator replaces the reference's scipy hull +
Delaunay query with a direct evaluation of the convex-hull facet
equations (precomputed on the host): the squared positive facet
distance of the (p0,p1) and (p2,p3) projections — identical values,
fully jit-able (reference: nn/RVSInterpolator.py:45-77).

This is the most MXU-friendly interpolator: a batch of trial points
is a stack of small matmuls.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

ARCHITECTURE_VERSION = 1
CHECKPOINT_MAGIC = 'rvspecfit_tpu.nn_interpolator'
CHECKPOINT_VERSION = 1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NNState:
    """Device-resident NN interpolator state."""

    weights: tuple        # per layer (w (in,out), b (out,))
    bn: tuple             # per layer None or (scale (out,), shift (out,))
    pc_w: jnp.ndarray     # (npc, npix)
    pc_b: jnp.ndarray     # (npix,)
    mean: jnp.ndarray     # (ndim,) standardization of mapped params
    std: jnp.ndarray      # (ndim,)
    hull_eqs: tuple       # two (nfacet, 3) arrays (2-D hull equations)
    nonlinearity: str     # static

    def tree_flatten(self):
        return ((self.weights, self.bn, self.pc_w, self.pc_b, self.mean,
                 self.std, self.hull_eqs), (self.nonlinearity,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        weights, bn, pc_w, pc_b, mean, std, hull_eqs = children
        return cls(weights, bn, pc_w, pc_b, mean, std, hull_eqs, aux[0])

    @property
    def npix(self):
        return self.pc_w.shape[1]


def _activation(name):
    return {'SiLU': jax.nn.silu, 'GELU': jax.nn.gelu,
            'Tanh': jnp.tanh, 'ReLU': jax.nn.relu}[name]


def forward(state: NNState, params_mapped):
    """(T, ndim) mapped params -> (T, npix) raw network output."""
    from rvspecfit_tpu.ops.prec import matmul_precision
    hp = matmul_precision('interp')
    x = (params_mapped - state.mean) / state.std
    act = _activation(state.nonlinearity)
    h = x
    for (w, b), bn in zip(state.weights, state.bn):
        h = act(jnp.dot(h, w, precision=hp) + b)
        if bn is not None:
            scale, shift = bn
            h = h * scale + shift
    return jnp.dot(h, state.pc_w, precision=hp) + state.pc_b


def interp_batch(state: NNState, params_mapped):
    """TemplateModel interpolation protocol: (spec, outside)."""
    out = forward(state, params_mapped)
    spec = jnp.exp(jnp.clip(out, -300.0, 300.0))
    outside = hull_outside(state, params_mapped)
    return spec, outside


def hull_outside(state: NNState, p):
    """Squared positive hull-facet distance of the two 2-D projections
    (0 inside both hulls)."""
    d = None
    for i, eqs in enumerate(state.hull_eqs):
        sub = p[:, 2 * i:2 * i + 2]
        di = jnp.max(sub @ eqs[:, :2].T + eqs[:, 2][None, :], axis=1)
        d = di if d is None else jnp.maximum(d, di)
    return jnp.maximum(d, 0.0)**2


def hull_equations(vecs_mapped):
    """Host: convex-hull facet equations of the (0,1) and (2,3)
    projections of the mapped training parameters."""
    import scipy.spatial
    eqs = []
    for i in range(2):
        sub = np.asarray(vecs_mapped)[:, 2 * i:2 * i + 2]
        hull = scipy.spatial.ConvexHull(sub)
        eqs.append(hull.equations.astype(np.float64))
    return eqs


def init_state(key, ndim, width, nlayers, npc, npix, mean=None, std=None,
               hull_eqs=None, withbn=False, nonlinearity='SiLU',
               dtype=None):
    """Random initialization (LeCun-normal weights, zero biases)."""
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    shapes = [(ndim, width)] + [(width, width)] * nlayers + [(width, npc)]
    weights = []
    bn = []
    for i, (nin, nout) in enumerate(shapes):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (nin, nout), dtype) / np.sqrt(nin)
        weights.append((w, jnp.zeros((nout,), dtype)))
        middle = 0 < i < len(shapes) - 1
        bn.append((jnp.ones((nout,), dtype), jnp.zeros((nout,), dtype))
                  if (withbn and middle) else None)
    key, k2 = jax.random.split(key)
    pc_w = jax.random.normal(k2, (npc, npix), dtype) / np.sqrt(npc)
    pc_b = jnp.zeros((npix,), dtype)
    if mean is None:
        mean = jnp.zeros((ndim,), dtype)
    if std is None:
        std = jnp.ones((ndim,), dtype)
    if hull_eqs is None:
        # degenerate: everything counts as inside
        hull_eqs = (jnp.zeros((1, 3), dtype).at[0, 2].set(-1.0),
                    jnp.zeros((1, 3), dtype).at[0, 2].set(-1.0))
    return NNState(tuple(weights), tuple(bn), pc_w, pc_b,
                   jnp.asarray(mean, dtype), jnp.asarray(std, dtype),
                   tuple(jnp.asarray(e, dtype) for e in hull_eqs),
                   nonlinearity)


# ------------------- checkpoint (de)serialization -------------------

def state_to_dict(state: NNState):
    """Versioned, pickle-free checkpoint payload."""
    d = dict(checkpoint_magic=CHECKPOINT_MAGIC,
             checkpoint_version=CHECKPOINT_VERSION,
             nn_arch_version=ARCHITECTURE_VERSION,
             nonlinearity=state.nonlinearity,
             nlayers=len(state.weights) - 2,
             pc_w=np.asarray(state.pc_w), pc_b=np.asarray(state.pc_b),
             mean=np.asarray(state.mean), std=np.asarray(state.std),
             hull_eq_0=np.asarray(state.hull_eqs[0]),
             hull_eq_1=np.asarray(state.hull_eqs[1]))
    for i, ((w, b), bn) in enumerate(zip(state.weights, state.bn)):
        d[f'w_{i}'] = np.asarray(w)
        d[f'b_{i}'] = np.asarray(b)
        if bn is not None:
            d[f'bn_scale_{i}'] = np.asarray(bn[0])
            d[f'bn_shift_{i}'] = np.asarray(bn[1])
    return d


def state_from_dict(d, dtype=None):
    if d.get('checkpoint_magic') != CHECKPOINT_MAGIC:
        raise RuntimeError('Invalid NN checkpoint magic')
    if d.get('checkpoint_version') != CHECKPOINT_VERSION:
        raise RuntimeError('Unsupported NN checkpoint version')
    if d.get('nn_arch_version') != ARCHITECTURE_VERSION:
        raise RuntimeError('NN architecture version mismatch')
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    to = lambda x: jnp.asarray(x, dtype)
    weights = []
    bn = []
    i = 0
    while f'w_{i}' in d:
        weights.append((to(d[f'w_{i}']), to(d[f'b_{i}'])))
        if f'bn_scale_{i}' in d:
            bn.append((to(d[f'bn_scale_{i}']), to(d[f'bn_shift_{i}'])))
        else:
            bn.append(None)
        i += 1
    return NNState(tuple(weights), tuple(bn), to(d['pc_w']), to(d['pc_b']),
                   to(d['mean']), to(d['std']),
                   (to(d['hull_eq_0']), to(d['hull_eq_1'])),
                   str(d['nonlinearity']))
