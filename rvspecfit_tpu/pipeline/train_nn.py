"""NN template-interpolator training (optax).

Equivalent of the reference torch trainer
(reference: py/rvspecfit/nn/train_interpolator.py:68-403), rebuilt on
optax with TPU-mesh scale-out:

* inputs: mapped template parameters (standardized) and log-spectra
  (standardized targets); loss is L1 normalized by the global target
  spread (train_interpolator.py:284-286);
* Adam with a reduce-on-plateau schedule (factor 0.5, patience 20),
  stopping at min LR or the epoch limit (train_interpolator.py:42-47);
* optional PCA initialization of the bottleneck output layer
  (train_interpolator.py:244-258);
* periodic checkpointing with resume;
* at the end the target standardization is folded into the output
  layer so inference is raw (train_interpolator.py:361-363);
* scale-out: parameters can be laid out over a ('data', 'model') mesh
  — batch sharded over 'data', hidden width over 'model' (tensor
  parallel) — and the jitted train step runs SPMD with XLA-inserted
  collectives.
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import shlex
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rvspecfit_tpu.interp import nn as nn_mod
from rvspecfit_tpu.interp.mapper import LogMapper
from rvspecfit_tpu import serializer
from rvspecfit_tpu import __version__ as git_rev


def trainable_params(state: nn_mod.NNState):
    return dict(weights=state.weights, bn=state.bn, pc_w=state.pc_w,
                pc_b=state.pc_b)


def with_params(state: nn_mod.NNState, params):
    return dataclasses.replace(state, weights=tuple(
        tuple(w) for w in params['weights']),
        bn=tuple(params['bn']), pc_w=params['pc_w'], pc_b=params['pc_b'])


def make_loss_fn(static_state, spread0):
    def loss_fn(params, x, y):
        state = with_params(static_state, params)
        pred = nn_mod.forward(state, x)
        return jnp.mean(jnp.abs(pred - y)) / spread0
    return loss_fn


def make_train_step(static_state, spread0, optimizer):
    loss_fn = make_loss_fn(static_state, spread0)

    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return train_step


def shard_training(params, mesh, data_axis='data', model_axis='model'):
    """Lay MLP parameters over a (data, model) mesh: hidden widths over
    the model axis (tensor parallel), everything else replicated.
    Returns sharded params and the sharding for input batches."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    colw = NamedSharding(mesh, P(None, model_axis))
    roww = NamedSharding(mesh, P(model_axis))

    weights = []
    nlay = len(params['weights'])
    for i, (w, b) in enumerate(params['weights']):
        last = i == nlay - 1
        # shard the output-feature axis of every hidden layer; the
        # bottleneck (npc) layer keeps its small output replicated
        if not last:
            weights.append((jax.device_put(w, colw),
                            jax.device_put(b, roww)))
        else:
            weights.append((jax.device_put(w, NamedSharding(
                mesh, P(model_axis, None))), jax.device_put(b, repl)))
    bn = []
    for bnp in params['bn']:
        bn.append(None if bnp is None else
                  (jax.device_put(bnp[0], roww),
                   jax.device_put(bnp[1], roww)))
    out = dict(weights=tuple(weights), bn=tuple(bn),
               pc_w=jax.device_put(params['pc_w'], repl),
               pc_b=jax.device_put(params['pc_b'], repl))
    batch_sharding = NamedSharding(mesh, P(data_axis, None))
    return out, batch_sharding


def pca_init_pc_layer(targets_std, npc):
    """PCA initialization of the output layer from standardized
    targets (nspec, npix): returns (pc_w (npc, npix), pc_b (npix,))."""
    try:
        from sklearn.decomposition import PCA
    except ImportError:
        logging.warning('sklearn unavailable; skipping PCA init')
        return None
    pca = PCA(n_components=npc)
    pca.fit(np.asarray(targets_std))
    return pca.components_, pca.mean_


def fold_output_standardization(state: nn_mod.NNState, t_mean, t_std):
    """Fold target standardization y_raw = y*t_std + t_mean into the
    output layer so inference returns raw log-spectra."""
    pc_w = state.pc_w * jnp.asarray(t_std)[None, :]
    pc_b = state.pc_b * jnp.asarray(t_std) + jnp.asarray(t_mean)
    return dataclasses.replace(state, pc_w=pc_w, pc_b=pc_b)


def train_interpolator(vecs_mapped, log_specs, width=256, nlayers=3,
                       npc=50, lr0=1e-2, min_lr=1e-5, plateau_patience=20,
                       plateau_factor=0.5, num_epochs=600, batch_size=512,
                       pca_init=True, withbn=False, seed=0,
                       checkpoint_path=None, checkpoint_every=32,
                       resume=False, mesh=None, validation_frac=0.0,
                       log_every=50):
    """Train an NN interpolator on a prepared template set.

    Parameters
    ----------
    vecs_mapped : (nspec, ndim) mapped (e.g. log10-teff) parameters
    log_specs : (nspec, npix) log template spectra
    mesh : optional jax Mesh with ('data','model') axes for SPMD

    Returns
    -------
    (NNState with output standardization folded in, history dict)
    """
    vecs_mapped = np.asarray(vecs_mapped, np.float64)
    log_specs = np.asarray(log_specs, np.float64)
    nspec, ndim = vecs_mapped.shape
    npix = log_specs.shape[1]

    p_mean = vecs_mapped.mean(axis=0)
    p_std = vecs_mapped.std(axis=0)
    p_std[p_std == 0] = 1.0
    t_mean = log_specs.mean(axis=0)
    t_std = log_specs.std(axis=0)
    t_std[t_std == 0] = 1.0
    targets = (log_specs - t_mean) / t_std
    spread0 = float(targets.std())
    if spread0 == 0:
        spread0 = 1.0

    rng = np.random.RandomState(seed)
    nval = int(nspec * validation_frac)
    perm = rng.permutation(nspec)
    val_idx, tr_idx = perm[:nval], perm[nval:]

    hull_eqs = None
    if ndim >= 4:
        try:
            hull_eqs = nn_mod.hull_equations(vecs_mapped)
        except Exception as exc:
            logging.warning('hull construction failed: %s', exc)

    state = nn_mod.init_state(jax.random.PRNGKey(seed), ndim, width,
                              nlayers, npc, npix, mean=p_mean, std=p_std,
                              hull_eqs=hull_eqs, withbn=withbn)
    params = trainable_params(state)
    if pca_init:
        pc = pca_init_pc_layer(targets[tr_idx], npc)
        if pc is not None:
            params = dict(params, pc_w=jnp.asarray(pc[0]),
                          pc_b=jnp.asarray(pc[1]))

    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=lr0)
    opt_state = optimizer.init(params)

    start_epoch = 0
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        ck = serializer.load_dict_from_hdf5(checkpoint_path)
        tmp_state = nn_mod.state_from_dict(ck['state'])
        params = trainable_params(tmp_state)
        start_epoch = int(ck['epoch'])
        logging.info('resumed NN training at epoch %d', start_epoch)

    train_step = make_train_step(state, spread0, optimizer)
    batch_sharding = None
    if mesh is not None:
        params, batch_sharding = shard_training(params, mesh)
    train_step = jax.jit(train_step)
    if mesh is not None:
        opt_state = optimizer.init(params)

    xs = jnp.asarray(vecs_mapped)
    ys = jnp.asarray(targets)
    history = dict(loss=[], lr=[])
    ntr = len(tr_idx)
    bs = min(batch_size, ntr)
    # host-side reduce-on-plateau (factor/patience as in the reference
    # ReduceLROnPlateau usage, train_interpolator.py:42-47)
    cur_lr = lr0
    best_loss = np.inf
    plateau_count = 0
    for epoch in range(start_epoch, num_epochs):
        order = rng.permutation(ntr)
        ep_loss = 0.0
        nb = 0
        for i in range(0, max(ntr - bs + 1, 1), bs):
            sel = tr_idx[order[i:i + bs]]
            x, y = xs[sel], ys[sel]
            if batch_sharding is not None:
                x = jax.device_put(x, batch_sharding)
                y = jax.device_put(y, batch_sharding)
            opt_state.hyperparams['learning_rate'] = jnp.asarray(cur_lr)
            params, opt_state, loss = train_step(params, opt_state, x, y)
            ep_loss += float(loss)
            nb += 1
        ep_loss /= max(nb, 1)
        if ep_loss < best_loss * (1 - 1e-4):
            best_loss = ep_loss
            plateau_count = 0
        else:
            plateau_count += 1
            if plateau_count > plateau_patience:
                cur_lr *= plateau_factor
                plateau_count = 0
        history['loss'].append(ep_loss)
        history['lr'].append(cur_lr)
        if epoch % log_every == 0:
            logging.info('epoch %d loss %.5f lr %.2e', epoch, ep_loss,
                         cur_lr)
        if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
            cur = with_params(state, jax.device_get(params))
            serializer.save_dict_to_hdf5(
                checkpoint_path,
                dict(state=nn_mod.state_to_dict(cur), epoch=epoch + 1))
        if cur_lr < min_lr:
            logging.info('stopping: lr below min_lr at epoch %d', epoch)
            break

    final = with_params(state, jax.device_get(params))
    final = fold_output_standardization(final, t_mean, t_std)
    history['t_mean'] = t_mean
    history['t_std'] = t_std
    history['spread0'] = spread0
    return final, history


# --------------------- pipeline CLI + artifacts ---------------------

NN_STATE_NAME = 'nnstate_%s.h5'
NN_TMP_STATE_NAME = 'tmp_nnstate_%s.h5'
NN_PRED_NAME = 'pred_%s.h5'


def execute(setup, directory='./', width=256, nlayers=2, npc=64,
            lr0=1e-3, min_lr=1e-8, batch_size=100, num_epochs=600,
            patience=20, pca_init=False, resume=False, revision='',
            validation_frac=0.0, n_subset_data=None, mask_ids=None,
            cmdline='', seed=22, mesh=None):
    """Train the NN interpolator for one setup and write the library
    artifacts consumed by pipeline.library.load_template_model:

    * ``nnstate_{setup}.h5`` — the versioned NN checkpoint;
    * ``interp_{setup}.h5``  — the generic descriptor (lam, parnames,
      interpolation_type='nn', nn_file pointer);
    * ``pred_{setup}.h5``    — predictions dump for QA.

    Equivalent of the reference trainer's artifact tail
    (reference: py/rvspecfit/nn/train_interpolator.py:361-403).
    """
    from rvspecfit_tpu.pipeline.make_interpol import SPECS_H5_NAME
    from rvspecfit_tpu.pipeline.make_nd import INTERPOL_H5_NAME

    d = serializer.load_dict_from_hdf5(
        os.path.join(directory, SPECS_H5_NAME % setup))
    vec = np.asarray(d['vec'], np.float64)           # (ndim, nspec)
    specs = np.asarray(d['specs'])                   # (nspec, npix)
    lam = np.asarray(d['lam'])
    parnames = [str(p) for p in d['parnames']]
    log_ids = tuple(int(x) for x in d.get('log_ids', (0,)))
    mapper = LogMapper(log_ids)
    vec_mapped = mapper.forward(vec.T)               # (nspec, ndim)
    if not np.isfinite(vec_mapped).all():
        raise RuntimeError('Mapped parameters are not finite')

    train_sel = np.ones(len(specs), dtype=bool)
    if mask_ids:
        train_sel[list(mask_ids)] = False
    if n_subset_data is not None:
        rng = np.random.RandomState(44)
        ids = np.nonzero(train_sel)[0]
        train_sel[:] = False
        train_sel[rng.permutation(ids)[:n_subset_data]] = True
    logging.info('training NN for setup %s on %d/%d templates',
                 setup, train_sel.sum(), len(specs))

    ck_path = os.path.join(directory, NN_TMP_STATE_NAME % setup)
    state, history = train_interpolator(
        vec_mapped[train_sel], specs[train_sel], width=width,
        nlayers=nlayers, npc=npc, lr0=lr0, min_lr=min_lr,
        plateau_patience=patience, num_epochs=num_epochs,
        batch_size=batch_size, pca_init=pca_init, seed=seed,
        checkpoint_path=ck_path, resume=resume, mesh=mesh,
        validation_frac=validation_frac)

    nn_file = NN_STATE_NAME % setup
    serializer.save_dict_to_hdf5(
        os.path.join(directory, nn_file),
        dict(state=nn_mod.state_to_dict(state), git_rev=git_rev,
             revision=revision, cmdline=cmdline))
    if os.path.exists(ck_path):
        os.unlink(ck_path)

    descriptor = dict(
        interpolation_type='nn',
        parnames=parnames,
        lam=lam,
        log_step=bool(d['log_step']),
        log_spec=bool(d.get('log_spec', True)),
        mapper_class='LogMapper',
        log_ids=list(log_ids),
        lognorms=np.asarray(d['lognorms']),
        nn_file=nn_file,
        nn_kwargs=dict(width=width, nlayers=nlayers, npc=npc),
        revision=revision, git_rev=git_rev, cmdline=cmdline)
    serializer.save_dict_to_hdf5(
        os.path.join(directory, INTERPOL_H5_NAME % setup), descriptor)

    # predictions dump for offline QA (training-loss cross-check)
    pred = []
    xs = jnp.asarray(vec_mapped)
    fwd = jax.jit(nn_mod.forward)
    for i in range(0, len(vec_mapped), 4096):
        pred.append(np.asarray(fwd(state, xs[i:i + 4096])))
    pred = np.concatenate(pred)
    serializer.save_dict_to_hdf5(
        os.path.join(directory, NN_PRED_NAME % setup),
        dict(pred=pred, vecs=vec_mapped, dats=specs, vecs_orig=vec.T,
             train_sel=train_sel, final_loss=history['loss'][-1],
             cmdline=cmdline))
    logging.info('wrote NN interpolator artifacts for setup %s '
                 '(final loss %.5f)', setup, history['loss'][-1])
    return state, history


def _parse_ids(s):
    if s is None or s == '':
        return None
    return [int(x) for x in s.split(',')]


def main(args=None):
    """Console entry point ``rvst_train_nn_interpolator``
    (reference: py/rvspecfit/nn/train_interpolator.py:68-403)."""
    if args is None:
        args = sys.argv[1:]
    cmdline = shlex.join(['rvst_train_nn_interpolator'] + list(args))
    parser = argparse.ArgumentParser(
        description='Train the NN template interpolator for one setup')
    parser.add_argument('--setup', type=str, required=True)
    parser.add_argument('--dir', type=str, default='./',
                        help='Directory with specs_{setup}.h5; artifacts '
                        'are written next to it')
    parser.add_argument('--width', type=int, default=256)
    parser.add_argument('--nlayers', type=int, default=2)
    parser.add_argument('--npc', type=int, default=64)
    parser.add_argument('--learning_rate0', type=float, default=1e-3)
    parser.add_argument('--min_learning_rate', type=float, default=1e-8)
    parser.add_argument('--batch', type=int, default=100)
    parser.add_argument('--num_epochs', type=int, default=600)
    parser.add_argument('--patience', type=int, default=20)
    parser.add_argument('--pca_init', action='store_true', default=False)
    parser.add_argument('--resume', action='store_true', default=False)
    parser.add_argument('--cpu', action='store_true', default=False,
                        help='Force the CPU backend')
    parser.add_argument('--validation_fraction', type=float, default=0.0)
    parser.add_argument('--n_subset_data', type=int, default=None)
    parser.add_argument('--mask_ids', type=str, default=None,
                        help='Comma-separated template indices to exclude')
    parser.add_argument('--revision', type=str, default='')
    args = parser.parse_args(args)
    logging.basicConfig(level=logging.INFO)
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    execute(args.setup, directory=args.dir, width=args.width,
            nlayers=args.nlayers, npc=args.npc, lr0=args.learning_rate0,
            min_lr=args.min_learning_rate, batch_size=args.batch,
            num_epochs=args.num_epochs, patience=args.patience,
            pca_init=args.pca_init, resume=args.resume,
            revision=args.revision,
            validation_frac=args.validation_fraction,
            n_subset_data=args.n_subset_data,
            mask_ids=_parse_ids(args.mask_ids), cmdline=cmdline)


if __name__ == '__main__':
    main()
