"""NN interpolator training tests (small, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rvspecfit_tpu import simulation
from rvspecfit_tpu.interp import nn as nn_mod
from rvspecfit_tpu.pipeline import train_nn


def _training_set(npix=120):
    lam, uvecs, idgrid, vecs, specs, parnames = \
        simulation.make_template_grid(5, 5, 4, 3, npix=npix)
    return vecs.T, specs  # (nspec, 4) mapped, (nspec, npix) log


def test_training_reduces_loss_and_predicts(tmp_path):
    vecs, specs = _training_set()
    state, hist = train_nn.train_interpolator(
        vecs, specs, width=64, nlayers=2, npc=16, num_epochs=150,
        batch_size=128, lr0=3e-3, seed=1,
        checkpoint_path=str(tmp_path / 'ck.h5'), checkpoint_every=64)
    assert hist['loss'][-1] < 0.3 * hist['loss'][0]
    # predictions approximate the (log) templates after folding
    pred = np.asarray(nn_mod.forward(state, jnp.asarray(vecs[:16])))
    resid = pred - specs[:16]
    assert np.abs(resid).mean() < 0.1 * np.abs(specs).std() + 0.05

    # interp protocol returns exp() spectra and hull outside flags
    spec, outside = nn_mod.interp_batch(state, jnp.asarray(vecs[:4]))
    assert (np.asarray(spec) > 0).all()
    assert (np.asarray(outside) < 1e-16).all()


def test_resume_from_checkpoint(tmp_path):
    vecs, specs = _training_set(npix=60)
    ck = str(tmp_path / 'ck.h5')
    train_nn.train_interpolator(
        vecs, specs, width=32, nlayers=1, npc=8, num_epochs=64,
        batch_size=128, checkpoint_path=ck, checkpoint_every=32, seed=2)
    state2, hist2 = train_nn.train_interpolator(
        vecs, specs, width=32, nlayers=1, npc=8, num_epochs=80,
        batch_size=128, checkpoint_path=ck, checkpoint_every=32,
        resume=True, seed=2)
    # resumed run trains only the remaining epochs
    assert len(hist2['loss']) <= 80 - 64 + 1


def test_sharded_training_step():
    vecs, specs = _training_set(npix=64)
    devices = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ('data', 'model'))
    state, hist = train_nn.train_interpolator(
        vecs, specs, width=32, nlayers=2, npc=8, num_epochs=5,
        batch_size=64, mesh=mesh, seed=3, pca_init=False)
    assert np.isfinite(hist['loss']).all()
    assert hist['loss'][-1] <= hist['loss'][0]
