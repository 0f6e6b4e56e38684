"""NN interpolator training tests (small, CPU)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
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


@pytest.mark.slow
def test_cli_train_load_fit(pipeline_library, tmp_path):
    """specs h5 -> CLI train -> library load -> vel_fit.process
    recovers an injected RV through the NN interpolator (the
    reference's NN test flow, tests/test_fit_nn.py:18-75)."""
    import shutil
    from conftest import SETUP_NAME
    from rvspecfit_tpu.pipeline import library
    from rvspecfit_tpu.fit.spec_data import SpecData
    from rvspecfit_tpu.fit import vel_fit
    from rvspecfit_tpu.utils import freeze

    libdir = tmp_path / 'nn_lib'
    libdir.mkdir()
    shutil.copy(
        os.path.join(pipeline_library, f'specs_{SETUP_NAME}.h5'),
        libdir / f'specs_{SETUP_NAME}.h5')
    train_nn.main(['--setup', SETUP_NAME, '--dir', str(libdir),
                   '--width', '96', '--nlayers', '2', '--npc', '32',
                   '--batch', '128', '--num_epochs', '400',
                   '--learning_rate0', '3e-3', '--pca_init', '--cpu'])
    for pat in ('nnstate_%s.h5', 'interp_%s.h5', 'pred_%s.h5'):
        assert (libdir / (pat % SETUP_NAME)).exists(), pat

    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=False,
                         template_lib=str(libdir)))
    tm = library.load_template_model(SETUP_NAME, config)
    assert tm.kind == 'nn'
    assert tm.parnames == ('teff', 'logg', 'feh', 'alpha')

    v0 = 87.0
    wres = 5000.0 / 1000.0 / 2.35
    lam, spec, espec = simulation.observed_spectrum(
        v0, 5500.0, 2.75, -0.5, 0.5, npix=800, lam0=4650.0, lam1=5350.0,
        wresol=wres, snr=300.0, seed=11)
    sd = SpecData(SETUP_NAME, lam, spec, espec)
    res = vel_fit.process(
        [sd], dict(teff=5000.0, logg=3.0, feh=-1.0, alpha=0.5),
        config=config, options={'npoly': 10})
    assert abs(res['vel'] - v0) < max(15, 5 * res['vel_err'])


def test_sharded_training_step():
    vecs, specs = _training_set(npix=64)
    devices = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ('data', 'model'))
    state, hist = train_nn.train_interpolator(
        vecs, specs, width=32, nlayers=2, npc=8, num_epochs=5,
        batch_size=64, mesh=mesh, seed=3, pca_init=False)
    assert np.isfinite(hist['loss']).all()
    assert hist['loss'][-1] <= hist['loss'][0]
