"""Sharded execution of the batched fitter on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.parallel import mesh as pmesh
from rvspecfit_tpu.utils import freeze

CONFIG = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=False, template_lib=''))


def test_sharded_chisq_matches_unsharded():
    assert len(jax.devices()) == 8
    tm = simulation.build_template_model(4, 4, 4, 3, npix=1024)
    arms_data, truth = simulation.make_exposure(16, npix_arm=300, seed=1)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}

    bf = BatchedFitter(arms, templates, CONFIG, options={'npoly': 6})
    par = np.tile([6000.0, 3.0, -1.0, 0.5], (16, 4, 1))
    vels = np.tile(np.linspace(-300, 300, 4), (16, 1))
    ref = np.asarray(bf.chisq(jnp.asarray(vels), jnp.asarray(par)))

    bf2 = BatchedFitter(arms, templates, CONFIG, options={'npoly': 6})
    m = pmesh.make_mesh()
    pmesh.shard_fitter(bf2, m)
    v_s, p_s, _ = pmesh.shard_trials(bf2, vels, par)
    got = np.asarray(bf2._chisq_fibers(bf2.arms, bf2.templates, v_s,
                                       p_s, jnp.zeros_like(v_s)))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_sharded_neldermead_matches_unsharded():
    """The full batched NM (straggler compaction, device gathers)
    produces identical optima when the fitter is laid out over the
    device mesh."""
    from rvspecfit_tpu.fit import vel_fit

    tm = simulation.build_template_model(4, 4, 4, 3, npix=1024)
    arms_data, truth = simulation.make_exposure(8, npix_arm=300,
                                                snr=100, seed=5)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    templates = {n: tm for n in arms_data}
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    x0 = np.concatenate(
        [truth['vel'][:, None] + 15.0,
         np.tile([6000.0, 3.0, -1.0, 0.5], (8, 1))], axis=1)

    bf = BatchedFitter(arms, templates, CONFIG, options={'npoly': 6})
    ref = bf.run_neldermead(mapper, truth['vel'], x0=x0, nm_chunk=32,
                            maxiter=256)

    bf2 = BatchedFitter(arms, templates, CONFIG, options={'npoly': 6})
    pmesh.shard_fitter(bf2, pmesh.make_mesh())
    got = bf2.run_neldermead(mapper, truth['vel'], x0=x0, nm_chunk=32,
                             maxiter=256)
    np.testing.assert_allclose(got['x'], ref['x'], rtol=1e-8)
    np.testing.assert_array_equal(got['converged'], ref['converged'])


def test_sharded_scan_and_refine():
    tm = simulation.build_template_model(4, 4, 4, 3, npix=1024)
    arms_data, truth = simulation.make_exposure(8, npix_arm=300, snr=100,
                                                seed=3)
    arms = [BatchArm(n, lam, fl, iv)
            for n, (lam, fl, iv) in arms_data.items()]
    bf = BatchedFitter(arms, {n: tm for n in arms_data}, CONFIG,
                       options={'npoly': 6})
    pmesh.shard_fitter(bf, pmesh.make_mesh())
    scan = bf.scan_velocities(np.arange(-1000, 1000, 5.0),
                              np.tile([6000.0, 3.0, -1.0, 0.5], (8, 1)))
    # even with fixed wrong params, the velocity should be within the
    # scan error of the injected one for most fibers
    ok = np.abs(scan['best_vel'] - truth['vel']) < 50
    assert ok.sum() >= 6
