"""Tests of the batched multi-fiber fitter vs the single-object path."""
import numpy as np
import jax.numpy as jnp
import pytest

import synth
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.fit.likelihood import FusedChisq
from rvspecfit_tpu.interp.api import TemplateModel
from rvspecfit_tpu.interp.grid import GridInterpState
from rvspecfit_tpu.ops.spline import SplineGeometry
from rvspecfit_tpu.utils import freeze

CONFIG = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=False, template_lib=''))

NFIB = 6


@pytest.fixture(scope='module')
def tm():
    lam, uvecs, idgrid, vecs, specs, parnames = synth.make_template_grid(
        6, 6, 6, 4, npix=2048)
    state = GridInterpState.build(uvecs, idgrid, vecs, specs, log_spec=True)
    geom = SplineGeometry.from_knots(lam, log_step=True)
    return TemplateModel(kind='grid', state=state, geom=geom,
                         parnames=parnames, log_ids=(0,))


@pytest.fixture(scope='module')
def fiber_data():
    rng = np.random.RandomState(7)
    lam = np.linspace(4600, 5400, 700)
    v0s = rng.uniform(-400, 400, NFIB)
    truths = np.column_stack([rng.uniform(4800, 9000, NFIB),
                              rng.uniform(1.0, 4.5, NFIB),
                              rng.uniform(-1.8, -0.2, NFIB),
                              rng.uniform(0.1, 0.9, NFIB)])
    flux = np.zeros((NFIB, len(lam)))
    ivar = np.zeros((NFIB, len(lam)))
    for i in range(NFIB):
        _, spec, espec = synth.observed_spectrum(
            v0s[i], *truths[i], npix=700, snr=300.0, seed=100 + i)
        flux[i] = spec
        ivar[i] = 1.0 / espec**2
    return lam, flux, ivar, v0s, truths


def test_batched_chisq_matches_single(tm, fiber_data):
    lam, flux, ivar, v0s, truths = fiber_data
    arm = BatchArm('config1', lam, flux, ivar)
    bf = BatchedFitter([arm], {'config1': tm}, CONFIG,
                       options={'npoly': 10})
    vels = np.linspace(-500, 500, 9)
    par = np.array([6000.0, 3.0, -1.0, 0.5])
    chis_b = np.asarray(bf.chisq(
        jnp.asarray(np.tile(vels, (NFIB, 1))),
        jnp.asarray(np.tile(par, (NFIB, len(vels), 1)))))
    for i in range(NFIB):
        sd = SpecData('config1', lam, flux[i], 1.0 / np.sqrt(ivar[i]))
        fused = FusedChisq([sd], {'config1': tm}, CONFIG,
                           options={'npoly': 10})
        chis_s = np.asarray(fused.chisq_trials(
            jnp.asarray(vels), jnp.asarray(np.tile(par, (len(vels), 1)))))
        np.testing.assert_allclose(chis_b[i], chis_s, rtol=1e-9,
                                   err_msg=f'fiber {i}')


@pytest.mark.slow
def test_batched_fit_recovers_velocities(tm, fiber_data):
    lam, flux, ivar, v0s, truths = fiber_data
    arm = BatchArm('config1', lam, flux, ivar)
    bf = BatchedFitter([arm], {'config1': tm}, CONFIG,
                       options={'npoly': 10})

    vel_grid = np.arange(-1000.0, 1000.0, 5.0)
    start = np.tile([6000.0, 3.0, -1.0, 0.5], (NFIB, 1))
    scan = bf.scan_velocities(vel_grid, start)

    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    nmres = bf.run_neldermead(mapper, scan['best_vel'])
    vel_b, params_b, vsini_b, _ = mapper.unpack(jnp.asarray(nmres['x']))
    params_b = np.asarray(params_b)

    ref = bf.refine_velocities(np.asarray(vel_b), params_b)
    for i in range(NFIB):
        assert abs(ref['best_vel'][i] - v0s[i]) < \
            max(10, 3 * ref['vel_err'][i]), f'fiber {i}'

    errs, covars, bad = bf.hessian_errors(ref['best_vel'], params_b,
                                          parnames=tm.parnames)
    assert np.isfinite(errs).all()
    assert not bad.any()


def test_badmask_and_nonfinite_handling(tm, fiber_data):
    lam, flux, ivar, v0s, truths = fiber_data
    flux = flux.copy()
    ivar = ivar.copy()
    badmask = np.zeros(flux.shape, bool)
    badmask[:, 100:120] = True
    flux[0, 200:210] = np.nan
    ivar[1, 300:310] = 0.0
    arm = BatchArm('config1', lam, flux, ivar, badmask=badmask)
    bf = BatchedFitter([arm], {'config1': tm}, CONFIG,
                       options={'npoly': 10})
    par = np.array([6000.0, 3.0, -1.0, 0.5])
    chis = np.asarray(bf.chisq(
        jnp.zeros((NFIB, 1)), jnp.asarray(np.tile(par, (NFIB, 1, 1)))))
    assert np.isfinite(chis).all()


@pytest.mark.slow
def test_threaded_warm_then_fit(tm, fiber_data):
    """warm() pre-compiles every pipeline program concurrently and a
    subsequent fit reuses them (no behavior change)."""
    lam, flux, ivar, v0s, truths = fiber_data
    arm = BatchArm('config1', lam, flux, ivar)
    bf = BatchedFitter([arm], {'config1': tm}, CONFIG,
                       options={'npoly': 10})
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    times = bf.warm(mapper, steps=2)
    assert 'wall' in times and times['wall'] >= 0
    assert any(k.startswith('nm_w') for k in times)
    # the warmed programs serve a real fit
    nmres = bf.run_neldermead(mapper, np.asarray(v0s), maxiter=64,
                              maxrestart=1)
    pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'], steps=2)
    assert np.all(pol['fun'] <= nmres['fun'] + 1e-9)


@pytest.mark.slow
def test_polish_freeze_hessian_equivalent_at_optimum(tm, fiber_data,
                                                     monkeypatch):
    """RVST_POLISH_FREEZE_H=1 (Hessian evaluated once, gradient every
    step) must match the full-Newton polish from production starts
    (NM optima) — curvature is stable there and the strict-improvement
    ladder guards against a stale direction.  (From far-off starts the
    frozen Hessian IS worse — the flag is an opt-in for the
    second_minimizer stage only.)"""
    lam, flux, ivar, v0s, truths = fiber_data
    arm = BatchArm('config1', lam, flux, ivar)
    bf = BatchedFitter([arm], {'config1': tm}, CONFIG,
                       options={'npoly': 10})
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    nmres = bf.run_neldermead(mapper, np.asarray(v0s), maxiter=96,
                              maxrestart=1)
    pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'], steps=3)
    monkeypatch.setenv('RVST_POLISH_FREEZE_H', '1')
    bf2 = BatchedFitter([arm], {'config1': tm}, CONFIG,
                        options={'npoly': 10})
    pol_f = bf2.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                           steps=3)
    assert np.all(pol_f['fun'] <= nmres['fun'] + 1e-9)
    np.testing.assert_allclose(pol_f['fun'], pol['fun'], atol=2e-2)


def test_update_arms_reuses_programs(tm, fiber_data):
    """update_arms swaps fiber data without rebuilding programs and
    matches a freshly-built fitter bit-for-bit."""
    lam, flux, ivar, v0s, truths = fiber_data
    arm_a = BatchArm('config1', lam, flux, ivar)
    bf = BatchedFitter([arm_a], {'config1': tm}, CONFIG,
                       options={'npoly': 10})
    vels = np.tile(np.linspace(-500, 500, 9), (NFIB, 1))
    par = np.tile([6000.0, 3.0, -1.0, 0.5], (NFIB, 9, 1))
    np.asarray(bf.chisq(jnp.asarray(vels), jnp.asarray(par)))
    nprog = len(bf._objective_cache)

    # second "file": same grids, different fluxes/errors (rolled)
    flux_b = np.roll(flux, 2, axis=0) * 1.1
    ivar_b = np.roll(ivar, 2, axis=0) * 0.8
    arm_b = BatchArm('config1', lam, flux_b, ivar_b)
    bf.update_arms([arm_b])
    chis_upd = np.asarray(bf.chisq(jnp.asarray(vels), jnp.asarray(par)))
    assert len(bf._objective_cache) == nprog

    bf_fresh = BatchedFitter([arm_b], {'config1': tm}, CONFIG,
                             options={'npoly': 10})
    chis_fresh = np.asarray(bf_fresh.chisq(jnp.asarray(vels),
                                           jnp.asarray(par)))
    np.testing.assert_array_equal(chis_upd, chis_fresh)

    # incompatible data is rejected
    with pytest.raises(ValueError):
        bf.update_arms([BatchArm('config1', lam[:-1], flux[:, :-1],
                                 ivar[:, :-1])])
