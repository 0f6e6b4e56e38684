"""Tests of the FFT cross-correlation initializer against the
pipeline-built CCF template bank, including a golden comparison of
the batched device CCF math against a direct numpy implementation."""
import numpy as np
import pytest

from conftest import SETUP_NAME
from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit import ccf as ccf_mod
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.pipeline import make_ccf
from rvspecfit_tpu.utils import freeze


def _config(lib):
    return freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                       max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                       second_minimizer=False, template_lib=lib))


def _observed(v0, seed=12, snr=150.0):
    wres = 5000.0 / 1000.0 / 2.35
    lam, spec, espec = simulation.observed_spectrum(
        v0, 5800.0, 2.75, -0.6667, 0.5, npix=800, lam0=4650.0,
        lam1=5350.0, wresol=wres, snr=snr, seed=seed)
    return SpecData(SETUP_NAME, lam, spec, espec)


def test_ccf_recovers_velocity(pipeline_library):
    config = _config(pipeline_library)
    v0 = -284.0
    res = ccf_mod.fit(_observed(v0), config)
    assert abs(res['best_vel'] - v0) < 10
    assert set(res['best_par']) == {'teff', 'logg', 'feh', 'alpha'}
    # the best template should be hot-ish like the injected star
    assert 4000 <= res['best_par']['teff'] <= 10000
    assert res['best_model'][SETUP_NAME].shape == res['proc_spec'][
        SETUP_NAME].shape


def test_ccf_matches_numpy_chain(pipeline_library):
    """Golden: device batched CCF chi2 == direct numpy correlation."""
    config = _config(pipeline_library)
    sd = _observed(57.0, seed=3)
    tfft, t2fft, mods, info = ccf_mod.get_ccf_info(SETUP_NAME, config)
    ccfconf = info['ccfconf']
    proc_spec, proc_ivar = make_ccf.preprocess_data(
        sd.lam, sd.spec, sd.espec, badmask=sd.badmask, ccfconf=ccfconf)
    sf = np.fft.rfft(proc_spec * proc_ivar)
    ivf = np.fft.rfft(proc_ivar)

    res = ccf_mod.fit(sd, config)
    # recompute chi2 directly in numpy: the correlation evaluated at
    # the (fractional) lags of the velocity grid by explicit
    # trigonometric sums over frequency (independent of the device
    # matmul kernel and of jnp)
    tf = np.asarray(tfft[0]) + 1j * np.asarray(tfft[1])
    t2 = np.asarray(t2fft[0]) + 1j * np.asarray(t2fft[1])
    npoints = int(ccfconf['npoints'])
    nf = npoints // 2 + 1
    step = (np.exp((ccfconf['logl1'] - ccfconf['logl0']) / npoints)
            - 1) * 3e5
    lags = -np.asarray(res['vel_grid']) / step
    ang = (2.0 * np.pi / npoints) * np.outer(np.arange(nf), lags)
    wk = np.full(nf, 2.0)
    wk[0] = 1.0
    if npoints % 2 == 0:
        wk[-1] = 1.0
    cosm = wk[:, None] * np.cos(ang) / npoints
    sinm = wk[:, None] * np.sin(ang) / npoints
    p0 = tf * sf.conj()[None, :]
    p1 = t2 * ivf.conj()[None, :]
    c0 = p0.real @ cosm - p0.imag @ sinm
    c1 = p1.real @ cosm - p1.imag @ sinm
    total = -2 * c0 + c1 + (proc_spec**2 * proc_ivar).sum()
    best_id = int(np.argmin(total.min(axis=1)))
    np.testing.assert_allclose(total[best_id],
                               res['best_ccf'], rtol=2e-4, atol=2e-2)


def test_fit_batch_matches_per_fiber(pipeline_library):
    """The fiber-batched device CCF agrees with the per-object path
    fiber by fiber (same winning template, same refined velocity)."""
    config = _config(pipeline_library)
    v0s = [-284.0, 57.0, 310.0, -120.0, 5.0]
    sds = [_observed(v, seed=20 + i) for i, v in enumerate(v0s)]

    fluxes = np.stack([sd.spec for sd in sds])
    especs = np.stack([sd.espec for sd in sds])
    badmask = np.stack([sd.badmask for sd in sds])
    res_b = ccf_mod.fit_batch(
        [(SETUP_NAME, sds[0].lam, fluxes, especs, badmask)], config,
        microbatch=3)

    assert res_b['best_params'].shape == (len(sds), 4)
    for i, sd in enumerate(sds):
        res1 = ccf_mod.fit(sd, config)
        pars1 = np.array([res1['best_par'][p]
                          for p in res_b['parnames']])
        np.testing.assert_allclose(res_b['best_params'][i], pars1,
                                   rtol=1e-10)
        np.testing.assert_allclose(res_b['best_vel'][i],
                                   res1['best_vel'], atol=1e-6)
        np.testing.assert_allclose(
            res_b['best_chi'][i],
            np.min(res1['best_ccf']), rtol=1e-6)
        # the CCF is an initial guess: coarse template bank + 5 km/s
        # grid; parity with the per-fiber path is the strict check
        assert abs(res_b['best_vel'][i] - v0s[i]) < 20


@pytest.mark.slow
def test_ccf_feeds_process(pipeline_library):
    """CCF guess -> vel_fit.process: the reference two-stage flow."""
    from rvspecfit_tpu.fit import vel_fit
    config = _config(pipeline_library)
    v0 = 310.0
    sd = _observed(v0, seed=8)
    guess = ccf_mod.fit(sd, config)
    p0 = dict(guess['best_par'])
    res = vel_fit.process([sd], p0, config=config, options={'npoly': 10})
    assert abs(res['vel'] - v0) < max(10, 3 * res['vel_err'])


def test_dft_lag_evaluation_matches_irfft():
    """_corr_at_lags at INTEGER lags must equal np.fft.irfft exactly
    (the DFT matrices fold in the irfft normalization and Hermitian
    doubling); fractional lags are band-limited interpolation."""
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    npoints = 256
    x = rng.normal(size=(2, npoints))
    y = rng.normal(size=npoints)
    xf = np.fft.rfft(x, axis=1)
    yf = np.fft.rfft(y)
    want = np.fft.irfft(xf * np.conj(yf)[None, :], axis=1)  # (2, N)

    ccfconf = dict(npoints=npoints, logl0=0.0, logl1=0.1)
    step = (np.exp((0.1 - 0.0) / npoints) - 1) * 3e5
    # integer lags 0..9 and their wrapped negatives
    lags = np.array([0, 1, 2, 5, 9, -1, -4])
    vel_grid = -lags * step
    ecos, esin = ccf_mod._dft_mats(ccfconf, vel_grid)
    pack = lambda c: jnp.asarray(np.stack([c.real, c.imag]))
    got = np.asarray(ccf_mod._corr_at_lags(
        pack(xf), pack(np.conj(yf))[:, None, :], ecos, esin))[0]
    for j, lag in enumerate(lags):
        np.testing.assert_allclose(got[:, j], want[:, lag % npoints],
                                   rtol=1e-5, atol=1e-5)
