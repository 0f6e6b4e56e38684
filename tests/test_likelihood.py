"""Golden test of the fused likelihood chain vs an independent
numpy/scipy implementation of the reference math:

grid interpolation -> natural-spline Doppler resampling ->
(optional banded resolution) -> continuum-marginalized chi-square ->
outside penalty.
"""
import itertools

import numpy as np
import scipy.interpolate
import jax.numpy as jnp

import synth
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.fit.likelihood import FusedChisq, get_chisq_continuum
from rvspecfit_tpu.fit.find_best import find_best
from rvspecfit_tpu.interp.api import TemplateModel
from rvspecfit_tpu.interp.grid import GridInterpState
from rvspecfit_tpu.ops.spline import SplineGeometry
from rvspecfit_tpu.ops import basis as basis_mod

C_KMS = 299792.458


def _build_template_model(nt=5, nl=5, nf=5, na=3, npix=2048):
    lam, uvecs, idgrid, vecs, specs, parnames = synth.make_template_grid(
        nt, nl, nf, na, npix=npix)
    state = GridInterpState.build(uvecs, idgrid, vecs, specs, log_spec=True)
    geom = SplineGeometry.from_knots(lam, log_step=True)
    return TemplateModel(kind='grid', state=state, geom=geom,
                         parnames=parnames, log_ids=(0,)), lam, vecs, specs


def _numpy_chisq(lam_t, templ_lin, sd, vel, npoly, outside, badchi):
    """Reference-math chain in numpy for one trial."""
    spl = scipy.interpolate.CubicSpline(lam_t, templ_lin, bc_type='natural')
    beta = vel / C_KMS
    ev = spl(sd.lam * np.sqrt((1 - beta) / (1 + beta)))
    polys = basis_mod.continuum_basis(sd.lam, npoly, rbf=True)
    d = sd.spec / sd.espec
    st = polys * (ev / sd.espec)[None, :]
    v = st @ d
    minv = st @ st.T
    u, s, vt = np.linalg.svd(minv)
    a = vt.T @ ((1.0 / s) * (u.T @ v))
    chi = (np.log(s).sum() + 2 * np.log(sd.espec).sum()
           + ((d - a @ st)**2).sum())
    return chi + outside * badchi


def test_fused_matches_numpy_chain():
    tm, lam_t, vecs, specs = _build_template_model()
    config = dict(min_vel=-1000, max_vel=1000, max_vsini=500)

    lam, spec, espec = synth.observed_spectrum(
        33.0, 5500.0, 3.1, -0.7, 0.3, snr=50.0, seed=2)
    sd = SpecData('arm1', lam, spec, espec)
    fused = FusedChisq([sd], {'arm1': tm}, config, options={'npoly': 8})

    # trials: on-node params (interp == stored spectrum) so the numpy
    # chain can use the exact template, various velocities
    node_ids = [3, 100, 217]
    vels = [-300.0, 33.0, 450.0]
    pars, tmps = [], []
    for nid in node_ids:
        lt, g, f, a = vecs[:, nid]
        pars.append([10**lt, g, f, a])
        tmps.append(np.exp(specs[nid]))
    got = np.asarray(fused.chisq_trials(
        jnp.asarray(vels), jnp.asarray(np.array(pars))))
    badchi = 10 * len(lam)
    for i in range(3):
        ref = _numpy_chisq(lam_t, tmps[i], sd, vels[i], 8, 0.0, badchi)
        np.testing.assert_allclose(got[i], ref, rtol=1e-6,
                                   err_msg=f'trial {i}')


def test_fast_interp_mode():
    """fast_interp (nearest-pixel Doppler eval; reference
    spec_fit.py:913-918) matches a direct numpy nearest-gather chain
    and approximates the spline path."""
    tm, lam_t, vecs, specs = _build_template_model(npix=4096)
    config = dict(min_vel=-1000, max_vel=1000, max_vsini=500)
    lam, spec, espec = synth.observed_spectrum(
        70.0, 5500.0, 3.1, -0.7, 0.3, snr=50.0, seed=9)
    sd = SpecData('arm1', lam, spec, espec)
    exact = FusedChisq([sd], {'arm1': tm}, config, options={'npoly': 8})
    fast = FusedChisq([sd], {'arm1': tm}, config,
                      options={'npoly': 8, 'fast_interp': True})

    nid = 100
    lt, g, f, a = vecs[:, nid]
    par = [10**lt, g, f, a]
    vel = 70.0
    chi_exact = float(exact.chisq_one(vel, par))
    chi_fast = float(fast.chisq_one(vel, par))

    # numpy nearest-gather chain
    templ = np.exp(specs[nid])
    beta = vel / C_KMS
    q = sd.lam * np.sqrt((1 - beta) / (1 + beta))
    u = (np.log(q) - np.log(lam_t[0])) / np.log(lam_t[1] / lam_t[0])
    ev = templ[np.clip(np.round(u).astype(int), 0, len(templ) - 1)]
    polys = basis_mod.continuum_basis(sd.lam, 8, rbf=True)
    d = sd.spec / sd.espec
    st = polys * (ev / sd.espec)[None, :]
    v = st @ d
    minv = st @ st.T
    uu, s, vt = np.linalg.svd(minv)
    aa = vt.T @ ((1.0 / s) * (uu.T @ v))
    ref = (np.log(s).sum() + 2 * np.log(sd.espec).sum()
           + ((d - aa @ st)**2).sum())
    np.testing.assert_allclose(chi_fast, ref, rtol=1e-6)
    # nearest-pixel is an approximation of the spline path
    assert abs(chi_fast - chi_exact) / chi_exact < 0.3


def test_outside_penalty_applied():
    tm, lam_t, vecs, specs = _build_template_model()
    config = dict(min_vel=-1000, max_vel=1000, max_vsini=500)
    lam, spec, espec = synth.observed_spectrum(0.0, 5500.0, 3.0, -0.5, 0.2)
    sd = SpecData('arm1', lam, spec, espec)
    fused = FusedChisq([sd], {'arm1': tm}, config, options={'npoly': 8})

    inside = fused.chisq_one(0.0, [5500.0, 3.0, -0.5, 0.2])
    outside = fused.chisq_one(0.0, [5500.0, 9.5, -0.5, 0.2])  # logg off-grid
    assert outside > inside
    # the penalty must scale with the scaled nearest distance
    farther = fused.chisq_one(0.0, [5500.0, 20.0, -0.5, 0.2])
    assert farther > outside

    nopen = FusedChisq([sd], {'arm1': tm}, config, options={'npoly': 8},
                       outside_penalty=False)
    assert nopen.chisq_one(0.0, [5500.0, 9.5, -0.5, 0.2]) < outside


def test_find_best_recovers_velocity_and_params():
    tm, _, vecs, _ = _build_template_model()
    config = dict(min_vel=-1000, max_vel=1000, max_vsini=500)
    v0 = -137.0
    truth = (5500.0, 2.75, -0.5, 1.0 / 3.0)
    lam, spec, espec = synth.observed_spectrum(v0, *truth, snr=200.0, seed=5)
    sd = SpecData('arm1', lam, spec, espec)
    fused = FusedChisq([sd], {'arm1': tm}, config, options={'npoly': 8})

    vel_grid = np.arange(-1000.0, 1000.0, 5.0)
    # small parameter grid around & away from the truth
    params = [[5500.0, 2.75, -0.5, 1.0 / 3.0],
              [8500.0, 2.75, -0.5, 1.0 / 3.0],
              [5500.0, 5.0, -2.0, 0.0]]
    res = find_best(fused, vel_grid, params)
    assert abs(res['best_vel'] - v0) < 5.0
    np.testing.assert_allclose(res['best_param'], params[0])
    assert res['vel_err'] < 5.0
    assert np.isfinite(res['probs']).all()


def test_full_output_and_continuum():
    tm, _, vecs, _ = _build_template_model()
    config = dict(min_vel=-1000, max_vel=1000, max_vsini=500)
    truth = (5500.0, 2.75, -0.5, 1.0 / 3.0)
    lam, spec, espec = synth.observed_spectrum(20.0, *truth, snr=100.0,
                                               seed=7)
    sd = SpecData('arm1', lam, spec, espec)
    fused = FusedChisq([sd], {'arm1': tm}, config, options={'npoly': 8})
    out = fused.full_output(20.0, list(truth))
    assert len(out['models']) == 1
    assert out['npix_array'] == [len(lam)]
    # model must fit well: reduced chi2 near 1
    assert 0.7 < out['red_chisq_array'][0] < 1.3
    assert abs(out['chisq'] + 2 * out['logl']) < 1e-6

    cont = get_chisq_continuum([sd], options={'npoly': 8})
    # continuum-only fit must be much worse than the full model
    assert cont['chisq_array'][0] > 3 * out['chisq_array'][0]
