"""End-to-end ML fit on synthetic spectra with injected RVs.

The acceptance gate mirrors the reference (tests/test_fit_fake.py:48):
|v_fit - v_true| < max(10 km/s, 3 sigma_v).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import synth
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.interp.api import TemplateModel
from rvspecfit_tpu.interp.grid import GridInterpState
from rvspecfit_tpu.ops.spline import SplineGeometry
from rvspecfit_tpu.utils import freeze


CONFIG = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=False, template_lib=''))


@pytest.fixture(scope='module')
def template_model():
    lam, uvecs, idgrid, vecs, specs, parnames = synth.make_template_grid(
        6, 6, 6, 4, npix=2048)
    state = GridInterpState.build(uvecs, idgrid, vecs, specs, log_spec=True)
    geom = SplineGeometry.from_knots(lam, log_step=True)
    return TemplateModel(kind='grid', state=state, geom=geom,
                         parnames=parnames, log_ids=(0,))


def test_fit_fake(template_model):
    rng = np.random.RandomState(44)
    v0 = float(rng.normal(0, 100))
    truth = dict(teff=5400.0, logg=2.2, feh=-0.8, alpha=0.25)
    lam, spec, espec = synth.observed_spectrum(
        v0, truth['teff'], truth['logg'], truth['feh'], truth['alpha'],
        npix=800, snr=1000.0, seed=11)
    sd = SpecData('config1', lam, spec, espec)

    paramDict0 = dict(teff=5000.0, logg=2.0, feh=0.0, alpha=0.2, vsini=0.1)
    res = vel_fit.process([sd], paramDict0, fixParam=[],
                          options={'npoly': 15}, config=CONFIG,
                          templates={'config1': template_model})
    assert abs(res['vel'] - v0) < max(10, 3 * res['vel_err'])
    assert res['vel_err'] < 10
    # parameters should be in the right region
    assert abs(res['param']['teff'] - truth['teff']) < 500
    assert abs(res['param']['logg'] - truth['logg']) < 1.0
    assert np.isfinite(list(res['param_err'].values())).all()
    assert res['chisq_array'][0] / res['npix_array'][0] < 1.5
    assert len(res['yfit']) == 1


def test_fit_fixed_vsini_and_priors(template_model):
    v0 = 57.0
    lam, spec, espec = synth.observed_spectrum(
        v0, 6200.0, 3.4, -0.4, 0.5, npix=700, snr=300.0, seed=3)
    sd = SpecData('config1', lam, spec, espec)
    paramDict0 = dict(teff=6000.0, logg=3.0, feh=-0.5, alpha=0.5,
                      vsini=1.0)
    res = vel_fit.process(
        [sd], paramDict0, fixParam=['vsini', 'alpha'],
        options={'npoly': 10}, config=CONFIG,
        templates={'config1': template_model},
        priors={'feh': (-0.4, 0.2)})
    assert abs(res['vel'] - v0) < max(10, 3 * res['vel_err'])
    assert res['param']['alpha'] == 0.5          # fixed
    assert 'vsini' not in res                    # not fitted
    assert abs(res['param']['feh'] + 0.4) < 0.5  # prior pulls


def test_fit_with_second_minimizer(template_model):
    v0 = -210.0
    lam, spec, espec = synth.observed_spectrum(
        v0, 5100.0, 2.8, -1.2, 0.3, npix=700, snr=300.0, seed=9)
    sd = SpecData('config1', lam, spec, espec)
    config = CONFIG.copy(second_minimizer=True)
    paramDict0 = dict(teff=5000.0, logg=2.5, feh=-1.0, alpha=0.3)
    res = vel_fit.process([sd], paramDict0, config=config,
                          options={'npoly': 10},
                          templates={'config1': template_model})
    assert abs(res['vel'] - v0) < max(10, 3 * res['vel_err'])


def test_firstguess(template_model):
    v0 = 300.0
    lam, spec, espec = synth.observed_spectrum(
        v0, 8000.0, 4.0, -1.0, 0.0, npix=700, snr=100.0, seed=21)
    sd = SpecData('config1', lam, spec, espec)
    guess = vel_fit.firstguess([sd], config=CONFIG,
                               options={'npoly': 10},
                               vsinigrid=(None,),
                               templates={'config1': template_model})
    assert abs(guess['teff'] - 8000) < 2500
