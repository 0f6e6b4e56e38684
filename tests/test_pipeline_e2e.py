"""End-to-end offline pipeline test: synthetic FITS grid ->
read_grid -> make_interpol -> make_nd --regulargrid -> make_ccf ->
library load -> full ML fit recovering an injected RV (the
reference's gen_test_templ_grid.sh + test_fit_fake_grid.py flow).
The library itself is built once by the session fixture in conftest.
"""
import os

import numpy as np

from conftest import SETUP_NAME
from rvspecfit_tpu import simulation
from rvspecfit_tpu.pipeline import library
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.utils import freeze
import pytest

pytestmark = pytest.mark.slow


def _config(template_lib):
    return freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                       max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                       second_minimizer=False, template_lib=template_lib))


def test_artifacts_exist(pipeline_library):
    for pat in ('specs_%s.h5', 'interp_%s.h5', 'interpdat_%s.npy',
                'ccf_%s.h5', 'ccfdat_%s.npz', 'ccfmod_%s.npy'):
        assert os.path.exists(
            os.path.join(pipeline_library, pat % SETUP_NAME)), pat


def test_fit_from_pipeline_library(pipeline_library):
    config = _config(pipeline_library)
    tm = library.load_template_model(SETUP_NAME, config)
    assert tm.parnames == ('teff', 'logg', 'feh', 'alpha')

    v0 = 123.0
    wres = 5000.0 / 1000.0 / 2.35
    lam, spec, espec = simulation.observed_spectrum(
        v0, 5500.0, 2.75, -0.5, 0.5, npix=800, lam0=4650.0, lam1=5350.0,
        wresol=wres, snr=300.0, seed=4)
    sd = SpecData(SETUP_NAME, lam, spec, espec)
    res = vel_fit.process(
        [sd], dict(teff=5000.0, logg=3.0, feh=-1.0, alpha=0.5),
        config=config, options={'npoly': 10})
    assert abs(res['vel'] - v0) < max(10, 3 * res['vel_err'])
    tm2 = library.load_template_model(SETUP_NAME, config)
    assert tm2 is tm
