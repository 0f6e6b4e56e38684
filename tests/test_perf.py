"""FLOP accounting / MFU estimation (perf.py + run_neldermead
obj_evals)."""
import numpy as np
import pytest

import synth
from rvspecfit_tpu import perf
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.interp.api import TemplateModel
from rvspecfit_tpu.interp.grid import GridInterpState
from rvspecfit_tpu.ops.spline import SplineGeometry
from rvspecfit_tpu.utils import freeze

CONFIG = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=False, template_lib=''))
NFIB = 3


@pytest.fixture(scope='module')
def fitter_and_mapper():
    lam, uvecs, idgrid, vecs, specs, parnames = synth.make_template_grid(
        4, 4, 3, 2, npix=512)
    state = GridInterpState.build(uvecs, idgrid, vecs, specs,
                                  log_spec=True)
    geom = SplineGeometry.from_knots(lam, log_step=True)
    tm = TemplateModel(kind='grid', state=state, geom=geom,
                       parnames=parnames, log_ids=(0,))
    rng = np.random.RandomState(3)
    dlam = np.linspace(4600, 5400, 300)
    flux = np.zeros((NFIB, dlam.size))
    ivar = np.zeros((NFIB, dlam.size))
    for i in range(NFIB):
        _, spec, espec = synth.observed_spectrum(
            rng.uniform(-200, 200), 6000.0, 3.0, -1.0, 0.5,
            npix=dlam.size, snr=100.0, seed=40 + i)
        flux[i] = spec
        ivar[i] = 1.0 / espec**2
    arm = BatchArm('config1', dlam, flux, ivar)
    bf = BatchedFitter([arm], {'config1': tm}, CONFIG,
                       options={'npoly': 5})
    mapper = vel_fit.ParamMapper(
        tm.parnames, dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5),
        [], None, False)
    return bf, mapper


def test_run_neldermead_counts_objective_evals(fitter_and_mapper):
    bf, mapper = fitter_and_mapper
    res = bf.run_neldermead(mapper, np.zeros(NFIB), maxiter=64)
    # at least the simplex init (n+1 per fiber) plus some executed
    # NM iterations (4 candidates each) must be counted; the chunk
    # program exits early when the tile converges, so the exact count
    # is data-dependent
    nvec = len(mapper.start_vector(0.0))
    assert res['obj_evals'] > NFIB * (nvec + 1)


def test_objective_flops_per_trial_positive(fitter_and_mapper):
    bf, mapper = fitter_and_mapper
    fpt = perf.objective_flops_per_trial(bf, mapper, ncand=4)
    # XLA counts the fused likelihood's contractions: one fiber-trial
    # on a 300-pixel arm with a 512-pixel template costs well over the
    # bare chi-square matmul (2 * npoly^2 * npix ~ 1e5 flops)
    assert fpt is not None and fpt > 1e5


def test_device_peak_table(monkeypatch):
    monkeypatch.setenv('RVST_PEAK_TFLOPS', '275')
    peak, label = perf.device_peak_tflops()
    assert peak == 275.0 and label == 'RVST_PEAK_TFLOPS'
    monkeypatch.delenv('RVST_PEAK_TFLOPS')

    class FakeDev:
        device_kind = 'TPU v5e'
    peak, label = perf.device_peak_tflops(FakeDev())
    assert peak == 197.0

    class Unknown:
        device_kind = 'FPGA x1'
    peak, label = perf.device_peak_tflops(Unknown())
    assert peak is None
