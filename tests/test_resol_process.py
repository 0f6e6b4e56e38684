"""Per-call resolution route through vel_fit.process.

The reference exercises BOTH resolution plumbing routes — the
``resol_params`` argument of get_chisq and a per-SpecData resolution
matrix — through a full fit (reference: tests/test_sdss.py:99-144).
Here: a synthetic spectrum broadened by a known extra LSF is fitted
through vel_fit.process with (a) ``resolParams`` and (b) the
resolution attached to the SpecData; both must recover the injected
RV and agree with each other (same math, different plumbing).
"""
import numpy as np
import pytest

from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.ops.resolution import gaussian_resolution_matrix
from rvspecfit_tpu.utils import freeze

C_KMS = 299792.458


@pytest.mark.slow
def test_process_resol_params_matches_specdata_route():
    wres0 = 2.0          # template LSF width (build_template_model)
    sig_extra = 1.6      # extra instrumental broadening (angstrom)
    v0 = 137.0
    tm = simulation.build_template_model(4, 4, 4, 3, npix=2048,
                                         wresol=wres0)
    templates = {'acc': tm}
    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=True, template_lib=''))

    npix = 500
    lam = np.linspace(4700.0, 5300.0, npix)
    lam_rest = lam / (1 + v0 / C_KMS)
    wtot = np.sqrt(wres0**2 + sig_extra**2)
    sp = simulation.fake_spectrum(lam_rest, 6200.0, 3.1, -0.8, 0.4,
                                  wresol=wtot)
    rng = np.random.RandomState(21)
    esp = sp / 80.0
    spec = sp + rng.normal(size=npix) * esp

    rm = gaussian_resolution_matrix(lam, width=sig_extra)
    p0 = dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5)

    sd_plain = SpecData('acc', lam, spec, esp)
    res_a = vel_fit.process([sd_plain], p0, config=config,
                            resolParams={'acc': rm},
                            templates=templates)

    sd_res = SpecData('acc', lam, spec, esp, resolution=rm)
    res_b = vel_fit.process([sd_res], p0, config=config,
                            templates=templates)

    for res in (res_a, res_b):
        assert abs(res['vel'] - v0) < max(10, 3 * res['vel_err']), res
    # same likelihood, different plumbing: identical fits
    assert abs(res_a['vel'] - res_b['vel']) < 1e-3
    for p in tm.parnames:
        assert abs(res_a['param'][p] - res_b['param'][p]) < \
            1e-4 * max(1.0, abs(res_b['param'][p]))

    # the combination is rejected (reference spec_fit.py:922-929)
    with pytest.raises(ValueError):
        vel_fit.process([sd_res], p0, config=config,
                        resolParams={'acc': rm}, templates=templates)
