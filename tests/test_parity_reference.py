"""Parity harness: run the ORIGINAL reference implementation
(/root/reference, CPU C-spline + scipy Nelder-Mead) and this
framework on identical synthetic templates and spectra, and compare
the fitted radial velocities (the BASELINE.md north-star exactness
gate: RV agreement well under the statistical error).

The reference's cffi spline extension is compiled into a temp dir at
session start; heavyweight/unavailable reference deps (astropy,
numdifftools, numba) are stubbed — astropy is only used by pipeline
code we do not call, and numdifftools only for the error bars, which
a small finite-difference Hessian reproduces.
"""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF_PY = '/root/reference/py'

CDEF = """
void construct(double *xs, double *ys, int N,
double *A, double *B, double *C, double *D, double *h);
int evaler(double *evalx, int nevalx,  int N, double *xs,
           double *hs, double *As, double *Bs, double *Cs,
           double *Ds, int log_step, double *ret);
"""


def _fd_hessian(fn, x, steps):
    """Central-difference Hessian with per-dimension steps."""
    x = np.asarray(x, np.float64)
    n = len(x)
    h = np.asarray(steps, np.float64)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            ei = np.zeros(n)
            ej = np.zeros(n)
            ei[i] = h[i]
            ej[j] = h[j]
            if i == j:
                out[i, i] = (fn(x + ei) - 2 * fn(x) + fn(x - ei)) \
                    / h[i]**2
            else:
                out[i, j] = out[j, i] = (
                    fn(x + ei + ej) - fn(x + ei - ej)
                    - fn(x - ei + ej) + fn(x - ei - ej)) \
                    / (4 * h[i] * h[j])
    return out


@pytest.fixture(scope='session')
def ref(tmp_path_factory):
    """Import the reference rvspecfit with its C spline compiled."""
    tmp = tmp_path_factory.mktemp('ref_spliner')
    import cffi
    builder = cffi.FFI()
    builder.set_source(
        '_ref_spliner',
        open(REF_PY + '/rvspecfit/src/spliner.c').read(),
        extra_compile_args=['-std=c99'])
    builder.cdef(CDEF)
    try:
        builder.compile(tmpdir=str(tmp))
    except Exception as exc:
        pytest.skip(f'cannot compile reference spliner: {exc}')
    sys.path.insert(0, str(tmp))
    import _ref_spliner

    vmod = types.ModuleType('rvspecfit._version')
    vmod.version = '0.0.0-parity'
    sys.modules['rvspecfit._version'] = vmod
    sys.modules['rvspecfit._spliner'] = _ref_spliner

    for name in ('astropy', 'astropy.io', 'astropy.io.fits'):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules['astropy.io'].fits = sys.modules['astropy.io.fits']
    sys.modules['astropy'].io = sys.modules['astropy.io']

    ndf = types.ModuleType('numdifftools')

    class MinStepGenerator:
        def __init__(self, base_step=None):
            self.base_step = base_step

    class Hessian:
        def __init__(self, fn, step=None):
            self.fn = fn
            self.step = step

    def _hess_call(self, x):
        x = np.asarray(x, np.float64)
        if self.step is not None and self.step.base_step is not None:
            h = np.asarray(self.step.base_step, np.float64)
        else:
            h = np.maximum(np.abs(x) * 1e-4, 1e-6)
        return _fd_hessian(self.fn, x, h)

    Hessian.__call__ = _hess_call
    ndf.MinStepGenerator = MinStepGenerator
    ndf.Hessian = Hessian
    sys.modules['numdifftools'] = ndf

    sys.path.insert(0, REF_PY)
    from rvspecfit import vel_fit as ref_vel_fit
    from rvspecfit import spec_fit as ref_spec_fit
    from rvspecfit import spec_inter as ref_spec_inter

    # shim a reference bug: get_hess_inv assumes teff is always a
    # fitted parameter and IndexErrors when every atmospheric
    # parameter is fixed (vel_fit.py:453); fall back to a diagonal
    _orig_hess_inv = ref_vel_fit.get_hess_inv

    def _safe_hess_inv(param_names):
        try:
            return _orig_hess_inv(param_names)
        except IndexError:
            return np.diag(np.full(len(param_names), 0.01))

    ref_vel_fit.get_hess_inv = _safe_hess_inv
    return dict(vel_fit=ref_vel_fit, spec_fit=ref_spec_fit,
                spec_inter=ref_spec_inter)


class _LogTeffMapper:
    """log10 on the teff (first) axis — same as both frameworks'
    template preparation mapping."""

    def forward(self, x):
        y = np.array(x, dtype=np.float64)
        y[..., 0] = np.log10(y[..., 0])
        return y


SETUP = 'parity1'


def _install_reference_interpolator(ref, lam, uvecs, idgrid, vecs,
                                    specs, parnames, template_lib):
    si = ref['spec_inter']
    interper = si.GridInterp(list(uvecs), idgrid, vecs, specs, exp=True)
    extraper = si.GridOutsideCheck(list(uvecs), vecs, idgrid)
    obj = si.SpecInterpolator(SETUP, interper, extraper, lam,
                              _LogTeffMapper(), parnames,
                              log_step=True)
    si.interp_cache.template_lib = template_lib
    si.interp_cache.interps = {SETUP: obj}


def test_rv_parity_with_reference(ref, tmp_path):
    """Fit the same spectra with the reference and with this
    framework through the full ML pipeline; RVs must agree to well
    below the statistical uncertainty."""
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit import vel_fit
    from rvspecfit_tpu.fit.spec_data import SpecData
    from rvspecfit_tpu.interp.api import TemplateModel
    from rvspecfit_tpu.interp.grid import GridInterpState
    from rvspecfit_tpu.ops.spline import SplineGeometry
    from rvspecfit_tpu.utils import freeze

    lam, uvecs, idgrid, vecs, specs, parnames = \
        simulation.make_template_grid(5, 5, 4, 3, npix=3000)

    # second_minimizer (BFGS polish) ON for both: Nelder-Mead alone
    # can park the two implementations in slightly different spots of
    # a flat chi-square valley; the gradient polish drives both to the
    # same local minimum, which is what the <0.01 km/s gate is about
    config_common = dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2,
                         min_vel_step=0.2, second_minimizer=True,
                         template_lib=str(tmp_path))

    # ours: device TemplateModel over the same grid
    state = GridInterpState.build(uvecs, idgrid, vecs, specs,
                                  log_spec=True)
    geom = SplineGeometry.from_knots(lam, log_step=True)
    tm = TemplateModel(kind='grid', state=state, geom=geom,
                       parnames=parnames, log_ids=(0,))
    our_config = freeze(config_common)

    # reference: GridInterp/SpecInterpolator over the same grid
    _install_reference_interpolator(ref, lam, uvecs, idgrid, vecs,
                                    specs, parnames,
                                    str(tmp_path))
    from rvspecfit import frozendict as ref_frozendict
    ref_config = ref_frozendict.frozendict(config_common)

    from rvspecfit_tpu.fit.likelihood import FusedChisq

    parlist = list(parnames)
    rng = np.random.RandomState(99)
    n_obj = 4
    dv_free, dv_fixed, chi_gap = [], [], []
    for k in range(n_obj):
        v0 = rng.uniform(-400, 400)
        teff = rng.uniform(4800, 9200)
        logg = rng.uniform(1.2, 4.5)
        feh = rng.uniform(-1.8, -0.2)
        alpha = rng.uniform(0.1, 0.9)
        olam, ospec, oespec = simulation.observed_spectrum(
            v0, teff, logg, feh, alpha, npix=900, lam0=4700.0,
            lam1=5300.0, wresol=2.5, snr=100.0, seed=1000 + k)
        p0 = dict(teff=6000.0, logg=3.0, feh=-1.0, alpha=0.5)

        sd_ref = ref['spec_fit'].SpecData(SETUP, olam, ospec, oespec)
        res_ref = ref['vel_fit'].process([sd_ref], dict(p0),
                                         config=ref_config,
                                         options={'npoly': 8})

        sd_our = SpecData(SETUP, olam, ospec, oespec)
        res_our = vel_fit.process([sd_our], dict(p0),
                                  config=our_config,
                                  templates={SETUP: tm},
                                  options={'npoly': 8})
        dv_free.append(res_our['vel'] - res_ref['vel'])
        # both recover the truth
        assert abs(res_ref['vel'] - v0) < max(
            8, 5 * res_ref['vel_err']), f'ref object {k}'
        assert abs(res_our['vel'] - v0) < max(
            8, 5 * res_our['vel_err']), f'our object {k}'
        # errors agree to a factor ~2 (different Hessian estimators)
        assert 0.4 < res_our['vel_err'] / max(res_ref['vel_err'],
                                              1e-6) < 2.5, f'obj {k}'

        # --- gate 1: the likelihood SURFACES agree pointwise ---
        fused = FusedChisq([sd_our], {SETUP: tm}, our_config,
                           options={'npoly': 8})
        for sol in (res_ref, res_our):
            pv = [sol['param'][p] for p in parlist]
            chi_ref = float(ref['spec_fit'].get_chisq(
                [sd_ref], sol['vel'], tuple(pv), None, None,
                options={'npoly': 8}, config=ref_config))
            chi_our = float(fused.chisq_one(sol['vel'], pv))
            chi_gap.append(chi_our - chi_ref)
            assert abs(chi_our - chi_ref) < 2e-4 * abs(chi_ref), \
                f'chi2 surface mismatch, object {k}'

        # --- gate 2: velocity at FIXED parameters matches < 10 m/s
        # (the free fits may legitimately pick different template
        # basins on this coarse grid; at shared parameters the
        # velocity estimate must be the same) ---
        # second_minimizer off here: the reference's get_hess_inv
        # crashes when every atmospheric parameter is fixed
        # (vel_fit.py:453 assumes teff is free), and a 1-D velocity
        # polish is not needed for this comparison anyway
        nopolish = dict(config_common, second_minimizer=False)
        pref = dict(res_ref['param'])
        r_ref_fixed = ref['vel_fit'].process(
            [sd_ref], dict(pref), fixParam=parlist,
            config=ref_frozendict.frozendict(nopolish),
            options={'npoly': 8})
        r_our_fixed = vel_fit.process(
            [sd_our], dict(pref), fixParam=parlist,
            config=freeze(nopolish), templates={SETUP: tm},
            options={'npoly': 8})
        dv_fixed.append(r_our_fixed['vel'] - r_ref_fixed['vel'])

    dv_free = np.array(dv_free)
    dv_fixed = np.array(dv_fixed)
    print('free-fit RV delta vs reference [km/s]:',
          np.round(dv_free, 4))
    print('fixed-params RV delta vs reference [km/s]:',
          np.round(dv_fixed, 5))
    print('chi2 surface gap:', np.round(np.array(chi_gap), 5))
    # north-star exactness: identical surfaces -> identical velocity
    assert np.max(np.abs(dv_fixed)) < 0.01
    # free fits agree except for genuine basin differences
    assert np.median(np.abs(dv_free)) < 0.05
