"""Golden tests of the fused Pallas CCF kernel vs the XLA formulation."""
import numpy as np
import pytest
import jax.numpy as jnp

from rvspecfit_tpu.fit import ccf as ccf_mod
from rvspecfit_tpu.ops import pallas_ccf


def _fake_arm(rng, t=11, b=5, npoints=256, nvel=37):
    """Random stacked real/imag FFT banks + DFT-at-lags matrices with
    the same shapes/conventions fit_batch feeds the kernels."""
    f = npoints // 2 + 1
    pack = lambda c: jnp.asarray(
        np.stack([c.real, c.imag]).astype(np.float32))
    # genuine FFTs of real series (like the production artifacts):
    # in the no-continuum mode c1 = corr(T^2, ivar) must stay positive
    # and bounded away from zero or the -c0^2/c1 ratio amplifies
    # harmless rounding differences between the formulations
    tm = rng.normal(size=(t, npoints))
    tfft = pack(np.fft.rfft(tm, axis=1))
    t2fft = pack(np.fft.rfft(tm**2, axis=1))
    sfft = pack(np.conj(np.fft.rfft(rng.normal(size=(b, npoints)),
                                    axis=1)))
    iv = rng.uniform(0.5, 2.0, size=(b, npoints))
    ivfft = pack(np.conj(np.fft.rfft(iv, axis=1)))
    vel_grid = np.linspace(-400, 400, nvel)
    ecos, esin = ccf_mod._dft_mats_cached(
        npoints, 0.0, npoints * 1e-4, tuple(vel_grid), 'float32')
    return tfft, t2fft, sfft, ivfft, ecos, esin


@pytest.mark.parametrize('continuum', [True, False])
def test_matches_xla_formulation(continuum):
    rng = np.random.RandomState(7)
    tfft, t2fft, sfft, ivfft, ecos, esin = _fake_arm(rng)
    xla_fun = ccf_mod._ccf_batch_cont if continuum else \
        ccf_mod._ccf_batch_nocont
    want = np.asarray(xla_fun(tfft, t2fft, sfft, ivfft, ecos, esin))
    got = np.asarray(pallas_ccf.ccf_chisq_pallas(
        tfft, t2fft, sfft, ivfft, ecos, esin, continuum=continuum,
        interpret=True))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-5)


def test_odd_shapes_pad_and_slice():
    """Shapes with no alignment at all (T, B, F, V all ragged) must
    round-trip through the kernel's internal padding."""
    rng = np.random.RandomState(3)
    tfft, t2fft, sfft, ivfft, ecos, esin = _fake_arm(
        rng, t=7, b=3, npoints=190, nvel=29)
    want = np.asarray(ccf_mod._ccf_batch_cont(
        tfft, t2fft, sfft, ivfft, ecos, esin))
    got = np.asarray(pallas_ccf.ccf_chisq_pallas(
        tfft, t2fft, sfft, ivfft, ecos, esin, continuum=True,
        interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-5)


def test_fit_batch_end_to_end_interpret(monkeypatch):
    """fit_batch through the kernel (RVST_PALLAS_CCF=interpret) returns
    the same best template/velocity as the XLA path."""
    monkeypatch.setenv('RVST_PALLAS_CCF', '0')
    res_xla = _run_small_fit_batch()
    monkeypatch.setenv('RVST_PALLAS_CCF', 'interpret')
    ccf_mod._PALLAS_STATE.pop('failed', None)
    res_pal = _run_small_fit_batch()
    # the safety fallback must NOT have fired — otherwise this would
    # vacuously compare the XLA path against itself
    assert not ccf_mod._PALLAS_STATE.get('failed'), \
        'Pallas kernel fell back to XLA during the interpret run'
    np.testing.assert_array_equal(res_pal['best_id'], res_xla['best_id'])
    np.testing.assert_allclose(res_pal['best_vel'], res_xla['best_vel'],
                               atol=1e-2)
    np.testing.assert_allclose(res_pal['best_chi'], res_xla['best_chi'],
                               rtol=1e-4)


def test_fit_batch_fallback_on_kernel_failure(monkeypatch):
    """If the kernel raises (Mosaic lowering failure on an unexpected
    backend), fit_batch must retry the whole tile pass with the XLA
    formulation and still return correct results, and stick to XLA for
    subsequent calls."""
    monkeypatch.setenv('RVST_PALLAS_CCF', '0')
    want = _run_small_fit_batch()
    monkeypatch.setenv('RVST_PALLAS_CCF', 'interpret')
    ccf_mod._PALLAS_STATE.pop('failed', None)

    def boom(*a, **k):
        raise RuntimeError('synthetic Mosaic failure')
    monkeypatch.setattr(pallas_ccf, 'ccf_chisq_pallas', boom)
    got = _run_small_fit_batch()
    assert ccf_mod._PALLAS_STATE.get('failed') is True
    np.testing.assert_array_equal(got['best_id'], want['best_id'])
    np.testing.assert_allclose(got['best_vel'], want['best_vel'],
                               atol=1e-9)
    ccf_mod._PALLAS_STATE.pop('failed', None)


def _run_small_fit_batch():
    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.utils import freeze
    config = freeze(dict(min_vel=-400, max_vel=400, vel_step0=10,
                         template_lib=''))
    bank = simulation.build_ccf_bank(nt=3, nl=2, nf=2, na=2, npix=512,
                                     lam0=4600.0, lam1=5400.0, every=4)
    arms_data, _ = simulation.make_exposure(4, npix_arm=128, snr=30.0,
                                            seed=5)
    name, (lam, fl, iv) = next(iter(arms_data.items()))
    with np.errstate(divide='ignore'):
        return ccf_mod.fit_batch(
            [(name, lam, fl, 1.0 / np.sqrt(np.maximum(iv, 1e-30)),
              None)],
            config, banks={name: bank})
