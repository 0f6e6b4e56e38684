"""Golden tests of the batched CCF preprocessing (ops/continuum.py)
against independent per-spectrum scipy implementations."""
import numpy as np
import scipy.interpolate
import scipy.optimize
import scipy.signal
import scipy.stats

from rvspecfit_tpu.ops import continuum as C

CCFCONF = dict(splinestep=1000.0, continuum=True,
               logl0=np.log(4510.0), logl1=np.log(5490.0), npoints=1024)


def _make_batch(b=5, npix=1500, seed=11):
    rng = np.random.RandomState(seed)
    lam = np.linspace(4500, 5500, npix)
    cont = 8 * (1 + 0.4 * np.sin(lam / 250.0))[None, :] \
        * (1 + 0.2 * rng.rand(b, 1))
    lines = 1 - 0.6 * np.exp(-0.5 * ((lam[None, :] - 4900) / 2.0)**2) \
        - 0.3 * np.exp(-0.5 * ((lam[None, :] - 5200) / 1.5)**2)
    spec = cont * lines + 0.04 * cont * rng.randn(b, npix)
    espec = 0.04 * cont * (1 + 0.1 * rng.rand(b, npix))
    badmask = rng.rand(b, npix) < 0.02
    badmask[:, 100:110] = True      # a masked run
    badmask[2, :25] = True          # masked leading edge
    badmask[3, -30:] = True         # masked trailing edge
    return lam, spec, espec, badmask


def _ref_continuum(lam, spec, espec, splinestep=1000.0):
    """Independent per-spectrum soft-L1 spline fit (scipy)."""
    nodes, edges = C.spline_nodes(lam, splinestep)

    def model(p):
        spl = scipy.interpolate.UnivariateSpline(nodes, p, s=0, k=2)
        return np.exp(np.clip(spl(lam), -100, 100))

    bs = scipy.stats.binned_statistic(lam, spec, 'median', bins=edges)
    meds = np.median(spec)
    p0 = np.log(np.maximum(bs.statistic, 1e-3 * meds))
    p0[~np.isfinite(p0)] = np.log(meds)
    res = scipy.optimize.least_squares(
        lambda p: (model(p) - spec) / espec, p0, loss='soft_l1')
    return model(res['x'])


def test_fit_continuum_matches_scipy_soft_l1():
    lam, spec, espec, _ = _make_batch()
    got = C.fit_continuum(lam, spec, espec, ccfconf=CCFCONF)
    for i in range(spec.shape[0]):
        ref = _ref_continuum(lam, spec[i], espec[i])
        np.testing.assert_allclose(got[i], ref, rtol=2e-4,
                                   err_msg=f'fiber {i}')


def test_infill_bad_pixels_matches_per_object():
    lam, spec, _, badmask = _make_batch()
    got = C.infill_bad_pixels(lam, spec, badmask)
    for i in range(spec.shape[0]):
        # independent per-object infill: interpolate good pixels,
        # edges clamp to the nearest good value
        xg = np.nonzero(~badmask[i])[0]
        ref = np.array(spec[i])
        xb = np.nonzero(badmask[i])[0]
        ref[xb] = np.interp(lam[xb], lam[xg], spec[i][xg])
        np.testing.assert_allclose(got[i], ref, rtol=1e-12,
                                   err_msg=f'fiber {i}')
    # good pixels untouched
    assert (got[~badmask] == spec[~badmask]).all()


def test_infill_mixed_clean_and_bad_rows():
    # the row-subset fast path: clean rows must pass through
    # unchanged and bad rows must match the all-rows computation
    lam, spec, _, badmask = _make_batch()
    badmask = np.array(badmask)
    badmask[::2] = False                      # half the rows clean
    badmask[1::2, 5] = True                   # bad rows stay bad
    got = C.infill_bad_pixels(lam, spec, badmask)
    # rows that all contain bad pixels take the full path directly
    full = C.infill_bad_pixels(lam, spec[1::2], badmask[1::2])
    np.testing.assert_array_equal(got[::2], spec[::2])
    np.testing.assert_allclose(got[1::2], full, rtol=1e-12)
    # all-clean: exact passthrough
    clean = C.infill_bad_pixels(lam, spec, np.zeros_like(badmask))
    np.testing.assert_array_equal(clean, spec)


def test_masked_median_matches_nanmedian():
    rng = np.random.RandomState(7)
    x = rng.normal(size=(40, 101))
    x[rng.uniform(size=x.shape) < 0.05] = np.nan      # raw NaNs
    good = rng.uniform(size=x.shape) > 0.3
    good[3] = False                                    # all-masked row
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        ref = np.nanmedian(np.where(good, x, np.nan), axis=1)
    got = C.masked_median(x, good)
    np.testing.assert_allclose(got[~np.isnan(ref)], ref[~np.isnan(ref)],
                               rtol=1e-14)
    assert np.isnan(got[np.isnan(ref)]).all()
    # even/odd counts hit both middle-element formulas
    got1 = C.masked_median(np.array([3.0, 1.0, 2.0, 9.0]),
                           np.array([True, True, True, False]))
    np.testing.assert_allclose(got1, [2.0])
    got2 = C.masked_median(np.array([[3.0, 1.0, 2.0, 9.0]]),
                           np.ones((1, 4), bool))
    np.testing.assert_allclose(got2, [2.5])


def test_infill_all_masked_row():
    lam = np.linspace(1, 2, 8)
    spec = np.array([[1.0, np.nan, 3.0, np.inf, 5, 6, 7, 8]])
    bad = np.ones((1, 8), bool)
    got = C.infill_bad_pixels(lam, spec, bad)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[0, 0], 1.0)
    np.testing.assert_allclose(got[0, 1], 1.0)


def test_preprocess_batch_matches_per_object_reference():
    """Full preprocessing chain vs an independent single-spectrum
    implementation following the reference (make_ccf.py:330-414)."""
    lam, spec, espec, badmask = _make_batch(b=4)
    got_s, got_iv = C.preprocess_batch(lam, spec, espec, badmask=badmask,
                                       ccfconf=CCFCONF)

    ccf_logl = np.linspace(CCFCONF['logl0'], CCFCONF['logl1'],
                           CCFCONF['npoints'])
    ccf_lam = np.exp(ccf_logl)
    for i in range(spec.shape[0]):
        cesp = np.array(espec[i])
        bm = np.array(badmask[i])
        filt = scipy.signal.medfilt(spec[i], 11)
        mederr = np.nanmedian(cesp)
        bm |= (cesp > 10 * mederr) | (filt <= 0)
        cesp[bm] = 1e9 * mederr
        xg = np.nonzero(~bm)[0]
        cs = np.array(spec[i])
        cs[bm] = np.interp(lam[bm], lam[xg], spec[i][xg])
        cont = _ref_continuum(lam, cs, cesp)
        civ = 1.0 / cesp**2
        civ[bm] = 0
        medv = np.median(cs)
        cont = np.maximum(1e-2 * medv, cont) if medv > 0 else \
            np.maximum(cont, 1)
        ns = spec[i] / cont
        civ = cont**2 * civ
        ns[bm] = 0
        xind = np.searchsorted(lam, ccf_lam) - 1
        insub = (xind >= 0) & (xind <= len(lam) - 2)
        r1 = np.zeros(len(ccf_logl))
        r2 = np.zeros(len(ccf_logl))
        li = xind[insub]
        ri = li + 1
        rw = (ccf_lam[insub] - lam[li]) / (lam[ri] - lam[li])
        lw = 1 - rw
        r1[insub] = lw * ns[li] + rw * ns[ri]
        liv, riv = civ[li], civ[ri]
        r2[insub] = liv * riv / (lw**2 * riv + rw**2 * liv
                                 + ((liv * riv) == 0).astype(int))
        np.testing.assert_allclose(got_s[i], r1, rtol=1e-3, atol=1e-8,
                                   err_msg=f'fiber {i} spec')
        np.testing.assert_allclose(got_iv[i], r2, rtol=1e-3, atol=1e-8,
                                   err_msg=f'fiber {i} ivar')


def _fft_reference(lam, spec, espec, badmask, ccfconf):
    """Host-chain reference for the device-resident preprocess+FFT:
    preprocess_batch (itself golden-tested above) followed by the CCF's
    packed conjugate rFFTs."""
    proc, pivar = C.preprocess_batch(lam, spec, espec, badmask=badmask,
                                     ccfconf=ccfconf)
    sfft = np.fft.rfft(proc * pivar, axis=1)
    ivfft = np.fft.rfft(pivar, axis=1)
    sse = (proc**2 * pivar).sum(axis=1)
    pack_conj = lambda c: np.stack([c.real, -c.imag])
    return pack_conj(sfft), pack_conj(ivfft), sse


def test_preprocess_fft_batch_matches_host_chain():
    """Device-resident preprocess+rfft == host preprocess_batch + numpy
    rfft (same algorithms, one jitted program)."""
    lam, spec, espec, badmask = _make_batch(b=4)
    ref_s, ref_iv, ref_sse = _fft_reference(lam, spec, espec, badmask,
                                            CCFCONF)
    got_s, got_iv, got_sse = C.preprocess_fft_batch(
        lam, spec, espec, badmask=badmask, ccfconf=CCFCONF)
    got_s, got_iv = np.asarray(got_s), np.asarray(got_iv)
    scale_s = np.abs(ref_s).max()
    scale_iv = np.abs(ref_iv).max()
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-6,
                               atol=1e-9 * scale_s)
    np.testing.assert_allclose(got_iv, ref_iv, rtol=1e-6,
                               atol=1e-9 * scale_iv)
    np.testing.assert_allclose(got_sse, ref_sse, rtol=1e-8)


def test_preprocess_fft_batch_nocontinuum():
    ccfconf = dict(CCFCONF, continuum=False)
    lam, spec, espec, badmask = _make_batch(b=4, seed=5)
    ref_s, ref_iv, ref_sse = _fft_reference(lam, spec, espec, badmask,
                                            ccfconf)
    got_s, got_iv, got_sse = C.preprocess_fft_batch(
        lam, spec, espec, badmask=badmask, ccfconf=ccfconf)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=1e-7,
                               atol=1e-10 * np.abs(ref_s).max())
    np.testing.assert_allclose(np.asarray(got_iv), ref_iv, rtol=1e-7,
                               atol=1e-10 * np.abs(ref_iv).max())
    np.testing.assert_allclose(got_sse, ref_sse, rtol=1e-9)


def test_preprocess_fft_batch_no_badmask():
    lam, spec, espec, _ = _make_batch(b=4, seed=3)
    ref_s, ref_iv, ref_sse = _fft_reference(lam, spec, espec, None,
                                            CCFCONF)
    got_s, got_iv, got_sse = C.preprocess_fft_batch(
        lam, spec, espec, badmask=None, ccfconf=CCFCONF)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=1e-6,
                               atol=1e-9 * np.abs(ref_s).max())
    np.testing.assert_allclose(got_sse, ref_sse, rtol=1e-8)
