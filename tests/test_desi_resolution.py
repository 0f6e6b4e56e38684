"""Golden tests of the DESI resolution-matrix preparation chain
(deconvolution of the template LSF out of the banded RESOLUTION data)
against dense linear algebra (reference math: desi_fit.py:694-748)."""
import numpy as np

from rvspecfit_tpu.survey import desi


def _dia_dense(band, npix):
    """dia-convention band (offsets +w2..-w2, column-indexed) ->
    dense matrix, exactly as the reference's
    scipy.sparse.dia_matrix((mat, arange(w2,-w2-1,-1)))
    (reference: desi_fit.py:745-747)."""
    import scipy.sparse
    w2 = band.shape[0] // 2
    return scipy.sparse.dia_matrix(
        (band, np.arange(w2, -w2 - 1, -1)), (npix, npix)).toarray()


def _gauss_dia(sigma_pix, width, npix):
    w2 = width // 2
    offs = np.arange(w2, -w2 - 1, -1)
    col = np.exp(-0.5 * (offs / sigma_pix)**2)
    col /= col.sum()
    return col[:, None] * np.ones((width, npix))


def test_deconvolution_recovers_narrower_gaussian():
    """Deconvolving a sigma0 LSF out of a total-sigma Gaussian band
    leaves ~ a Gaussian of width sqrt(sigma^2 - sigma0^2)."""
    npix, width = 120, 11
    dwave = 0.8
    sig_tot, sig0 = 1.6, 1.0        # angstrom
    band = _gauss_dia(sig_tot / dwave, width, npix)
    out = desi.deconvolve_resolution_matrix(
        band, sigma0_angstrom=sig0, pix_size_angstrom=dwave)
    # compare an interior column of the dense result with the
    # analytic residual kernel
    dense = _dia_dense(out, npix)
    j = npix // 2
    col = dense[:, j]
    sig_res = np.sqrt(sig_tot**2 - sig0**2) / dwave
    x = np.arange(npix) - j
    expected = np.exp(-0.5 * (x / sig_res)**2)
    expected /= expected.sum()
    sel = np.abs(x) <= width // 2
    np.testing.assert_allclose(col[sel], expected[sel], atol=2e-3)


def test_prepare_band_matches_dense_application():
    """prepare_resolution_band's row-oriented output applied through
    BandedMatrix equals the dense deconvolved matrix product."""
    from rvspecfit_tpu.ops.resolution import BandedMatrix

    rng = np.random.RandomState(5)
    npix, width = 100, 11
    dwave = 0.7
    band = _gauss_dia(1.4 / dwave, width, npix)
    # perturb so the band is not exactly translation invariant
    band *= 1 + 0.05 * rng.rand(*band.shape)

    rows = desi.prepare_resolution_band(band, pix_size_angstrom=dwave,
                                        sigma0_angstrom=0.9)
    w2 = width // 2
    # rows[k, i] = M[i, i + (k - w2)] (row-indexed band)
    offsets = tuple(range(-w2, w2 + 1))
    bm = BandedMatrix(offsets, np.asarray(rows))

    x = rng.rand(npix)
    y_band = np.asarray(bm.matvec(x))
    y_dense = bm.to_dense() @ x
    np.testing.assert_allclose(y_band, y_dense, rtol=1e-10, atol=1e-12)

    # the dense operator reproduces the dia-convention deconvolved
    # matrix applied densely (renormalization only touches the edges;
    # compare the interior)
    dec = desi.deconvolve_resolution_matrix(
        band, sigma0_angstrom=0.9, pix_size_angstrom=dwave)
    interior = slice(w2, npix - w2)
    dense_dec = _dia_dense(dec, npix)
    np.testing.assert_allclose((dense_dec @ x)[interior],
                               y_dense[interior], rtol=1e-8)


def test_batched_prepare_matches_single():
    """The fiber-vectorized band preparation equals per-fiber calls."""
    rng = np.random.RandomState(7)
    nfib, npix, width = 5, 80, 11
    mats = _gauss_dia(2.0, width, npix)[None] \
        * (1 + 0.1 * rng.rand(nfib, width, npix))
    got = desi.prepare_resolution_band(mats, pix_size_angstrom=0.8,
                                       sigma0_angstrom=0.5)
    for i in range(nfib):
        one = desi.prepare_resolution_band(mats[i],
                                           pix_size_angstrom=0.8,
                                           sigma0_angstrom=0.5)
        np.testing.assert_allclose(got[i], one, rtol=1e-12)


def test_interpolate_bad_regions_batch():
    """Vectorized infill: interior gaps interpolate linearly, edge
    runs take the nearest good value, fully-masked rows pass through."""
    spec = np.arange(10, dtype=float)**2
    mask = np.zeros(10, bool)
    mask[3:6] = True
    out = desi.interpolate_bad_regions(spec, mask)
    np.testing.assert_allclose(
        out[3:6], np.interp([3, 4, 5], [2, 6], [4.0, 36.0]))
    # edges
    mask2 = np.zeros(10, bool)
    mask2[:2] = True
    mask2[-1] = True
    out2 = desi.interpolate_bad_regions(spec, mask2)
    assert out2[0] == out2[1] == spec[2]
    assert out2[-1] == spec[-2]
    # batch == singles; all-masked row unchanged
    specs = np.stack([spec, spec, spec])
    masks = np.stack([mask, mask2, np.ones(10, bool)])
    outb = desi.interpolate_bad_regions(specs, masks)
    np.testing.assert_allclose(outb[0], out)
    np.testing.assert_allclose(outb[1], out2)
    np.testing.assert_allclose(outb[2], spec)


def test_band_conversions_roundtrip():
    rng = np.random.RandomState(3)
    band = rng.rand(7, 50)
    rows = desi._band_torows(band)
    back = desi._band_tocolumns(rows)
    np.testing.assert_allclose(back, band, rtol=1e-14)
