"""Tests of the banded resolution-matrix convolution."""
import numpy as np
import jax.numpy as jnp

from rvspecfit_tpu.ops import resolution as rs


def test_matvec_matches_dense():
    rng = np.random.RandomState(0)
    lam = np.linspace(4000, 5000, 300)
    bm = rs.gaussian_resolution_matrix(lam, resol=500.0)
    x = rng.normal(size=300)
    dense = bm.to_dense() @ x
    got = np.asarray(bm.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, dense, rtol=1e-10, atol=1e-12)


def test_rows_normalized_constant_preserved():
    lam = np.linspace(4000, 5000, 400)
    bm = rs.gaussian_resolution_matrix(lam, width=2.0)
    out = np.asarray(bm.matvec(jnp.ones(400)))
    np.testing.assert_allclose(out, 1.0, rtol=1e-10)


def test_gaussian_width():
    # A delta spike convolved with the LSF must have the requested sigma
    n = 1001
    lam = np.linspace(5000 - 50, 5000 + 50, n)
    width = 1.7
    bm = rs.gaussian_resolution_matrix(lam, width=width)
    x = np.zeros(n)
    x[n // 2] = 1.0
    out = np.asarray(bm.matvec(jnp.asarray(x)))
    mu = (lam * out).sum() / out.sum()
    sig = np.sqrt(((lam - mu)**2 * out).sum() / out.sum())
    assert abs(mu - 5000) < 1e-6
    assert abs(sig - width) < 0.02


def test_desi_band_roundtrip():
    rng = np.random.RandomState(1)
    n, w = 50, 3
    res = rng.uniform(0.1, 1.0, size=(2 * w + 1, n))
    bm = rs.banded_from_desi_resolution(res)
    x = rng.normal(size=n)
    # dense check per the true DESI dia convention (scipy dia_matrix,
    # column-indexed): M[i, j] = res[k, j] with j - i = w - k
    import scipy.sparse
    dense = scipy.sparse.dia_matrix(
        (res, np.arange(w, -w - 1, -1)), (n, n)).toarray()
    np.testing.assert_allclose(np.asarray(bm.matvec(jnp.asarray(x))),
                               dense @ x, rtol=1e-10, atol=1e-12)
