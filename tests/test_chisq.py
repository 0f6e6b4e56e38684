"""Golden tests for the continuum-marginalized chi-square kernel.

Checked against an independent numpy/SVD implementation of the same
marginalization math (the reference's slow path, spec_fit.py:255-303).
"""
import numpy as np
import jax.numpy as jnp

from rvspecfit_tpu.ops import basis, chisq


def svd_reference(spec, templ, polys, espec):
    d = spec / espec
    st = polys * (templ / espec)[None, :]
    v = st @ d
    minv = st @ st.T
    u, s, vt = np.linalg.svd(minv)
    logdet = np.sum(np.log(s))
    a = vt.T @ ((1.0 / s) * (u.T @ v))
    resid = d - a @ st
    return logdet + 2 * np.log(espec).sum() + resid @ resid, a


def _make_problem(npix=700, npoly=8, rbf=True, seed=0):
    rng = np.random.RandomState(seed)
    lam = np.linspace(4500, 5500, npix)
    templ = 1 - 0.5 * np.exp(-0.5 * ((lam - 5000) / 5.0)**2)
    cont = 1e-16 * (lam / 5000.0)**-2
    spec0 = templ * cont
    espec = spec0 * 0.01
    spec = spec0 + rng.normal(size=npix) * espec
    polys = basis.continuum_basis(lam, npoly, rbf=rbf)
    return spec, templ, polys, espec


def test_matches_svd_reference_rbf():
    spec, templ, polys, espec = _make_problem(rbf=True)
    ref, ref_a = svd_reference(spec, templ, polys, espec)
    got, a = chisq.chisq_continuum_marg(
        jnp.asarray(spec / espec), jnp.asarray(templ / espec),
        jnp.asarray(polys), float(np.log(espec).sum()), with_coeffs=True)
    np.testing.assert_allclose(float(got), ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(a), ref_a, rtol=1e-5)


def test_matches_svd_reference_chebyshev():
    spec, templ, polys, espec = _make_problem(rbf=False, npoly=5, seed=3)
    ref, _ = svd_reference(spec, templ, polys, espec)
    got = chisq.chisq_continuum_marg(
        jnp.asarray(spec / espec), jnp.asarray(templ / espec),
        jnp.asarray(polys), float(np.log(espec).sum()))
    np.testing.assert_allclose(float(got), ref, rtol=1e-8)


def test_float32_close_to_float64():
    spec, templ, polys, espec = _make_problem(npoly=15)
    ref, _ = svd_reference(spec, templ, polys, espec)
    got32 = chisq.chisq_continuum_marg(
        jnp.asarray(spec / espec, dtype=jnp.float32),
        jnp.asarray(templ / espec, dtype=jnp.float32),
        jnp.asarray(polys, dtype=jnp.float32),
        np.float32(np.log(espec).sum()),
        solve_dtype=jnp.float64)
    # residual-form stability: float32 chi2 must track float64 closely
    assert abs(float(got32) - ref) / abs(ref) < 1e-4


def test_ridge_retry_on_degenerate_basis():
    spec, templ, polys, espec = _make_problem(npoly=4)
    polys = np.vstack([polys, polys[-1]])  # exactly repeated row
    got = chisq.chisq_continuum_marg(
        jnp.asarray(spec / espec), jnp.asarray(templ / espec),
        jnp.asarray(polys), float(np.log(espec).sum()))
    assert np.isfinite(float(got))


def test_batch_matches_single():
    # the MXU-shaped batched kernel must reproduce the single-trial
    # residual-form kernel exactly (same math, regrouped matmuls)
    rng = np.random.RandomState(5)
    spec, templ, polys, espec = _make_problem(npoly=8)
    prod = np.asarray(chisq.basis_products(jnp.asarray(polys)))
    assert prod.shape == (64, polys.shape[1])
    templs = np.stack([templ * (1 + 0.1 * rng.normal(size=len(templ)))
                       for _ in range(7)])
    got_b, coef_b = chisq.chisq_continuum_marg_batch(
        jnp.asarray(spec / espec), jnp.asarray(templs / espec),
        jnp.asarray(polys), jnp.asarray(prod),
        float(np.log(espec).sum()), with_coeffs=True)
    for t in range(7):
        one, coef1 = chisq.chisq_continuum_marg(
            jnp.asarray(spec / espec), jnp.asarray(templs[t] / espec),
            jnp.asarray(polys), float(np.log(espec).sum()),
            with_coeffs=True)
        assert abs(float(got_b[t]) - float(one)) < 1e-6 * abs(float(one))
        np.testing.assert_allclose(np.asarray(coef_b[t]),
                                   np.asarray(coef1), rtol=1e-6)


def test_batch_float32_close_to_float64():
    spec, templ, polys, espec = _make_problem(npoly=15)
    ref, _ = svd_reference(spec, templ, polys, espec)
    got32 = chisq.chisq_continuum_marg_batch(
        jnp.asarray(spec / espec, dtype=jnp.float32),
        jnp.asarray((templ / espec)[None], dtype=jnp.float32),
        jnp.asarray(polys, dtype=jnp.float32),
        jnp.asarray(chisq.basis_products(
            jnp.asarray(polys, dtype=jnp.float32))),
        np.float32(np.log(espec).sum()),
        solve_dtype=jnp.float64)
    assert abs(float(got32[0]) - ref) / abs(ref) < 1e-4
