"""Continuum-marginalized chi-square kernel.

The likelihood of a spectrum given a template, with the continuum
correction polynomial coefficients analytically marginalized
(profiled) out.  This is the second-hottest kernel of the fit
(reference math: py/rvspecfit/spec_fit.py:203-354).

With data D = spec/espec and design matrix S whose rows are
(continuum basis_i * template / espec), the returned value is

    -2 log L = log det(S S^T) + 2 sum(log espec) + || D - a^T S ||^2

with a the weighted-least-squares continuum coefficients.

TPU design: one fused function of the per-trial template vector.
The (npoly x npix) x (npix x npoly) normal-matrix product maps to the
MXU; the (npoly x npoly) factorization is tiny and is done with a
Cholesky solve (optionally in float64 — negligible cost at this size
even with TPU f64 emulation) with an in-graph ridge retry replacing
the reference's numba-Cholesky -> scipy-SVD fallback chain.  Batching
over trial points is a plain vmap.

The residual form ||D - S^T a||^2 (rather than D^T D - v^T M^-1 v) is
used deliberately: it is numerically stable in float32, which is what
makes the TPU fast path match the float64 reference to ~1e-3 in chi2.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# past this width the unrolled routines stop beating the LAPACK-style
# custom call (op count grows as n^2)
_UNROLL_MAX_N = 24


def _cholesky_unrolled(m):
    """Lower-Cholesky of small (..., n, n) SPD matrices, unrolled.

    XLA lowers jnp.linalg.cholesky to a blocked custom call that costs
    ~0.5 ms for a (500, 10, 10) batch on TPU (measured in the NM
    objective trace) — 100x the arithmetic.  For the static n <= 24 of
    the continuum basis, n columns of fused vector ops over the batch
    do the same job in microseconds.  Failure semantics match
    jnp.linalg.cholesky: non-PD inputs produce NaN/inf entries.
    """
    n = m.shape[-1]
    rows = np.arange(n)
    cols = []
    for j in range(n):
        v = m[..., :, j]
        for k in range(j):
            v = v - cols[k] * cols[k][..., j, None]
        d = v[..., j]
        ljj = jnp.sqrt(d)                  # NaN on non-PD, 0 -> inf/nan
        col = jnp.where(jnp.asarray(rows >= j), v / ljj[..., None], 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def _cho_solve_unrolled(chol, v):
    """Solve L L^T x = v given lower L, unrolled for small static n."""
    n = chol.shape[-1]
    ys = []
    for j in range(n):
        t = v[..., j]
        for k in range(j):
            t = t - chol[..., j, k] * ys[k]
        ys.append(t / chol[..., j, j])
    xs = [None] * n
    for j in range(n - 1, -1, -1):
        t = ys[j]
        for i in range(j + 1, n):
            t = t - chol[..., i, j] * xs[i]
        xs[j] = t / chol[..., j, j]
    return jnp.stack(xs, axis=-1)


def chol_solve_logdet(m, v, ridge_rel=1e-10):
    """Solve m a = v for SPD m; return (a, log det m).

    Includes one in-graph ridge retry for numerically non-PD inputs
    (the analogue of the reference's Cholesky->SVD fallback).
    Batched: m (..., n, n), v (..., n) — the ridge retry is applied
    per instance.

    The retry pass is elided when the relative ridge is below the
    working dtype's epsilon (e.g. the 1e-10 default in float32): the
    perturbed diagonal then rounds back to the original bit pattern,
    so the second factorization is identical by construction.
    """
    n = m.shape[-1]
    small = n <= _UNROLL_MAX_N
    chol_fn = _cholesky_unrolled if small else jnp.linalg.cholesky
    chol = chol_fn(m)
    if ridge_rel > float(jnp.finfo(m.dtype).eps):
        eye = jnp.eye(n, dtype=m.dtype)
        ok1 = jnp.isfinite(chol).all(axis=(-2, -1))
        scale = jnp.trace(m, axis1=-2, axis2=-1) / n
        chol2 = chol_fn(m + (ridge_rel * scale)[..., None, None] * eye)
        chol = jnp.where(ok1[..., None, None], chol, chol2)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    if small:
        a = _cho_solve_unrolled(chol, v)
    else:
        a = jax.scipy.linalg.cho_solve((chol, True), v[..., None])[..., 0]
    return a, logdet


def basis_products(polys):
    """Static (npoly^2, npix) matrix of pairwise basis products.

    Row (p*npoly+q) is polys[p] * polys[q].  With it, the normal
    matrices of a whole batch of trials become ONE well-shaped matmul
    (npix-contraction, (T, npoly^2) output) instead of T tiny
    (npoly, npix) x (npix, npoly) products whose 10x10 outputs pad to
    128x128 MXU tiles (<1% utilization)."""
    npoly = polys.shape[0]
    prod = polys[:, None, :] * polys[None, :, :]
    return prod.reshape(npoly * npoly, polys.shape[1])


def chisq_continuum_marg_batch(dvec, templ_over_espec, polys, polys_prod,
                               log_espec_sum, solve_dtype=None,
                               with_coeffs=False):
    """Batched continuum-marginalized -2 log L — (T, npix) trials.

    Same math and residual-form stability as
    :func:`chisq_continuum_marg`, restructured for the MXU: with
    w = (t/s)^2 the normal matrices are M = w @ polys_prod^T
    ((T, npix) x (npix, npoly^2) — one large matmul), the projections
    V = (d*t/s) @ polys^T, and the residual uses the regrouping
    d - (a @ polys) * t/s so every matmul contracts over npix with a
    batch-sized output dimension.

    dvec : (npix,) or (T, npix); templ_over_espec : (T, npix);
    polys : (npoly, npix); polys_prod : (npoly^2, npix) from
    :func:`basis_products`; log_espec_sum : scalar.
    Returns (T,) chisq [and (T, npoly) coeffs].
    """
    dt = templ_over_espec.dtype
    npoly = polys.shape[0]
    from rvspecfit_tpu.ops.prec import matmul_precision
    hp = matmul_precision('chisq')
    scale = jnp.max(jnp.abs(templ_over_espec), axis=-1, keepdims=True)
    scale = jnp.maximum(scale, jnp.finfo(dt).tiny)
    tnorm = templ_over_espec / scale                       # (T, npix)

    w = tnorm * tnorm
    m = jnp.dot(w, polys_prod.T, preferred_element_type=dt,
                precision=hp).reshape(w.shape[:-1] + (npoly, npoly))
    dv = dvec if dvec.ndim == tnorm.ndim else dvec[None, :]
    v = jnp.dot(dv * tnorm, polys.T, preferred_element_type=dt,
                precision=hp)                              # (T, npoly)

    if solve_dtype is not None:
        a, logdet = chol_solve_logdet(m.astype(solve_dtype),
                                      v.astype(solve_dtype))
        a = a.astype(dt)
        logdet = logdet.astype(dt)
    else:
        a, logdet = chol_solve_logdet(m, v)

    # residual form, regrouped: d - (a @ polys) * tnorm
    cont = jnp.dot(a, polys, preferred_element_type=dt,
                   precision=hp)                           # (T, npix)
    resid = dv - cont * tnorm
    chisq = (logdet + 2.0 * npoly * jnp.log(scale[..., 0])
             + 2.0 * log_espec_sum
             + jnp.sum(resid * resid, axis=-1))
    if with_coeffs:
        return chisq, a / scale
    return chisq


def chisq_continuum_marg(dvec, templ_over_espec, polys, log_espec_sum,
                         solve_dtype=None, with_coeffs=False):
    """Continuum-marginalized -2 log L for one dataset and one template.

    Parameters
    ----------
    dvec : (npix,) spec / espec  (static per dataset)
    templ_over_espec : (npix,) template / espec (per trial)
    polys : (npoly, npix) continuum basis (static per dataset)
    log_espec_sum : scalar, sum(log espec) (static per dataset)
    solve_dtype : optional dtype for the tiny normal-matrix solve
        (float64 recommended on float32 runs)
    with_coeffs : also return continuum coefficients a (npoly,)

    Returns
    -------
    chisq : scalar -2 log L (up to the constant chosen by the
        reference convention), same dtype as inputs
    coeffs : (npoly,), only if with_coeffs
    """
    dt = dvec.dtype
    npoly = polys.shape[0]
    # Exact scale normalization: working with t/s keeps the normal
    # matrix O(npix) regardless of flux units (raw template/espec can
    # reach ~1e18, whose square overflows float32), and chi-square is
    # corrected analytically by the marginalization volume term
    # 2*npoly*log(s).
    # max-abs (not RMS): the sum of squares itself can overflow f32.
    scale = jnp.max(jnp.abs(templ_over_espec))
    scale = jnp.maximum(scale, jnp.finfo(dt).tiny)
    tnorm = templ_over_espec / scale

    st = polys * tnorm[None, :]                            # (npoly, npix)
    # HIGHEST matmul precision: TPU MXU defaults to bfloat16 inputs,
    # which injects O(1e-3) relative noise into the normal matrix and
    # O(10) absolute noise into chi^2 — fatal for velocity refinement
    from rvspecfit_tpu.ops.prec import matmul_precision
    hp = matmul_precision('chisq')
    m = jnp.dot(st, st.T, preferred_element_type=dt, precision=hp)
    v = jnp.dot(st, dvec, preferred_element_type=dt, precision=hp)

    if solve_dtype is not None:
        a, logdet = chol_solve_logdet(m.astype(solve_dtype),
                                      v.astype(solve_dtype))
        a = a.astype(dt)
        logdet = logdet.astype(dt)
    else:
        a, logdet = chol_solve_logdet(m, v)

    resid = dvec - jnp.dot(a, st, preferred_element_type=dt,
                           precision=hp)
    chisq = (logdet + 2.0 * npoly * jnp.log(scale) + 2.0 * log_espec_sum
             + jnp.dot(resid, resid, precision=hp))
    if with_coeffs:
        return chisq, a / scale
    return chisq
