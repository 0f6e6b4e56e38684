"""Batched robust continuum fitting + spectrum preprocessing.

Fiber-vectorized re-design of the reference's per-spectrum CCF
preprocessing chain (reference: py/rvspecfit/make_ccf.py:105-152
``get_continuum``, :288-327 ``interp_masker``, :330-414
``preprocess_data``).  The reference fits each spectrum's continuum
with a separate ``scipy.optimize.least_squares(loss='soft_l1')`` call
inside a per-object Python loop — the one remaining serial host stage
of its production path.  Here the whole exposure is fit at once:

* the continuum model is the reference's quadratic interpolating
  spline in log-flux through nodes spaced ``splinestep`` km/s apart —
  a *linear* map ``spline(lam) = Phi @ p`` of the node values, so the
  shared design matrix ``Phi`` is precomputed once per wavelength grid;
* the soft-L1 robust fit runs as a batched iteratively-reweighted
  Gauss-Newton loop under ``jit`` (``lax.fori_loop``): per iteration
  one (B, npix) elementwise block, one fused normal-matrix contraction
  onto the MXU, and a batched (n x n) solve with step-halving — no
  per-fiber Python, no scipy;
* bad-pixel infill is two ``maximum.accumulate`` neighbor scans plus
  one vectorized linear interpolation (B, npix) instead of per-object
  index juggling.

All entry points take stacked (nfibers, npix) arrays; single-spectrum
callers use them with B=1.
"""
from __future__ import annotations

import functools
import logging

import numpy as np
import scipy.interpolate
import jax
import jax.numpy as jnp


def spline_nodes(lam, splinestep):
    """Continuum node positions + bin edges (log-spaced every
    ``splinestep`` km/s; reference make_ccf.py:110-118)."""
    lammin = float(np.min(lam))
    logstep = np.log(1 + splinestep / 3e5)
    n = int(np.ceil(np.log(np.max(lam) / lammin) / logstep))
    nodes = lammin * np.exp(np.arange(n) * logstep)
    edges = lammin * np.exp((-0.5 + np.arange(n + 1)) * logstep)
    return nodes, edges


@functools.lru_cache(maxsize=32)
def _design_matrix_cached(lam_key, nodes_key):
    lam = np.frombuffer(lam_key, dtype=np.float64)
    nodes = np.frombuffer(nodes_key, dtype=np.float64)
    n = len(nodes)
    phi = np.empty((len(lam), n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        spl = scipy.interpolate.UnivariateSpline(nodes, e, s=0, k=2)
        phi[:, j] = spl(lam)
    return phi


def spline_design_matrix(lam, nodes):
    """(npix, nnodes) matrix of the k=2 interpolating spline: column j
    is the spline through unit node values e_j, evaluated at ``lam``.
    Spline interpolation is linear in the node values, so
    ``Phi @ p`` reproduces the reference's
    ``UnivariateSpline(nodes, p, s=0, k=2)(lam)`` exactly."""
    lam = np.ascontiguousarray(lam, np.float64)
    nodes = np.ascontiguousarray(nodes, np.float64)
    return _design_matrix_cached(lam.tobytes(), nodes.tobytes())


def _binned_median(lam, specs, edges):
    """Per-fiber median of ``specs`` in shared wavelength bins.
    specs: (B, npix) -> (B, nbins); empty bins give NaN."""
    lam = np.asarray(lam)
    specs = np.atleast_2d(np.asarray(specs))
    nb = len(edges) - 1
    out = np.full((specs.shape[0], nb), np.nan)
    which = np.searchsorted(edges, lam, side='right') - 1
    for b in range(nb):
        sel = which == b
        if sel.any():
            out[:, b] = np.median(specs[:, sel], axis=1)
    return out


@functools.partial(jax.jit, static_argnames=('niter',))
def _irls_core(phi, specs, especs, p0, niter):
    """Batched soft-L1 Gauss-Newton in log-flux space.

    phi : (npix, n); specs, especs : (B, npix); p0 : (B, n).
    Minimizes sum(rho(r^2)), rho(z) = 2(sqrt(1+z)-1),
    r = (exp(clip(phi@p, -100, 100)) - spec)/espec — the reference's
    objective (make_ccf.py:95-124) — with IRLS weights w = 1/sqrt(1+z),
    a small Levenberg ridge, and per-fiber step halving.
    """
    hp = jax.lax.Precision.HIGHEST
    n = phi.shape[1]

    def cost_and_model(p):
        y = jnp.clip(jnp.einsum('pi,bi->bp', phi, p, precision=hp),
                     -100.0, 100.0)
        model = jnp.exp(y)
        r = (model - specs) / especs
        z = r * r
        cost = 2.0 * jnp.sum(jnp.sqrt(1.0 + z) - 1.0, axis=1)
        return cost, model, r, z

    def body(_, state):
        p, cost = state
        _, model, r, z = cost_and_model(p)
        w = 1.0 / jnp.sqrt(1.0 + z)                     # IRLS weights
        a = model / especs                              # dmodel/dy / espec
        # normal matrix N = Phi^T diag(w a^2) Phi, rhs = -Phi^T (w a r)
        wa2 = w * a * a
        nmat = jnp.einsum('bp,pi,pj->bij', wa2, phi, phi, precision=hp)
        rhs = -jnp.einsum('bp,pi->bi', w * a * r, phi, precision=hp)
        ridge = 1e-10 * jnp.trace(nmat, axis1=1, axis2=2)[:, None] / n \
            + 1e-30
        nmat = nmat + ridge[..., None] * jnp.eye(n, dtype=p.dtype)
        step = jnp.linalg.solve(nmat, rhs[..., None])[..., 0]
        step = jnp.where(jnp.isfinite(step), step, 0.0)

        # step halving: try full/half/quarter, keep the best
        def try_step(frac):
            c, *_ = cost_and_model(p + frac * step)
            return c

        fracs = jnp.asarray([1.0, 0.5, 0.25], dtype=p.dtype)
        costs = jax.vmap(try_step)(fracs)               # (3, B)
        ibest = jnp.argmin(jnp.concatenate(
            [costs, cost[None, :]], axis=0), axis=0)    # (B,)
        frac = jnp.where(ibest < 3, fracs[jnp.minimum(ibest, 2)], 0.0)
        newp = p + frac[:, None] * step
        newcost = jnp.minimum(cost, jnp.min(costs, axis=0))
        return newp, newcost

    cost0, *_ = cost_and_model(p0)
    p, cost = jax.lax.fori_loop(0, niter, body, (p0, cost0))
    return p, cost


def fit_continuum(lam, specs, especs, ccfconf=None, niter=40):
    """Robust smooth continuum for a whole batch of spectra sharing a
    wavelength grid (reference semantics: make_ccf.py:105-152).

    lam : (npix,); specs, especs : (B, npix) or (npix,).
    Returns continuum of the same leading shape as ``specs``.
    """
    single = np.ndim(specs) == 1
    specs = np.atleast_2d(np.asarray(specs, np.float64))
    especs = np.atleast_2d(np.asarray(especs, np.float64))
    lam = np.asarray(lam, np.float64)
    nodes, edges = spline_nodes(lam, ccfconf['splinestep'])
    phi = spline_design_matrix(lam, nodes)

    medspec = np.median(specs, axis=1)
    bad_med = medspec <= 0
    if bad_med.any():
        logging.warning('Spectra with non-positive median: %d',
                        int(bad_med.sum()))
        medspec = np.where(bad_med, np.abs(medspec) + (medspec == 0),
                           medspec)
    binned = _binned_median(lam, specs, edges)
    p0 = np.log(np.maximum(binned, 1e-3 * medspec[:, None]))
    p0 = np.where(np.isfinite(p0), p0, np.log(medspec)[:, None])

    p, _ = _irls_core(jnp.asarray(phi), jnp.asarray(specs),
                      jnp.asarray(especs), jnp.asarray(p0), niter)
    cont = np.exp(np.clip(np.asarray(p) @ phi.T, -100, 100))
    return cont[0] if single else cont


def masked_median(x, good):
    """Per-row median of ``x`` over pixels where ``good`` is True
    (and ``x`` is finite), vectorized with one C sort per row.

    Equivalent to ``np.nanmedian(np.where(good, x, np.nan), axis=1)``
    but ~10x faster: once NaNs are present numpy's nanmedian falls
    back to a per-row ``apply_along_axis`` Python loop, which is real
    wall time on the driver's prep thread (stolen from the
    concurrently-fitting group on small hosts).  Rows with no good
    finite pixels return NaN, matching nanmedian's all-NaN result.

    x, good : (B, npix).  Returns (B,).
    """
    x = np.atleast_2d(np.asarray(x, np.float64))
    good = np.atleast_2d(np.asarray(good, bool))
    filled = np.where(good, x, np.inf)
    filled[~np.isfinite(filled)] = np.inf
    s = np.sort(filled, axis=1)
    n = (s < np.inf).sum(axis=1)
    rows = np.arange(s.shape[0])
    n_c = np.maximum(n, 1)
    med = 0.5 * (s[rows, (n_c - 1) // 2] + s[rows, n_c // 2])
    return np.where(n > 0, med, np.nan)


def infill_bad_pixels(lam, specs, badmask):
    """Replace masked pixels by linear interpolation between the
    nearest good neighbors; edge runs take the nearest good value
    (reference semantics: make_ccf.py:288-327).  Fully-masked rows
    fall back to the input with non-finite values set to 1.

    lam : (npix,); specs, badmask : (B, npix).  Returns (B, npix).
    """
    specs = np.atleast_2d(np.asarray(specs, np.float64))
    badmask = np.atleast_2d(np.asarray(badmask, bool))

    # only rows that actually contain masked pixels pay the scan/
    # gather work below (an exposure arm often has few or none); this
    # runs on the driver's prep thread, so host time here is stolen
    # from the concurrently-fitting group on small hosts
    bad_rows = badmask.any(axis=1)
    if not bad_rows.all():
        out = specs.copy()
        if bad_rows.any():
            out[bad_rows] = infill_bad_pixels(
                lam, specs[bad_rows], badmask[bad_rows])
        return out

    b, npix = specs.shape
    good = ~badmask
    cols = np.arange(npix)

    # nearest good index to the left / right via cumulative scans
    li = np.where(good, cols, -1)
    li = np.maximum.accumulate(li, axis=1)                   # (B, npix)
    ri = np.where(good, cols, npix)
    ri = np.flip(np.minimum.accumulate(np.flip(ri, 1), axis=1), 1)

    li_c = np.clip(li, 0, npix - 1)
    ri_c = np.clip(ri, 0, npix - 1)
    rows = np.arange(b)[:, None]
    sl = specs[rows, li_c]
    sr = specs[rows, ri_c]
    ll = lam[li_c]
    lr = lam[ri_c]
    denom = lr - ll
    with np.errstate(invalid='ignore', divide='ignore'):
        interp = (sl * (lr - lam[None, :]) + sr * (lam[None, :] - ll)) \
            / np.where(denom == 0, 1.0, denom)
    has_l = li >= 0
    has_r = ri <= npix - 1
    filled = np.where(has_l & has_r, np.where(denom == 0, sl, interp),
                      np.where(has_l, sl, sr))
    out = np.where(badmask, filled, specs)

    allbad = ~good.any(axis=1)
    if allbad.any():
        logging.warning('All pixels masked for %d spectra',
                        int(allbad.sum()))
        orig = specs[allbad]
        out[allbad] = np.where(np.isfinite(orig), orig, 1.0)
    return out


def preprocess_batch(lam, specs, especs, badmask=None, ccfconf=None,
                     maxerr=10):
    """Mask / infill / continuum-normalize a stacked exposure and
    resample onto the CCF log-lambda grid with inverse-variance
    propagation (reference semantics: make_ccf.py:330-414), vectorized
    over fibers.

    lam : (npix,) shared grid; specs, especs : (B, npix);
    badmask : (B, npix) bool or None.
    Returns (proc_specs (B, npoints), proc_ivars (B, npoints)).
    """
    import scipy.signal

    lam = np.asarray(lam, np.float64)
    specs = np.atleast_2d(np.asarray(specs, np.float64))
    especs = np.atleast_2d(np.asarray(especs, np.float64))
    b = specs.shape[0]
    if badmask is None:
        badmask = np.zeros(specs.shape, bool)
    else:
        badmask = np.atleast_2d(np.asarray(badmask, bool)).copy()

    ccf_logl = np.linspace(ccfconf['logl0'], ccfconf['logl1'],
                           ccfconf['npoints'])
    ccf_lam = np.exp(ccf_logl)

    filt = scipy.signal.medfilt2d(specs, (1, 11))
    mederr = np.nanmedian(especs, axis=1)
    if ccfconf['continuum']:
        badmask |= (especs > maxerr * mederr[:, None]) | (filt <= 0)
    cesp = np.where(badmask, 1e9 * mederr[:, None], especs)
    cspec = infill_bad_pixels(lam, specs, badmask)
    if ccfconf['continuum']:
        cont = fit_continuum(lam, cspec, cesp, ccfconf=ccfconf)
    else:
        cont = np.ones_like(cspec)
    civar = np.where(badmask, 0.0, 1.0 / cesp**2)
    medv = np.median(cspec, axis=1)
    cont = np.where((medv > 0)[:, None],
                    np.maximum(1e-2 * medv[:, None], cont),
                    np.maximum(cont, 1.0))
    nspec = np.where(badmask, 0.0, specs / cont)
    civar = cont**2 * civar

    # shared-grid linear resampling with ivar propagation
    xind = np.searchsorted(lam, ccf_lam) - 1
    insub = (xind >= 0) & (xind <= len(lam) - 2)
    proc = np.zeros((b, len(ccf_logl)))
    pivar = np.zeros((b, len(ccf_logl)))
    li = xind[insub]
    ri = li + 1
    rw = (ccf_lam[insub] - lam[li]) / (lam[ri] - lam[li])
    lw = 1 - rw
    proc[:, insub] = lw[None, :] * nspec[:, li] + rw[None, :] * nspec[:, ri]
    liv, riv = civar[:, li], civar[:, ri]
    pivar[:, insub] = liv * riv / (
        lw[None, :]**2 * riv + rw[None, :]**2 * liv
        + ((liv * riv) == 0).astype(int))
    return proc, pivar


# ---------------------------------------------------------------------
# Device-resident preprocessing: the same chain as preprocess_batch but
# compiled into ONE jitted program per arm shape whose outputs (packed
# spectrum/ivar FFTs + sum-of-squares) STAY on the device.  Rationale:
# on remote TPU runtimes the measured CCF wall time is dominated by
# host work + host->device transfer of the spectrum FFTs (~100 MB per
# 500-fiber exposure), not by the correlation compute; uploading the
# raw (B, npix) arm instead (~8 MB) and doing medfilt/infill/continuum/
# resample/rfft on device removes both.  Numerics are the exact same
# algorithms (golden-tested against scipy per-object references on the
# f64 CPU rig by tests/test_continuum.py::test_preprocess_fft_*).

def _medfilt11_jnp(specs):
    """scipy.signal.medfilt(x, 11) row-wise: zero-padded width-11
    sliding median as a sort over 11 shifted copies."""
    b, npix = specs.shape
    pad = jnp.pad(specs, ((0, 0), (5, 5)))
    win = jnp.stack([pad[:, k:k + npix] for k in range(11)], axis=-1)
    return jnp.sort(win, axis=-1)[..., 5]


def _infill_jnp(lam, specs, badmask):
    """infill_bad_pixels, jnp (identical semantics; fully-masked rows
    fall back to the input with non-finite values set to 1)."""
    b, npix = specs.shape
    good = ~badmask
    cols = jnp.arange(npix)
    li = jax.lax.cummax(jnp.where(good, cols, -1), axis=1)
    ri = -jax.lax.cummax(
        jnp.where(good, -cols, -npix)[:, ::-1], axis=1)[:, ::-1]
    li_c = jnp.clip(li, 0, npix - 1)
    ri_c = jnp.clip(ri, 0, npix - 1)
    sl = jnp.take_along_axis(specs, li_c, axis=1)
    sr = jnp.take_along_axis(specs, ri_c, axis=1)
    ll = lam[li_c]
    lr = lam[ri_c]
    denom = lr - ll
    interp = (sl * (lr - lam[None, :]) + sr * (lam[None, :] - ll)) \
        / jnp.where(denom == 0, 1.0, denom)
    has_l = li >= 0
    has_r = ri <= npix - 1
    filled = jnp.where(has_l & has_r,
                       jnp.where(denom == 0, sl, interp),
                       jnp.where(has_l, sl, sr))
    out = jnp.where(badmask, filled, specs)
    allbad = ~jnp.any(good, axis=1)
    fallback = jnp.where(jnp.isfinite(specs), specs, 1.0)
    return jnp.where(allbad[:, None], fallback, out)


def _binned_median_jnp(cspec, binidx, bin_lo, bin_hi, bin_empty):
    """Per-fiber median of ``cspec`` within static wavelength bins.

    binidx : (nb, maxw) pixel indices per bin, -1 padded;
    bin_lo/bin_hi : (nb,) static sorted positions of the two middle
    elements (equal when the bin count is odd); bin_empty : (nb,) bool.
    Returns (B, nb) with NaN for empty bins — matching
    _binned_median's output contract.
    """
    gathered = cspec[:, jnp.clip(binidx, 0, cspec.shape[1] - 1)]
    gathered = jnp.where(binidx[None, :, :] < 0, jnp.inf, gathered)
    srt = jnp.sort(gathered, axis=-1)                  # (B, nb, maxw)
    take = lambda pos: jnp.take_along_axis(
        srt, pos[None, :, None], axis=-1)[..., 0]
    med = 0.5 * (take(bin_lo) + take(bin_hi))
    return jnp.where(bin_empty[None, :], jnp.nan, med)


@functools.partial(jax.jit, static_argnames=('continuum', 'niter',
                                             'maxerr'))
def _preprocess_fft_core(specs, especs, badmask, lam, phi,
                         binidx, bin_lo, bin_hi, bin_empty,
                         li, rw, insub, *, continuum, niter, maxerr):
    """Mask -> infill -> robust continuum -> normalize -> log-lambda
    resample -> rfft -> packed conjugate FFTs, all on device.

    li/rw/insub : (npoints,) static resampling gather (left index,
    right weight, in-range mask) precomputed on the host from the arm
    grid; out-of-range entries of li are clipped to valid range and
    masked by ``insub``.
    Returns (sfft_conj (2, B, F), ivfft_conj (2, B, F), sse (B,)).
    """
    mederr = jnp.nanmedian(especs, axis=1)
    if continuum:
        filt = _medfilt11_jnp(specs)
        badmask = badmask | (especs > maxerr * mederr[:, None]) \
            | (filt <= 0)
    cesp = jnp.where(badmask, 1e9 * mederr[:, None], especs)
    cspec = _infill_jnp(lam, specs, badmask)
    if continuum:
        # initial node values: log binned medians (fit_continuum's p0)
        medspec = jnp.median(cspec, axis=1)
        bad_med = medspec <= 0
        medspec = jnp.where(bad_med,
                            jnp.abs(medspec) + (medspec == 0), medspec)
        binned = _binned_median_jnp(cspec, binidx, bin_lo, bin_hi,
                                    bin_empty)
        p0 = jnp.log(jnp.maximum(binned, 1e-3 * medspec[:, None]))
        p0 = jnp.where(jnp.isfinite(p0), p0,
                       jnp.log(medspec)[:, None])
        p, _ = _irls_core(phi, cspec, cesp, p0, niter)
        cont = jnp.exp(jnp.clip(
            jnp.einsum('pi,bi->bp', phi, p,
                       precision=jax.lax.Precision.HIGHEST),
            -100.0, 100.0))
    else:
        cont = jnp.ones_like(cspec)
    civar = jnp.where(badmask, 0.0, 1.0 / cesp**2)
    medv = jnp.median(cspec, axis=1)
    cont = jnp.where((medv > 0)[:, None],
                     jnp.maximum(1e-2 * medv[:, None], cont),
                     jnp.maximum(cont, 1.0))
    nspec = jnp.where(badmask, 0.0, specs / cont)
    civar = cont**2 * civar

    ri = jnp.clip(li + 1, 0, specs.shape[1] - 1)
    lic = jnp.clip(li, 0, specs.shape[1] - 1)
    lw = 1.0 - rw
    proc = insub * (lw[None, :] * nspec[:, lic]
                    + rw[None, :] * nspec[:, ri])
    liv, riv = civar[:, lic], civar[:, ri]
    pivar = insub * (liv * riv / (lw[None, :]**2 * riv
                                  + rw[None, :]**2 * liv
                                  + ((liv * riv) == 0)))

    sse = jnp.sum(proc * proc * pivar, axis=1)
    sfft = jnp.fft.rfft(proc * pivar, axis=1)
    ivfft = jnp.fft.rfft(pivar, axis=1)
    pack_conj = lambda c: jnp.stack([c.real, -c.imag], axis=0)
    return pack_conj(sfft), pack_conj(ivfft), sse


def _resample_aux(lam, ccfconf, dtype):
    ccf_logl = np.linspace(ccfconf['logl0'], ccfconf['logl1'],
                           ccfconf['npoints'])
    ccf_lam = np.exp(ccf_logl)
    xind = np.searchsorted(lam, ccf_lam) - 1
    insub = (xind >= 0) & (xind <= len(lam) - 2)
    lic = np.clip(xind, 0, len(lam) - 2)
    rw = np.where(insub,
                  (ccf_lam - lam[lic]) / (lam[lic + 1] - lam[lic]), 0.0)
    return (jnp.asarray(xind.astype(np.int32)),
            jnp.asarray(rw.astype(dtype)),
            jnp.asarray(insub.astype(dtype)))


def _bin_aux(lam, edges):
    which = np.searchsorted(edges, lam, side='right') - 1
    nb = len(edges) - 1
    counts = np.array([(which == b).sum() for b in range(nb)])
    maxw = max(int(counts.max()), 1)
    binidx = np.full((nb, maxw), -1, np.int64)
    for b in range(nb):
        sel = np.nonzero(which == b)[0]
        binidx[b, :len(sel)] = sel
    lo = np.maximum((counts - 1) // 2, 0)
    hi = np.maximum(counts // 2, 0)
    return (jnp.asarray(binidx.astype(np.int32)),
            jnp.asarray(lo.astype(np.int32)),
            jnp.asarray(hi.astype(np.int32)),
            jnp.asarray(counts == 0))


def preprocess_fft_batch(lam, specs, especs, badmask=None, ccfconf=None,
                         maxerr=10, niter=40):
    """Device-resident preprocess + rfft of one stacked arm.

    Same preprocessing chain as ``preprocess_batch`` followed by the
    CCF's spectrum/ivar rFFTs, compiled into one program whose outputs
    never leave the device: returns (sfft_conj (2, B, F) packed
    real/imag device array, ivfft_conj (2, B, F), sse (B,) device
    array).  Nothing blocks: all three outputs are async device
    values, so successive arms (and the downstream correlation
    programs) queue back-to-back on the device.
    """
    dtype = jnp.zeros(0).dtype
    lam = np.asarray(lam, np.float64)
    specs = np.atleast_2d(np.asarray(specs))
    especs = np.atleast_2d(np.asarray(especs))
    if badmask is None:
        badmask = np.zeros(specs.shape, bool)
    badmask = np.atleast_2d(np.asarray(badmask, bool))

    nodes, edges = spline_nodes(lam, ccfconf['splinestep'])
    phi = spline_design_matrix(lam, nodes)
    binidx, bin_lo, bin_hi, bin_empty = _bin_aux(lam, edges)
    li, rw, insub = _resample_aux(lam, ccfconf, dtype)

    sfft_c, ivfft_c, sse = _preprocess_fft_core(
        jnp.asarray(specs.astype(dtype)),
        jnp.asarray(especs.astype(dtype)),
        jnp.asarray(badmask), jnp.asarray(lam.astype(dtype)),
        jnp.asarray(np.asarray(phi, np.float64).astype(dtype)),
        binidx, bin_lo, bin_hi, bin_empty, li, rw, insub,
        continuum=bool(ccfconf['continuum']), niter=niter,
        maxerr=maxerr)
    return sfft_c, ivfft_c, sse
