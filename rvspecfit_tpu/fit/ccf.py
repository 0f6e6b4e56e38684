"""FFT cross-correlation initial-guess fitter.

Equivalent of the reference fitter_ccf
(reference: py/rvspecfit/fitter_ccf.py:62-253), TPU-native: the whole
template bank's FFTs live on the device and every template is
correlated against the observed spectrum in ONE batched
rfft-multiply-irfft program per arm (the reference loops over chunks
of 256 templates in numpy).  Per-velocity chi-square:

    continuum mode:     chi2(v) = -2 C0(v) + C1(v)
    no-continuum mode:  chi2(v) = -C0(v)^2 / C1(v)

with C0 = corr(T_fft, F[spec * ivar]), C1 = corr(T2_fft, F[ivar]),
where corr evaluates the circular cross-correlation DIRECTLY at the
(fractional) lags of the common velocity grid as two MXU matmuls
contracted over frequency (see _corr_at_lags) — band-limited-exact
at every grid velocity, no full-length irfft, no interpolation.
Arm contributions are summed across arms on device; only the argmin
and the small best-row come back to the host.
"""
from __future__ import annotations

import functools
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu import serializer
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.ops import pallas_ccf
from rvspecfit_tpu.pipeline import make_ccf

C_KMS = 299792.458


class CCFCache:
    """Process-wide cache of loaded CCF template banks."""
    data = {}


# sticky fallback flag: set when the Pallas kernel fails at runtime
_PALLAS_STATE = {}


def get_ccf_info(spec_setup, config):
    """Load (cached) CCF artifacts for one setup
    (reference: fitter_ccf.py:21-59)."""
    lib = config['template_lib']
    continuum = config.get('ccf_continuum_normalize')
    if continuum is None:
        continuum = True
    key = (os.path.abspath(lib), spec_setup, continuum)
    if key not in CCFCache.data:
        info = serializer.load_dict_from_hdf5(os.path.join(
            lib, make_ccf.get_ccf_info_name(spec_setup, continuum)))
        dat = np.load(os.path.join(
            lib, make_ccf.get_ccf_dat_name(spec_setup, continuum)),
            mmap_mode='r')
        mods = np.load(os.path.join(
            lib, make_ccf.get_ccf_mod_name(spec_setup, continuum)),
            mmap_mode='r')
        # device-resident template bank, shipped as stacked
        # (real, imag) FLOAT arrays and combined into complex inside
        # the jitted programs: complex host->device transfers wedge
        # some TPU runtimes (axon), float transfers never do
        fdtype = jnp.zeros(0).dtype
        pack = lambda c: jnp.asarray(np.stack(
            [np.asarray(c).real, np.asarray(c).imag]).astype(fdtype))
        CCFCache.data[key] = dict(info=info, fft=pack(dat['fft']),
                                  fft2=pack(dat['fft2']), models=mods)
    e = CCFCache.data[key]
    return e['fft'], e['fft2'], e['models'], e['info']


def _corr_at_lags(afft, bfft, ecos, esin):
    """Circular cross-correlation irfft(a * b) evaluated at the
    (possibly fractional) lags encoded in the DFT matrices, for a
    whole batch: afft (2, T, F) x bfft (2, B, F) stacked real/imag ->
    (B, T, V).

    Instead of irfft over all npoints lags followed by linear
    interpolation onto the velocity grid (the v1 design — O(B*T*N)
    HBM traffic for N=8192 when only ~400 velocity lags are wanted),
    the correlation is evaluated directly at the velocity-grid lags
    as two MXU matmuls contracted over frequency.  Fractional lags
    are exact (band-limited/sinc interpolation — strictly more
    accurate than the v1 linear interpolation between integer lags).
    All arithmetic is real: complex never materializes (complex
    device buffers wedge the axon runtime).
    """
    from rvspecfit_tpu.ops.prec import matmul_precision
    hp = matmul_precision('ccf')
    ar, ai = afft[0], afft[1]
    br, bi = bfft[0], bfft[1]
    pr = ar[None, :, :] * br[:, None, :] - ai[None, :, :] * bi[:, None, :]
    pi = ar[None, :, :] * bi[:, None, :] + ai[None, :, :] * br[:, None, :]
    return (jnp.dot(pr, ecos, precision=hp)
            - jnp.dot(pi, esin, precision=hp))


@jax.jit
def _ccf_chisq_continuum(tfft, t2fft, sfft_conj, ivfft_conj, ecos, esin):
    c0 = _corr_at_lags(tfft, sfft_conj[:, None, :], ecos, esin)[0]
    c1 = _corr_at_lags(t2fft, ivfft_conj[:, None, :], ecos, esin)[0]
    return -2.0 * c0 + c1


@jax.jit
def _ccf_chisq_nocont(tfft, t2fft, sfft_conj, ivfft_conj, ecos, esin):
    c0 = _corr_at_lags(tfft, sfft_conj[:, None, :], ecos, esin)[0]
    c1 = _corr_at_lags(t2fft, ivfft_conj[:, None, :], ecos, esin)[0]
    return -(c0 * c0) / c1


@functools.lru_cache(maxsize=32)
def _dft_mats_cached(npoints, logl0, logl1, vel_key, dtype_str):
    """Host-precomputed (F, V) cos/sin DFT matrices that evaluate the
    circular cross-correlation at the fractional lags of the common
    velocity grid (velocity v <-> lag -v/step, per the _vel_axis
    convention; irfft normalization and Hermitian doubling folded in).
    """
    vel_grid = np.asarray(vel_key, np.float64)
    step = (np.exp((logl1 - logl0) / npoints) - 1) * 3e5
    lags = -vel_grid / step
    k = np.arange(npoints // 2 + 1, dtype=np.float64)
    ang = (2.0 * np.pi / npoints) * np.outer(k, lags)
    wk = np.full(len(k), 2.0)
    wk[0] = 1.0
    if npoints % 2 == 0:
        wk[-1] = 1.0
    ecos = (wk[:, None] * np.cos(ang) / npoints).astype(dtype_str)
    esin = (wk[:, None] * np.sin(ang) / npoints).astype(dtype_str)
    return jnp.asarray(ecos), jnp.asarray(esin)


def _dft_mats(ccfconf, vel_grid):
    dtype_str = str(jnp.zeros(0).dtype)
    return _dft_mats_cached(int(ccfconf['npoints']),
                            float(ccfconf['logl0']),
                            float(ccfconf['logl1']),
                            tuple(np.asarray(vel_grid, np.float64)),
                            dtype_str)


def _vel_axis(ccfconf, npoints_spec, maxvel):
    """Velocity bookkeeping of the circular CCF
    (reference: fitter_ccf.py:132-154): returns (indices into the
    irfft axis ordered from negative to positive velocity, their
    velocities, the velocity step)."""
    logl0, logl1 = ccfconf['logl0'], ccfconf['logl1']
    npoints = ccfconf['npoints']
    step = (np.exp((logl1 - logl0) / npoints) - 1) * 3e5
    off = npoints_spec // 2
    vels = -((np.arange(npoints_spec) + off) % npoints_spec - off) * step
    ind = np.abs(vels) < (maxvel + step)
    if ind.sum() % 2 != 1:
        raise RuntimeError('CCF velocity window must be odd')
    ind = np.roll(np.nonzero(ind)[0], ind.sum() // 2)[::-1]
    sub = vels[ind]
    if not np.all(np.diff(sub) > 0):
        raise RuntimeError('Invalid CCF velocity grid')
    return ind, sub, step


@jax.jit
def _ccf_batch_cont(tfft, t2fft, sfft_conj, ivfft_conj, ecos, esin):
    """(2,T,F) bank x (2,B,F) exposure (stacked real/imag) ->
    (B,T,nvel) chi2 contributions."""
    c0 = _corr_at_lags(tfft, sfft_conj, ecos, esin)
    c1 = _corr_at_lags(t2fft, ivfft_conj, ecos, esin)
    return -2.0 * c0 + c1


@jax.jit
def _ccf_batch_nocont(tfft, t2fft, sfft_conj, ivfft_conj, ecos, esin):
    c0 = _corr_at_lags(tfft, sfft_conj, ecos, esin)
    c1 = _corr_at_lags(t2fft, ivfft_conj, ecos, esin)
    return -(c0 * c0) / c1


@functools.partial(jax.jit, static_argnames=('mb',))
def _slice_fibers(x, i0, mb):
    """Device slice of an (2, B, F) packed-FFT array along fibers —
    traced start, so every tile reuses one compiled program."""
    return jax.lax.dynamic_slice_in_dim(x, i0, mb, axis=1)


@functools.partial(jax.jit, static_argnames=('mb',))
def _pad_fibers(x, mb):
    return jnp.pad(x, ((0, 0), (0, mb - x.shape[1]), (0, 0)))


@jax.jit
def _ccf_reduce(chis, vel_grid):
    """Per-fiber best template + parabola-refined velocity.

    chis : (B, T, nvel) summed arm contributions; vel_grid uniform.
    Returns (best_id (B,), best_vel (B,), best_chi (B,), best_row
    (B, nvel) — the best template's CCF curve)."""
    nvel = chis.shape[2]
    tmin = jnp.min(chis, axis=2)                      # (B, T)
    tid = jnp.argmin(tmin, axis=1)                    # (B,)
    row = jnp.take_along_axis(
        chis, tid[:, None, None], axis=1)[:, 0, :]    # (B, nvel)
    pix = jnp.argmin(row, axis=1)
    pixc = jnp.clip(pix, 1, nvel - 2)
    take = lambda off: jnp.take_along_axis(
        row, (pixc + off)[:, None], axis=1)[:, 0]
    y0, y1, y2 = take(-1), take(0), take(1)
    a2 = y0 - 2 * y1 + y2
    dv = vel_grid[1] - vel_grid[0]
    refined = vel_grid[pixc] + jnp.where(a2 > 0,
                                         0.5 * (y0 - y2) / a2 * dv, 0.0)
    interior = (pix > 0) & (pix < nvel - 1)
    best_vel = jnp.where(interior, refined, vel_grid[pix])
    best_chi = jnp.take_along_axis(row, pix[:, None], axis=1)[:, 0]
    return tid, best_vel, best_chi, row


def prepare_arm_batch(setup, lam, fluxes, especs, badmask, config,
                      banks=None):
    """Host-side per-arm preparation of a stacked exposure for the
    batched CCF: preprocess all fibers at once (batched robust
    continuum), FFT, and precompute the velocity-grid gather.

    Returns a dict consumed by fit_batch."""
    maxvel = config.get('max_vel') or 1000
    if banks is not None and setup in banks:
        tfft, t2fft, info = banks[setup]
        # ship as stacked real/imag floats (complex transfers wedge
        # some TPU runtimes); complex is reassembled in-graph
        fdtype = jnp.zeros(0).dtype
        pack = lambda c: jnp.asarray(np.stack(
            [np.asarray(c).real, np.asarray(c).imag]).astype(fdtype))
        tfft = pack(tfft)
        t2fft = pack(t2fft)
        models = None
    else:
        tfft, t2fft, models, info = get_ccf_info(setup, config)
    ccfconf = info['ccfconf']

    from rvspecfit_tpu.ops import continuum as continuum_mod
    import time as _time
    _t0 = _time.time()
    # device-resident preprocess + rfft: one program per arm whose
    # packed conjugate FFT outputs stay on device — the previous
    # host-side chain shipped ~100 MB of spectrum FFTs per 500-fiber
    # exposure over the (slow) host->device link every call
    sfft_conj, ivfft_conj, sse = continuum_mod.preprocess_fft_batch(
        lam, np.atleast_2d(fluxes), np.atleast_2d(especs),
        badmask=badmask, ccfconf=ccfconf)
    logging.debug('ccf prepare_arm_batch %s: preprocess+fft %.2fs '
                  '(dispatch)', setup, _time.time() - _t0)

    nvelgrid = 2 * int(maxvel / (config.get('vel_step0') or 2)) + 1
    vel_grid = np.linspace(-maxvel, maxvel, nvelgrid)
    step = (np.exp((ccfconf['logl1'] - ccfconf['logl0'])
                   / ccfconf['npoints']) - 1) * 3e5
    ecos, esin = _dft_mats(ccfconf, vel_grid)
    return dict(setup=setup, info=info, models=models, velstep=step,
                tfft=tfft, t2fft=t2fft, sfft_conj=sfft_conj,
                ivfft_conj=ivfft_conj, sse=sse,
                vel_grid=vel_grid, ecos=ecos, esin=esin,
                continuum=bool(ccfconf['continuum']))


def fit_batch_async(arm_batches, config, banks=None, microbatch=None):
    """Dispatch the fiber-batched CCF NOW, fetch later.

    Returns a ``collect()`` closure producing :func:`fit_batch`'s
    result dict.  The exposure's arm FFTs and every correlation tile
    are enqueued on the device before this function returns, so the
    caller can overlap this CCF's device work with other host-driven
    stages — the driver dispatches file N+1's CCF while file N's
    (dispatch-latency-bound) Nelder-Mead rounds run, reclaiming the
    device's idle gaps (VERDICT r4 next #1; the host half of the
    reference's per-node worker-pool overlap, desi_fit.py:1471-1481).

    Failure semantics match fit_batch: a Pallas runtime failure
    (dispatch- or fetch-time) falls back to the XLA formulation once,
    re-dispatching the tiles.

    The TPU-native replacement for the reference's per-fiber CCF
    process pool (reference: py/rvspecfit/desi_fit.py:1215-1218 +
    fitter_ccf.py:62-253): every (fiber x template x velocity)
    chi-square of the exposure is computed in a few batched
    rfft-multiply-irfft device programs, and only per-fiber best
    rows come back to the host.

    Parameters
    ----------
    arm_batches : list of (setup, lam (npix,), fluxes (B, npix),
        especs (B, npix), badmask (B, npix) bool or None) tuples
    banks : optional {setup: (tfft, t2fft, info)} in-memory template
        banks (bypasses the on-disk library; used by bench/synthetic
        runs)
    microbatch : fiber tile size per device program; None (default)
        sizes the tile so each (tile, T, F) correlation intermediate
        holds ~28M elements — the measured on-chip optimum (tile 125
        at T=108, F=2049 runs the 500-fiber CCF in 2.9 s vs 3.6 s for
        one 500-wide tile: past ~100 MB the elementwise product
        intermediates thrash HBM faster than the saved dispatch
        round-trips pay back)

    Returns
    -------
    dict with parnames, best_params (B, ndim), best_vel (B,),
    best_vsini (B,; NaN where the bank template had no rotation),
    best_id (B,), best_chi (B,), vel_grid.
    """
    import time as _time
    _t0 = _time.time()
    prep = [prepare_arm_batch(s, lam, fl, er, bm, config, banks=banks)
            for s, lam, fl, er, bm in arm_batches]
    _t_prep = _time.time() - _t0
    info0 = prep[0]['info']
    for p in prep[1:]:
        cur = p['info']
        if (list(info0['parnames']) != list(cur['parnames'])
                or not np.array_equal(info0['params'], cur['params'])
                or not np.array_equal(info0['vsinis'], cur['vsinis'])):
            raise RuntimeError('CCF template parameters differ between '
                               'setups')
    nf = prep[0]['sfft_conj'].shape[1]
    vel_grid = prep[0]['vel_grid']
    vel_grid_d = jnp.asarray(vel_grid)
    # per-arm sse are async device values: summing on device keeps the
    # whole prep stage non-blocking (fetched once after tile dispatch)
    total_sse_d = prep[0]['sse']
    for p in prep[1:]:
        total_sse_d = total_sse_d + p['sse']

    best_id = np.zeros(nf, dtype=np.int64)
    best_vel = np.zeros(nf)
    best_chi = np.zeros(nf)

    def dispatch():
        """Enqueue every correlation tile; returns (pk, mb, pending).

        Tiles are independent, so their device programs queue
        back-to-back and only one host round-trip latency is paid for
        the whole exposure.  Tail tiles RE-START at nf-mb (overlapping
        fibers recompute identically) instead of padding — the
        exposure FFTs are device-resident, so slices come from one
        traced dynamic-slice program, not host padding.
        """
        pk = False if _PALLAS_STATE.get('failed') \
            else pallas_ccf.use_pallas_ccf()
        mb = microbatch
        if mb is None:
            if pk:
                # the fused kernel has no (tile, T, F) HBM
                # intermediate: one whole-exposure tile minimizes
                # dispatches (the kernel tiles the fiber axis
                # internally)
                mb = max(nf, 32)
            else:
                ntempl = prep[0]['tfft'].shape[1]
                nfreq = prep[0]['tfft'].shape[2]
                budget = 2.8e7  # elements per (tile, T, F) product
                mb = int(budget / max(ntempl * nfreq, 1))
                mb = int(np.clip(mb, 32, max(nf, 32)))
        if nf <= mb:
            starts = [0]
        else:
            starts = list(range(0, nf - mb + 1, mb))
            if starts[-1] + mb < nf:
                starts.append(nf - mb)
        pending = []
        for i0 in starts:
            i1 = min(i0 + mb, nf)
            contributions = None
            for p in prep:
                if nf < mb:
                    sfft_c = _pad_fibers(p['sfft_conj'], mb)
                    ivfft_c = _pad_fibers(p['ivfft_conj'], mb)
                elif mb == nf:
                    sfft_c = p['sfft_conj']
                    ivfft_c = p['ivfft_conj']
                else:
                    sfft_c = _slice_fibers(p['sfft_conj'], i0, mb)
                    ivfft_c = _slice_fibers(p['ivfft_conj'], i0,
                                            mb)
                if pk:
                    # fused product-contraction kernel: the
                    # (tile, T, F) complex-product intermediate
                    # never reaches HBM
                    cur = pallas_ccf.ccf_chisq_pallas(
                        p['tfft'], p['t2fft'], sfft_c, ivfft_c,
                        p['ecos'], p['esin'],
                        continuum=p['continuum'],
                        interpret=(pk == 'interpret'))
                else:
                    fun = _ccf_batch_cont if p['continuum'] \
                        else _ccf_batch_nocont
                    cur = fun(p['tfft'], p['t2fft'], sfft_c,
                              ivfft_c, p['ecos'], p['esin'])
                contributions = cur if contributions is None else \
                    contributions + cur
            pending.append((i0, i1,
                            _ccf_reduce(contributions, vel_grid_d)))
        return pk, mb, pending

    state = {}

    def collect():
        # one retry: if the Pallas kernel fails at runtime (Mosaic
        # lowering on an unexpected backend), the whole tile pass is
        # re-run with the XLA formulation AND its matching tile
        # budget — the kernel's whole-exposure tiles would
        # materialize the (tile, T, F) intermediate the XLA budget
        # exists to prevent
        for _attempt in range(2):
            try:
                if 'pending' not in state:
                    _t1 = _time.time()
                    state['pk'], state['mb'], state['pending'] = \
                        dispatch()
                    state['t_dispatch'] = _time.time() - _t1
                _t2 = _time.time()
                total_sse = np.asarray(total_sse_d, np.float64)
                for i0, i1, (tid, bvel, bchi, _) in state['pending']:
                    n = i1 - i0
                    best_id[i0:i1] = np.asarray(tid)[:n]
                    best_vel[i0:i1] = np.asarray(bvel)[:n]
                    best_chi[i0:i1] = np.asarray(bchi)[:n] \
                        + total_sse[i0:i1]
                logging.debug(
                    'ccf fit_batch timings: prep %.2fs dispatch %.2fs '
                    'fetch %.2fs (pallas=%s, mb=%d)', _t_prep,
                    state.get('t_dispatch', 0.0), _time.time() - _t2,
                    bool(state['pk']), state['mb'])
                break
            except Exception:
                if not state.get('pk') or _attempt:
                    raise
                # safety net: a Pallas failure on an unexpected
                # backend must not take the whole fit down — retry
                # once with the XLA formulation for the rest of the
                # process
                logging.exception('Pallas CCF kernel failed; falling '
                                  'back to the XLA formulation')
                _PALLAS_STATE['failed'] = True
                state.pop('pending', None)

        params = np.asarray(info0['params'])[best_id]      # (B, ndim)
        vsinis = np.asarray(info0['vsinis'], np.float64)[best_id]
        if info0.get('vsini_is_none') is not None:
            none_mask = np.asarray(info0['vsini_is_none'],
                                   bool)[best_id]
            vsinis = np.where(none_mask, np.nan, vsinis)
        if not np.isfinite(best_chi).all():
            bad = ~np.isfinite(best_chi)
            logging.error('Cross-correlation failed for %d fibers',
                          int(bad.sum()))
        return dict(parnames=[str(p) for p in info0['parnames']],
                    best_params=params, best_vel=best_vel,
                    best_vsini=vsinis, best_id=best_id,
                    best_chi=best_chi, vel_grid=vel_grid)

    # eager dispatch (the point of the async form); a Pallas
    # dispatch-time failure falls back to XLA here, matching fit_batch
    try:
        _t1 = _time.time()
        state['pk'], state['mb'], state['pending'] = dispatch()
        state['t_dispatch'] = _time.time() - _t1
    except Exception:
        if _PALLAS_STATE.get('failed') or not pallas_ccf.use_pallas_ccf():
            raise
        logging.exception('Pallas CCF kernel failed at dispatch; '
                          'falling back to the XLA formulation')
        _PALLAS_STATE['failed'] = True
    return collect


def fit_batch(arm_batches, config, banks=None, microbatch=None):
    """Fiber-batched CCF over a whole stacked exposure (synchronous
    form of :func:`fit_batch_async`; see there for the docs)."""
    return fit_batch_async(arm_batches, config, banks=banks,
                           microbatch=microbatch)()


def fit(specdata, config):
    """Cross-correlate the dataset against the template bank; returns
    best template parameters / velocity / vsini / per-arm models
    (reference keys: fitter_ccf.py:246-252)."""
    maxvel = config.get('max_vel') or 1000
    nvelgrid = 2 * int(maxvel / (config.get('vel_step0') or 2)) + 1
    vel_grid = np.linspace(-maxvel, maxvel, nvelgrid)

    if isinstance(specdata, SpecData):
        specdata = [specdata]

    setups = []
    infos = {}
    mods = {}
    velstep = {}
    proc_specs = {}
    total_sse = 0.0
    contributions = None
    for sd in specdata:
        setup = sd.name
        setups.append(setup)
        tfft, t2fft, ccf_mods, info = get_ccf_info(setup, config)
        infos[setup] = info
        mods[setup] = ccf_mods
        ccfconf = info['ccfconf']

        proc_spec, proc_ivar = make_ccf.preprocess_data(
            sd.lam, sd.spec, sd.espec, badmask=sd.badmask,
            ccfconf=ccfconf)
        proc_specs[setup] = proc_spec
        total_sse += float((proc_spec**2 * proc_ivar).sum())

        sfft = np.fft.rfft(proc_spec * proc_ivar)
        ivfft = np.fft.rfft(proc_ivar)
        velstep[setup] = (np.exp((ccfconf['logl1'] - ccfconf['logl0'])
                                 / ccfconf['npoints']) - 1) * 3e5
        ecos, esin = _dft_mats(ccfconf, vel_grid)

        fdtype = np.dtype(str(tfft.dtype))
        fun = _ccf_chisq_continuum if ccfconf['continuum'] else \
            _ccf_chisq_nocont
        pack = lambda c: jnp.asarray(np.stack(
            [np.asarray(c).real, np.asarray(c).imag]).astype(fdtype))
        cur = fun(tfft, t2fft, pack(sfft.conj()), pack(ivfft.conj()),
                  ecos, esin)
        contributions = cur if contributions is None else \
            contributions + cur

    ref = infos[setups[0]]
    for s in setups[1:]:
        cur = infos[s]
        if (list(ref['parnames']) != list(cur['parnames'])
                or not np.array_equal(ref['params'], cur['params'])
                or not np.array_equal(ref['vsinis'], cur['vsinis'])):
            raise RuntimeError('CCF template parameters differ between '
                               'setups')
        if contributions.shape[0] != len(cur['params']):
            raise RuntimeError('CCF template counts differ between setups')

    all_chisqs = np.asarray(contributions) + total_sse
    best_id = int(np.argmin(all_chisqs.min(axis=1)))
    best_ccf = all_chisqs[best_id]
    best_pix = int(np.argmin(best_ccf))
    if best_pix not in (0, len(best_ccf) - 1):
        x = vel_grid[best_pix - 1:best_pix + 2]
        y = best_ccf[best_pix - 1:best_pix + 2]
        a2 = (y[0] - 2 * y[1] + y[2])
        if a2 > 0:
            best_vel = float(x[1] + 0.5 * (y[0] - y[2]) / a2
                             * (x[1] - x[0]))
        else:
            best_vel = float(vel_grid[best_pix])
    else:
        best_vel = float(vel_grid[best_pix])

    if not np.isfinite(all_chisqs[best_id, best_pix]):
        logging.error('Cross-correlation failed')
        raise RuntimeError('Cross-correlation step failed')

    best_model = {}
    for s in setups:
        best_model[s] = np.roll(np.asarray(mods[s][best_id]),
                                int(best_vel / velstep[s]))
    info0 = infos[setups[0]]
    best_par = dict(zip([str(p) for p in info0['parnames']],
                        np.asarray(info0['params'])[best_id]))
    vsini = float(np.asarray(info0['vsinis'])[best_id])
    if info0.get('vsini_is_none') is not None and \
            bool(np.asarray(info0['vsini_is_none'])[best_id]):
        vsini = None
    return dict(best_par=best_par, best_vel=best_vel, best_ccf=best_ccf,
                best_vsini=vsini, best_model=best_model,
                proc_spec=proc_specs, vel_grid=vel_grid)
