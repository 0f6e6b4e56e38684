"""DESI batch-fitting pipeline (rvst_desi_fit).

Equivalent of the reference rvs_desi_fit
(reference: py/rvspecfit/desi/desi_fit.py), TPU-native: instead of a
per-fiber process pool, every selected fiber of a coadd/spectra file
is fitted *simultaneously* through the batched fitter — the fiber
axis is the device batch axis (and, on pods, the mesh data axis).

Per file:
 1. validate + read the B/R/Z arms (flux/ivar/mask/wavelength/
    resolution) and the FIBERMAP;
 2. compute per-fiber S/N; select fibers (fiberstatus, min S/N,
    targetid list, expid range, optional redrock star selection);
 3. build stacked per-arm data with bad-pixel infill, dichroic mask,
    error clamping and optional per-fiber banded resolution matrices
    with template-LSF deconvolution;
 4. per-fiber CCF initialization (device-batched FFT correlation);
 5. batched ML fit: velocity scan -> Nelder-Mead -> velocity
    refinement -> AD Hessian errors -> models;
 6. quality bitmask RVS_WARN; write RVTAB + RVMOD FITS atomically;
    per-file crash isolation; status files; skipexisting.

Differences from the reference, by design: desitarget-based target-
class decoding is not available in this environment (no desitarget
package); selection by target class accepts explicit bitmask values
instead.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time
import traceback

# anti-oversubscription: the fiber axis is the parallel axis here, so
# BLAS/OpenMP threading only thrashes (reference: desi_fit.py:1-3)
os.environ.setdefault('OMP_NUM_THREADS', '1')

import numpy as np

from rvspecfit_tpu import utils, __version__
from rvspecfit_tpu.io import fitsio
from rvspecfit_tpu.fit import ccf as ccf_mod
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.fit.spec_data import SpecData
from rvspecfit_tpu.ops import continuum as continuum_mod
from rvspecfit_tpu.pipeline import library

TABLE_PREFIX = 'rvtab'
MODEL_PREFIX = 'rvmod'

bitmasks = dict(CHISQ_WARN=1, RV_WARN=2, RVERR_WARN=4, PARAM_WARN=8,
                VSINI_WARN=16, BAD_SPECTRUM=32, BAD_HESSIAN=64)

PROC_STATUS_SUCCESS = 'SUCCESS'
PROC_STATUS_FAILURE = 'FAILURE'
PROC_STATUS_EXISTING = 'EXISTING'


def update_process_status_file(status_fname, processed_file, status,
                               nobjects, time_sec, start=False,
                               finished_at=None):
    """Append-only per-file bookkeeping enabling restart
    (reference: desi_fit.py:61-74).  A fifth column records the unix
    time the file's outputs were COMPLETED (deferred writes complete
    during the next group's fit, so completion-time differences — not
    per-file durations, which overlap — are the honest steady-state
    period; bench.py uses them)."""
    if start:
        with open(status_fname, 'w'):
            pass
        if processed_file is None:
            return
    if finished_at is None:
        finished_at = time.time()
    with open(status_fname, 'a') as fp:
        print(f'{processed_file} {status} {nobjects} {time_sec:.2f} '
              f'{finished_at:.3f}', file=fp)


# ------------------- resolution matrix handling -------------------
# Whole-exposure vectorized versions: every function takes stacked
# (B, width, npix) bands, so an exposure's resolution matrices are
# prepared with a handful of array ops (one batched linear solve)
# instead of a per-fiber Python loop.

def _band_torows(mats):
    """dia-convention bands (offsets +w2..-w2, column-indexed) ->
    row-indexed bands.  (..., w, npix) -> (..., w, npix); row k of the
    output multiplies input pixel i + (k - w2) for output pixel i."""
    mats = np.asarray(mats)
    w = mats.shape[-2]
    w2 = w // 2
    out = np.empty_like(mats)
    for k in range(w):
        out[..., w - 1 - k, :] = np.roll(mats[..., k, :], k - w2,
                                         axis=-1)
    return out


def _band_tocolumns(rows):
    """Inverse of :func:`_band_torows`."""
    rows = np.asarray(rows)
    w = rows.shape[-2]
    w2 = w // 2
    out = np.empty_like(rows)
    for k in range(w):
        out[..., k, :] = np.roll(rows[..., w - 1 - k, :], w2 - k,
                                 axis=-1)
    return out


def deconvolve_resolution_matrix(mats, sigma0_angstrom=0.5,
                                 pix_size_angstrom=0.8):
    """Deconvolve the template LSF (sigma0) out of DESI banded
    resolution matrices by solving the band-width-domain Gaussian
    system — for the WHOLE stack at once, one broadcasted
    ``np.linalg.solve`` (reference math: desi_fit.py:694-720).

    mats : (w, npix) or (B, w, npix) dia-convention bands."""
    mats = np.asarray(mats, np.float64)
    single = mats.ndim == 2
    if single:
        mats = mats[None]
    width, npix = mats.shape[-2:]
    sig_pix = sigma0_angstrom / pix_size_angstrom
    xs = np.arange(width)
    gau = np.exp(-0.5 * ((xs[None, :] - xs[:, None]) / sig_pix)**2) \
        / np.sqrt(2 * np.pi) / sig_pix
    w2 = width // 2
    rows = _band_torows(mats)
    # zero the band entries that would reach out of the spectrum
    for i in range(w2):
        rows[:, :w2 - i - 1, i] = 0
        rows[:, w2 + 1 + i:, npix - 1 - i] = 0
    rows1 = np.linalg.solve(np.broadcast_to(gau, (len(mats),) + gau.shape),
                            rows)
    out = _band_tocolumns(rows1)
    return out[0] if single else out


def prepare_resolution_band(mats, pix_size_angstrom=None,
                            sigma0_angstrom=None):
    """Deconvolve + edge-renormalize banded resolutions; returns
    ROW-indexed band data for ops.resolution.BandedMatrix
    (reference edge handling: desi_fit.py:723-748), vectorized over
    the fiber axis.

    mats : (w, npix) or (B, w, npix); returns the same leading shape.
    rows[..., k, i] = M[i, i + (k - w2)] — consumed with offsets
    (k - w2) by fit/batch.py and tests/test_desi_resolution.py."""
    mats = np.asarray(mats, np.float64)
    single = mats.ndim == 2
    if single:
        mats = mats[None]
    dec = deconvolve_resolution_matrix(
        mats, sigma0_angstrom=sigma0_angstrom,
        pix_size_angstrom=pix_size_angstrom)
    width, npix = dec.shape[-2:]
    w2 = width // 2
    rows = _band_torows(dec)
    mult = np.median(rows.sum(axis=1), axis=-1)           # (B,)
    mult = np.where(mult == 0, 1.0, mult)
    for i in range(w2):
        n1 = rows[:, w2 - i:, i].sum(axis=1)
        rows[:, :, i] *= (mult / (n1 + (n1 == 0)))[:, None]
        j = npix - 1 - i
        n2 = rows[:, :w2 + 1 + i, j].sum(axis=1)
        rows[:, :, j] *= (mult / (n2 + (n2 == 0)))[:, None]
    return rows[0] if single else rows


# ------------------------- file reading ---------------------------

def valid_file(fp, setups):
    """Check the file has every needed extension
    (reference: desi_fit.py:225-245)."""
    names = {str(n).upper() for n in fp.names()}
    needed = {'FIBERMAP'}
    for s in setups:
        for kind in ('WAVELENGTH', 'FLUX', 'IVAR', 'MASK'):
            needed.add(f'{s.upper()}_{kind}')
    missing = needed - names
    if missing:
        logging.error('Missing extensions: %s', sorted(missing))
        return False
    return True


def read_data(fp, setups):
    fluxes, ivars, masks, waves, resolutions = {}, {}, {}, {}, {}
    for s in setups:
        su = s.upper()
        fluxes[s] = np.atleast_2d(fp[f'{su}_FLUX'].data)
        ivars[s] = np.atleast_2d(fp[f'{su}_IVAR'].data)
        masks[s] = np.atleast_2d(fp[f'{su}_MASK'].data)
        waves[s] = np.asarray(fp[f'{su}_WAVELENGTH'].data).ravel()
        if f'{su}_RESOLUTION' in fp:
            resolutions[s] = fp[f'{su}_RESOLUTION'].data
        else:
            resolutions[s] = None
    return fluxes, ivars, masks, waves, resolutions


def get_sns(data, ivars, masks):
    """Median per-fiber S/N (reference: desi_fit.py:444-456)."""
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        bad = (ivars <= 0) | (masks > 0)
        xsn = data * np.sqrt(np.where(bad, 0, ivars))
        sns = continuum_mod.masked_median(xsn, ~bad)
        sns[~np.isfinite(sns)] = -1e9
    return sns


def get_sns_from_scores(scores, setups):
    """Per-arm S/N from the SCORES extension when available
    (reference: desi_fit.py:1076-1091); None -> compute from data."""
    if scores is None:
        return None
    for prefix in ('MEDIAN_CALIB_SNR_', 'MEDIAN_COADD_SNR_',
                   'MEDIAN_COADD_FLUX_SNR_'):
        if all(prefix + s.upper() in scores for s in setups):
            return {s: np.asarray(scores[prefix + s.upper()],
                                  np.float64) for s in setups}
    return None


def fiberstatus_select(fibermap):
    """Good-fiberstatus subset (reference: desi_fit.py:524-543)."""
    good_bits = np.array([3, 20], dtype=int)
    good = int(np.sum(1 << good_bits))
    if 'FIBERSTATUS' in fibermap:
        col = fibermap['FIBERSTATUS']
    elif 'COADD_FIBERSTATUS' in fibermap:
        col = fibermap['COADD_FIBERSTATUS']
    else:
        raise RuntimeError('Fiberstatus column not found')
    return (col & good) == col


# Target bit-name tables (public DESI data model / desitarget
# targetmask yamls).  The reference decodes these through the
# desitarget package (reference: desi_fit.py:495-522 filter_fibermap
# via DT.main_cmx_or_sv); that package is not a dependency here, so
# the name tables are embedded per survey phase and the selection
# dispatches on whichever target column the FIBERMAP actually carries
# (CMX_TARGET / SV{1,2,3}_DESI_TARGET / DESI_TARGET — public EDR
# coadds are SV, so main-survey-only decoding would select nothing
# there).  Regex selection (--objtypes 'MWS_.*,STD_.*') matches
# against the active column's names; --objtype_mask remains the
# explicit escape hatch for bits absent from the tables.

# bits desitarget pins at fixed positions across ALL survey phases
_COMMON_TARGET_BITS = {
    'SKY': 32, 'STD_FAINT': 33, 'STD_WD': 34, 'STD_BRIGHT': 35,
    'BAD_SKY': 36, 'SUPP_SKY': 37,
    'NO_TARGET': 57, 'BRIGHT_OBJECT': 58, 'IN_BRIGHT_OBJECT': 59,
    'BGS_ANY': 60, 'MWS_ANY': 61, 'SCND_ANY': 62,
}

DESI_TARGET_BITS = dict(
    LRG=0, ELG=1, QSO=2, LRG_1PASS=3, LRG_2PASS=4,
    ELG_LOP=5, ELG_HIP=6, ELG_VLO=7, **_COMMON_TARGET_BITS)

# SV2/SV3 desi_mask science sub-bits (sv2/sv3_targetmask.yaml)
_SV23_BITS = dict(
    LRG=0, ELG=1, QSO=2, LRG_LOWDENS=3,
    ELG_LOP=5, ELG_HIP=6, ELG_VLO=7, **_COMMON_TARGET_BITS)
# SV1 shares the headline science bits; its experimental sub-bits
# (per-selection LRG/ELG variants) are not embedded — use
# --objtype_mask for those
_SV1_BITS = dict(LRG=0, ELG=1, QSO=2, **_COMMON_TARGET_BITS)
# commissioning: only the pinned convention bits are embedded (the
# CMX-specific SV0_*/MINI_SV_* layout is not stable); anything else
# needs --objtype_mask
_CMX_BITS = dict(_COMMON_TARGET_BITS)

# dispatch priority mirrors desitarget.targets.main_cmx_or_sv:
# commissioning first, then SV, then the main survey
TARGET_COLUMN_TABLES = (
    ('CMX_TARGET', _CMX_BITS),
    ('SV1_DESI_TARGET', _SV1_BITS),
    ('SV2_DESI_TARGET', _SV23_BITS),
    ('SV3_DESI_TARGET', _SV23_BITS),
    ('DESI_TARGET', DESI_TARGET_BITS),
)


def target_column(fibermap, extra_tables=None):
    """(column_name, bit_table) for the target column this FIBERMAP
    carries, or (None, None) when it has none (reference equivalent:
    desitarget.targets.main_cmx_or_sv column resolution).

    ``extra_tables`` ({column: {NAME: bit}}, e.g. from
    load_targetmask_yaml) extends/overrides the embedded table of the
    active column — how SV1 experimental sub-bits and the CMX
    SV0_*/MINI_SV_* layouts get their names without desitarget."""
    for col, table in TARGET_COLUMN_TABLES:
        if col in fibermap:
            if extra_tables and col in extra_tables:
                table = {**table, **extra_tables[col]}
            return col, table
    return None, None


# desitarget yaml section name -> fibermap target column (the "DESI"
# part of each survey phase, the part the reference's filter_fibermap
# matches names against: desi_fit.py:495-521)
_YAML_MASK_COLUMNS = {
    'cmx_mask': 'CMX_TARGET',
    'sv1_desi_mask': 'SV1_DESI_TARGET',
    'sv2_desi_mask': 'SV2_DESI_TARGET',
    'sv3_desi_mask': 'SV3_DESI_TARGET',
    'desi_mask': 'DESI_TARGET',
}


def load_targetmask_yaml(paths):
    """Load desitarget-format targetmask yaml file(s) — e.g. the
    public ``sv1_targetmask.yaml`` / ``cmx_targetmask.yaml`` from the
    desitarget repository — and return {column: {NAME: bit}} tables
    for :func:`target_column`.

    The desitarget schema is ``{<mask_name>: [[NAME, bit, comment,
    extra], ...]}``; only the ``*_desi_mask``/``cmx_mask``/``desi_mask``
    sections map to the fibermap target columns this driver selects on
    (the BGS/MWS/SCND parts are separate columns the reference ignores
    too, desi_fit.py:503-508).
    """
    import yaml
    if isinstance(paths, str):
        paths = [paths]
    out = {}
    for path in paths:
        with open(path) as fp:
            data = yaml.safe_load(fp)
        found = False
        for mask_name, rows in (data or {}).items():
            col = _YAML_MASK_COLUMNS.get(mask_name)
            if col is None or not isinstance(rows, list):
                continue
            table = out.setdefault(col, {})
            for row in rows:
                # desitarget rows are [NAME, bitnum, comment, {...}]
                if isinstance(row, (list, tuple)) and len(row) >= 2:
                    table[str(row[0])] = int(row[1])
            found = found or bool(table)
        if not found:
            raise ValueError(
                f'{path}: no recognized targetmask sections (expected '
                f'one of {sorted(_YAML_MASK_COLUMNS)} in the desitarget '
                'yaml schema)')
    return out


def objtypes_to_mask(objtypes, bit_table=None, column='DESI_TARGET'):
    """Translate object-type regexes into a target-column bitmask.

    Equivalent of the reference's filter_fibermap name matching
    (reference: desi_fit.py:495-522) against the embedded name table
    of the active target column.  Raises if no name matches (a typo
    would otherwise silently select nothing).
    """
    import re
    if bit_table is None:
        bit_table = DESI_TARGET_BITS
    res = [re.compile(o) for o in objtypes]
    mask = 0
    matched = []
    for name, bit in bit_table.items():
        if any(r.match(name) for r in res):
            mask |= (1 << bit)
            matched.append(name)
    if not mask:
        raise ValueError(
            f'no {column} names match objtypes {objtypes}; '
            f'known names: {sorted(bit_table)}. For survey-phase bits '
            'not embedded here (SV1 experimental sub-bits, CMX '
            'SV0_*/MINI_SV_*), pass the public desitarget yaml via '
            '--targetmask_yaml, or give an explicit --objtype_mask.')
    logging.info('objtypes %s -> %s names %s (mask 0x%x)',
                 objtypes, column, matched, mask)
    return mask


def select_fibers_to_fit(fibermap, sns, minsn=None, fit_targetid=None,
                         expid_range=None, zbest_path=None,
                         zbest_select=False, objtype_mask=None,
                         objtypes=None, target_tables=None):
    """Fiber selection (reference: desi_fit.py:546-679; desitarget
    decoding replaced by the embedded name tables — optionally
    extended by --targetmask_yaml — or an explicit bitmask)."""
    n = len(fibermap['TARGETID'])
    sel = np.ones(n, dtype=bool)
    sel &= fiberstatus_select(fibermap)
    if 'OBJTYPE' in fibermap:
        sel &= np.char.strip(fibermap['OBJTYPE'].astype(str)) == 'TGT'
    tcol, ttable = target_column(fibermap, target_tables)
    if objtypes is not None:
        if tcol is None:
            raise RuntimeError(
                'objtypes selection requested but the FIBERMAP carries '
                'no target column (DESI_TARGET / SV*_DESI_TARGET / '
                'CMX_TARGET)')
        objtype_mask = (objtype_mask or 0) | objtypes_to_mask(
            objtypes, ttable, tcol)
    if objtype_mask is not None and tcol is not None:
        sel &= (fibermap[tcol] & objtype_mask) > 0
    if minsn is not None:
        sel &= sns > minsn
    if fit_targetid is not None:
        sel &= np.isin(fibermap['TARGETID'], fit_targetid)
    if expid_range is not None and 'EXPID' in fibermap:
        lo, hi = expid_range
        sel &= (fibermap['EXPID'] >= lo) & (fibermap['EXPID'] <= hi)
    rr = {}
    if zbest_path is not None and os.path.exists(zbest_path):
        zb = fitsio.read(zbest_path)
        ztab = zb['REDSHIFTS'].data if 'REDSHIFTS' in zb else \
            zb['ZBEST'].data
        order = {tid: i for i, tid in enumerate(ztab['TARGETID'])}
        idx = np.array([order.get(t, -1) for t in fibermap['TARGETID']])
        has = idx >= 0
        z = np.where(has, ztab['Z'][np.maximum(idx, 0)], np.nan)
        spectype = np.where(
            has, np.char.strip(ztab['SPECTYPE'].astype(str))[
                np.maximum(idx, 0)], '')
        subtype = np.where(
            has, np.char.strip(ztab.get('SUBTYPE', ztab['SPECTYPE']).astype(
                str))[np.maximum(idx, 0)], '') if 'SUBTYPE' in ztab else \
            np.full(n, '')
        rr = dict(RR_Z=z, RR_SPECTYPE=spectype, RR_SUBTYPE=subtype)
        if zbest_select:
            c_kms = 299792.458
            is_star = (spectype == 'STAR') | (
                np.abs(z * c_kms) < 1500.0)
            sel &= has & is_star
    return sel, rr


# --------------------- per-fiber data assembly --------------------

def interpolate_bad_regions(specs, masks):
    """Linear infill of masked regions from the nearest good
    neighbors, vectorized over the fiber axis (one call per exposure
    instead of a per-fiber/per-region Python loop; same outcome as
    the reference per-region interpolation, desi_fit.py:751-778).

    specs, masks : (npix,) or (B, npix); returns the input shape."""
    specs = np.asarray(specs, np.float64)
    single = specs.ndim == 1
    s2 = np.atleast_2d(specs)
    m2 = np.atleast_2d(np.asarray(masks, bool))
    pix = np.arange(s2.shape[1], dtype=np.float64)
    out = continuum_mod.infill_bad_pixels(pix, s2, m2)
    # fully-masked rows pass through unchanged (reference behavior)
    allbad = m2.all(axis=1)
    out[allbad] = s2[allbad]
    return out[0] if single else out


def build_batch_arms(waves, fluxes, ivars, masks, resolutions, subset,
                     setups, use_resolution_matrix=False,
                     mask_dicroic=True, lsf_sigma0_angstrom=None):
    """Stacked per-arm data for the selected fibers.

    Reference per-fiber logic (desi_fit.py:781-886) vectorized over
    fibers: bad-pixel identification, dichroic mask, linear infill,
    large-error masking, error clamping, optional per-fiber resolution
    bands.  Returns (arms, good_fiber_mask).
    """
    large_error = 1000.0
    minerr_frac = 0.3
    idx = np.nonzero(subset)[0]
    nf = len(idx)
    arms = []
    anygood = np.zeros(nf, dtype=bool)
    for s in setups:
        wave = waves[s]
        flux = np.array(fluxes[s][idx], dtype=np.float64)
        ivar = np.array(ivars[s][idx], dtype=np.float64)
        mask = masks[s][idx] > 0
        baddat = ~np.isfinite(flux + ivar)
        baderr = ivar <= 0
        dicroic = ((wave > 4300) & (wave < 4450))[None, :] if mask_dicroic \
            else np.zeros((1, len(wave)), bool)
        edge_mask = np.zeros(len(wave), bool)
        res_band = None
        if use_resolution_matrix and resolutions[s] is not None:
            dwave = wave[1] - wave[0]
            sig0 = (lsf_sigma0_angstrom or {}).get(s, 0.5)
            res_band = prepare_resolution_band(
                np.asarray(resolutions[s])[idx],
                pix_size_angstrom=dwave, sigma0_angstrom=sig0)
            edge_mask[:5] = True
            edge_mask[-5:] = True
        badall = baddat | mask | baderr | dicroic | edge_mask[None, :]
        badall_interp = baddat | mask | baderr

        flux = np.where(np.isfinite(flux), flux, 0.0)
        medspec = continuum_mod.masked_median(flux, ~badall)
        fallback = np.median(np.abs(flux), axis=1)
        medspec = np.where(np.isfinite(medspec) & (medspec != 0),
                           medspec, fallback)
        medspec = np.where(np.isfinite(medspec) & (medspec != 0),
                           medspec, 1.0)
        ivar = np.where(badall,
                        1.0 / medspec[:, None]**2 / large_error**2, ivar)
        flux = interpolate_bad_regions(flux, badall_interp)
        with np.errstate(divide='ignore'):
            espec = 1.0 / np.sqrt(ivar)
        good = ~badall
        anygood |= good.any(axis=1)
        # clamp too-small errors (reference: desi_fit.py:866-874)
        gmed = continuum_mod.masked_median(espec, good)
        gmed = np.where(np.isfinite(gmed), gmed, 1.0)
        thresh = gmed * minerr_frac
        clamp = (espec < thresh[:, None]) & good
        espec = np.where(clamp, thresh[:, None], espec)
        ivar = 1.0 / espec**2

        arms.append(BatchArm(f'desi_{s}', wave, flux, ivar,
                             badmask=badall, resolution=res_band,
                             setup=f'desi_{s}'))
    return arms, anygood


# -------------------------- warnings ------------------------------

def _bad_edge_check(val, edges, thresh):
    return (val < edges[0] + thresh) or (val > edges[1] - thresh)


def get_rvs_warn_batch(results, config):
    """Vectorized quality bitmask (reference: desi_fit.py:381-430)."""
    nf = len(results['VRAD'])
    warn = np.zeros(nf, dtype=np.int64)
    dchisq = results['CHISQ_C_TOT'] - results['CHISQ_TOT']
    warn |= np.where(dchisq < 50, bitmasks['CHISQ_WARN'], 0)
    rvedge = 5.0
    warn |= np.where(
        (results['VRAD'] < config['min_vel'] + rvedge)
        | (results['VRAD'] > config['max_vel'] - rvedge),
        bitmasks['RV_WARN'], 0)
    warn |= np.where(results['VSINI'] > 100.0, bitmasks['VSINI_WARN'], 0)
    warn |= np.where(results['VRAD_ERR'] > 100.0,
                     bitmasks['RVERR_WARN'], 0)
    warn |= np.where(results['BAD_HESSIAN'], bitmasks['BAD_HESSIAN'], 0)
    for name, edges, thr in (('TEFF', (2300, 15000), 10),
                             ('FEH', (-4, 1), 0.01),
                             ('LOGG', (-0.5, 6.5), 0.01)):
        v = results[name]
        warn |= np.where((v < edges[0] + thr) | (v > edges[1] - thr),
                         bitmasks['PARAM_WARN'], 0)
    return warn


def get_column_desc(setups):
    """RVTAB column (dtype, description, unit) registry
    (reference: desi_fit.py:910-959)."""
    kms = 'km/s'
    desc = {
        'VRAD': (np.float32, 'Radial velocity', kms),
        'VRAD_ERR': (np.float32, 'Radial velocity error', kms),
        'VRAD_SKEW': (np.float32, 'Radial velocity posterior skewness',
                      ''),
        'VRAD_KURT': (np.float32, 'Radial velocity posterior kurtosis',
                      ''),
        'VSINI': (np.float32, 'Stellar rotation velocity', kms),
        'LOGG': (np.float32, 'Log of surface gravity', ''),
        'TEFF': (np.float32, 'Effective temperature', 'K'),
        'FEH': (np.float32, '[Fe/H] from template fitting', ''),
        'ALPHAFE': (np.float32, '[alpha/Fe] from template fitting', ''),
        'LOGG_ERR': (np.float32, 'Log of surface gravity uncertainty',
                     ''),
        'TEFF_ERR': (np.float32, 'Effective temperature uncertainty',
                     'K'),
        'FEH_ERR': (np.float32,
                    '[Fe/H] uncertainty from template fitting', ''),
        'ALPHAFE_ERR': (np.float32,
                        '[alpha/Fe] uncertainty from template fitting',
                        ''),
        'CHISQ_TOT': (np.float64, 'Total chi-square for all arms', ''),
        'NPIX_TOT': (np.float64,
                     'Total number of unmasked pixels fitted', ''),
        'CHISQ_C_TOT': (np.float64, 'Total chi-square for all arms for '
                        'polynomial only fit', ''),
        'CHISQ_CCF': (np.float32, 'Total chi-square from CCF fit', ''),
        'TEFF_CCF': (np.float32, 'Effective temperature from CCF fit',
                     'K'),
        'LOGG_CCF': (np.float32, 'Log of surface gravity from CCF fit',
                     ''),
        'FEH_CCF': (np.float32, '[Fe/H] from CCF fit', ''),
        'ALPHAFE_CCF': (np.float32, '[alpha/Fe] from CCF fit', ''),
        'VSINI_CCF': (np.float32, 'Vsini from CCF fit', kms),
        'VRAD_CCF': (np.float32,
                     'Initial velocity from cross-correlation', kms),
        'TARGETID': (np.int64, 'DESI targetid', ''),
        'EXPID': (np.int64, 'DESI exposure id', ''),
        'SUCCESS': (bool, 'Did we succeed or fail', ''),
        'RVS_WARN': (np.int64, 'RVSpecFit warning flag', ''),
        'RR_Z': (np.float64, 'Redrock redshift', ''),
        'RR_SPECTYPE': (str, 'Redrock spectype', ''),
        'RR_SUBTYPE': (str, 'Redrock spectroscopic subtype', ''),
    }
    for s in setups:
        su = s.upper()
        desc[f'SN_{su}'] = (np.float32, f'Median S/N in the {su} arm',
                            '')
        desc[f'CHISQ_{su}'] = (np.float64,
                               f'Chi-square in the {su} arm', '')
        desc[f'CHISQ_C_{su}'] = (
            np.float64, f'Chi-square in the {su} arm after fitting '
            'continuum only', '')
    return desc


# --------------------------- main fit -----------------------------

# Process-wide fitter cache: compiled programs survive across files.
# Every jitted program in BatchedFitter takes the fiber data as traced
# arguments, so a cached fitter serves a new file via update_arms()
# with ZERO recompiles — without this, each file pays the full
# compile/executable-ingest cost again (minutes per file on
# remote-compile TPU backends).  Keyed by the program-identity
# signature (arm structure, vsini modeling, options); tiny (<= a few
# entries per survey run).
_BF_CACHE = {}


def _get_fitter(arms, templates, config, options, fit_vsini):
    mb = config.get('fit_microbatch')
    if mb is None:
        # quantized tile width: files of different sizes land on a
        # small ladder of widths so their programs are shared (padding
        # waste is bounded at <2x, recompiles at 4 widths total; DESI
        # production files are 500 fibers and take the top rung)
        nf = arms[0].nfibers
        for mb in (64, 128, 256, 500):
            if mb >= nf:
                break
    mb = int(mb)
    key = (tuple((a.name, a.setup, len(a.lam),
                  a.resolution is not None,
                  None if a.resolution is None else
                  np.asarray(a.resolution).shape[1]) for a in arms),
           bool(fit_vsini), mb,
           tuple(sorted((k, v) for k, v in (options or {}).items()
                        if np.isscalar(v) or v is None)))
    bf = _BF_CACHE.get(key)
    if bf is not None:
        try:
            bf.update_arms(arms)
            return bf
        except ValueError as exc:
            logging.info('fitter cache invalidated: %s', exc)
    bf = BatchedFitter(arms, templates, config, options=options,
                       use_vsini=fit_vsini, microbatch=mb)
    # multi-chip hosts: lay the fiber axis over all local devices
    # (the reference's per-node worker pool, desi_fit.py:1471-1481;
    # update_arms keeps the layout across files).  RVST_NO_MESH=1
    # opts out (e.g. to pin other chips to other ranks).
    if os.environ.get('RVST_NO_MESH') != '1':
        from rvspecfit_tpu.parallel import mesh as pmesh
        mesh = pmesh.auto_shard(bf)
        if mesh is not None:
            logging.info('fitter sharded over %d local devices',
                         mesh.devices.size)
    _BF_CACHE[key] = bf
    return bf


def _prepare_one(fname, config, setups=('b', 'r', 'z'), minsn=-1e9,
                 fit_targetid=None, expid_range=None,
                 use_resolution_matrix=False, zbest_path=None,
                 zbest_select=False, objtype_mask=None, objtypes=None,
                 target_tables=None, fitarm=None, prehdus=None):
    """Host-side stage of one file: read, validate, select, stack arms.

    Returns a dict with everything the device stage (_run_group_fit)
    and the writer (_finish_one) need; when nothing is selected the
    dict carries only what _write_empty needs (``nsel == 0``).  The
    prepare/fit/write split is what lets proc_desi_group concatenate
    several files' fibers into ONE device batch.
    """
    if fitarm is not None:
        setups = tuple(s for s in setups if s in fitarm)
        if not setups:
            raise RuntimeError('--fitarm excluded every arm')
    fp = prehdus if prehdus is not None else fitsio.read(fname)
    if not valid_file(fp, setups):
        raise RuntimeError(f'{fname}: invalid file')
    spectrum_header = fp[0].header
    fibermap = fp['FIBERMAP'].data
    scores = fp['SCORES'].data if 'SCORES' in fp else None
    exp_fibermap = fp['EXP_FIBERMAP'].data if 'EXP_FIBERMAP' in fp \
        else None
    fluxes, ivars, masks, waves, resolutions = read_data(fp, setups)
    sns = get_sns_from_scores(scores, setups) or \
        {s: get_sns(fluxes[s], ivars[s], masks[s]) for s in setups}
    sn_max = np.max(np.array([sns[s] for s in setups]), axis=0)

    subset, rr_info = select_fibers_to_fit(
        fibermap, sn_max, minsn=minsn, fit_targetid=fit_targetid,
        expid_range=expid_range, zbest_path=zbest_path,
        zbest_select=zbest_select, objtype_mask=objtype_mask,
        objtypes=objtypes, target_tables=target_tables)
    nsel = int(subset.sum())
    logging.info('%s: selected %d/%d fibers', fname, nsel, len(subset))
    prep = dict(fname=fname, setups=setups, waves=waves,
                spectrum_header=spectrum_header, fibermap=fibermap,
                scores=scores, exp_fibermap=exp_fibermap, sns=sns,
                rr_info=rr_info, zbest_path=zbest_path, nsel=nsel)
    if nsel == 0:
        return prep

    lsf_sigma0 = config.get('lsf_sigma0_angstrom') or {}
    arms, goodmask = build_batch_arms(
        waves, fluxes, ivars, masks, resolutions, subset, setups,
        use_resolution_matrix=use_resolution_matrix,
        lsf_sigma0_angstrom=lsf_sigma0)
    prep.update(arms=arms, goodmask=goodmask,
                idx=np.nonzero(subset)[0])
    return prep


def _ccf_args(arms):
    """Arm tuples consumed by the batched CCF fitter."""
    return [(a.setup, a.lam, a.flux,
             1.0 / np.sqrt(np.maximum(a.ivar, 1e-30)), a.badmask)
            for a in arms]


class _LazyFit:
    """Mapping view over a deferred group fit (run_tail_async).

    The tail stages are already dispatched; the first key access —
    from the deferred-write thread in production — fetches and
    host-finalizes them exactly once (thread-safe).  An error during
    materialization is cached and re-raised on every access, so each
    member file's write path sees the same failure and logs its own
    crash (matching the synchronous path's per-file isolation).
    """

    def __init__(self, collect, base):
        import threading
        self._collect = collect
        self._base = base
        self._val = None
        self._exc = None
        self._lock = threading.Lock()

    def _materialize(self):
        with self._lock:
            if self._exc is not None:
                raise self._exc
            if self._val is None:
                try:
                    t0 = time.time()
                    tail = self._collect()
                    self._val = dict(
                        self._base, ref=tail['ref'],
                        params=tail['params'], vsini=tail['vsini'],
                        errs=tail['errs'], bad_hess=tail['bad_hess'],
                        mods=tail['mods'])
                    logging.debug('deferred tail collected in %.2f s',
                                  time.time() - t0)
                except BaseException as exc:
                    self._exc = exc
                    raise
            return self._val

    def __getitem__(self, key):
        return self._materialize()[key]

    def __contains__(self, key):
        return key in self._materialize()


def _run_group_fit(arms, templates, config, options, ccf_init=True,
                   ccf_collect=None):
    """Device stage over a (possibly multi-file) stacked fiber batch:
    CCF init -> NM -> gradient polish -> velocity refinement -> AD
    Hessian errors -> best-fit models (the reference's per-fiber chain,
    desi_fit.py:226-420).  Returns per-fiber arrays only — no file
    identity — so a concatenated multi-file batch can be sliced back
    apart by _finish_one.

    ``ccf_collect``: an already-dispatched CCF's collect closure
    (ccf.fit_batch_async) — prepare_desi_group dispatches the next
    group's CCF tiles while the current group's (dispatch-latency-
    bound) NM rounds leave the device idle, so by the time this runs
    the correlation results are already computed and collect() only
    fetches (the device half of the reference's per-node worker-pool
    overlap, desi_fit.py:1471-1481).  A collect() failure degrades to
    default start parameters exactly like a synchronous CCF failure.
    """
    nf = arms[0].nfibers
    parnames = templates[arms[0].setup].parnames

    # ---- CCF initialization (or brute-force first guess) ----
    start_params = np.zeros((nf, len(parnames)))
    start_vel = np.zeros(nf)
    start_vsini = np.zeros(nf)
    any_vsini = False
    ccf_cols = {}
    if ccf_init:
        try:
            if ccf_collect is None:
                ccf_collect = ccf_mod.fit_batch_async(_ccf_args(arms),
                                                      config)
            cres = ccf_collect()
            order = [cres['parnames'].index(p) for p in parnames]
            start_params[:] = cres['best_params'][:, order]
            start_vel[:] = cres['best_vel']
            vs = cres['best_vsini']
            has_vs = np.isfinite(vs)
            start_vsini[:] = np.where(has_vs, vs, 0.0)
            any_vsini = bool(has_vs.any())
            bad = ~np.isfinite(cres['best_chi'])
            if bad.any():
                logging.warning('CCF failed for %d fibers', bad.sum())
                start_params[bad] = \
                    [5000.0, 3.0, -1.0, 0.2][:len(parnames)]
                start_vel[bad] = 0.0
            # CCF-stage parameter columns (reference schema:
            # desi_fit.py:349-354)
            name_map = dict(teff='TEFF', logg='LOGG', feh='FEH',
                            alpha='ALPHAFE')
            ccf_cols['CHISQ_CCF'] = cres['best_chi']
            ccf_cols['VSINI_CCF'] = np.where(has_vs, vs, 0.0)
            for j, p in enumerate(parnames):
                ccf_cols[name_map.get(p, p.upper()) + '_CCF'] = \
                    start_params[:, j]
        except Exception as exc:
            logging.warning('batched CCF failed: %s', exc)
            start_params[:] = [5000.0, 3.0, -1.0, 0.2][:len(parnames)]
    else:
        guess = vel_fit.firstguess(
            [SpecData(a.setup, a.lam, a.flux[0],
                      1.0 / np.sqrt(a.ivar[0])) for a in arms],
            config=config, options=options, templates=templates)
        start_params[:] = [guess[p] for p in parnames]
        any_vsini = guess.get('vsini') is not None
        if any_vsini:
            start_vsini[:] = guess['vsini']
    vrad_ccf = start_vel.copy()

    # ---- batched ML fit ----
    # rotation is modeled only when the CCF bank's best templates (or
    # the brute-force first guess) carried vsini — the reference
    # conditions fit_vsini on the CCF result rather than always
    # paying the broadening convolution (desi_fit.py:293-299)
    fit_vsini = bool(any_vsini)
    bf = _get_fitter(arms, templates, config, options, fit_vsini)
    paramDict0 = dict(zip(parnames, start_params.mean(axis=0)))
    if fit_vsini:
        paramDict0['vsini'] = 0.01
    mapper = vel_fit.ParamMapper(
        parnames, paramDict0, [],
        vel_fit.VSiniMapper(config['max_vsini'],
                            config.get('min_vsini') or 0.0)
        if fit_vsini else None, fit_vsini)
    x0 = np.zeros((nf, mapper.nvec))
    x0[:, 0] = start_vel
    if fit_vsini:
        x0[:, 1] = np.clip(start_vsini, 0, config['max_vsini'])
    x0[:, 1 + int(fit_vsini):] = start_params
    # threaded program warm-up: on remote-compile TPU backends every
    # phase's first execution pays a large server-side compile/ingest
    # cost; warming all phases concurrently overlaps those waits
    # (~3.5x faster first-file latency).  Pure overhead on local CPU
    # backends (tests), so gated on the backend by default.
    warm = config.get('pipeline_warm')
    if warm is None:
        import jax
        warm = jax.default_backend() not in ('cpu',)
    if warm and not getattr(bf, '_warmed', False):
        bf.warm(mapper, skip=() if config.get('second_minimizer')
                else ('polish',))
    # per-phase wall timing at DEBUG (reference logs per-file phase
    # timings the same way, desi_fit.py:1018-1298)
    _pt = [time.time()]
    _ph = []

    def _phase(name):
        _pt.append(time.time())
        _ph.append(f'{name}={_pt[-1] - _pt[-2]:.2f}s')

    nmres = bf.run_neldermead(mapper, start_vel, x0=x0)
    xbest, fun_best = nmres['x'], nmres['fun']
    _phase('nm')
    base = dict(converged=nmres['converged'], ccf_cols=ccf_cols,
                vrad_ccf=vrad_ccf, parnames=parnames)
    if os.environ.get('RVST_DEFER_TAIL', '1') != '0':
        # dispatch the whole post-NM device chain without fetching;
        # the deferred-write thread materializes it (collect), so the
        # tail executes inside the next group's NM dispatch gaps
        collect = bf.run_tail_async(
            mapper, xbest, fun=fun_best, parnames=parnames,
            polish=bool(config.get('second_minimizer')))
        _phase('tail_dispatch')
        logging.debug('fit phases: %s', ' '.join(_ph))
        return _LazyFit(collect, base)
    if config.get('second_minimizer'):
        # batched gradient polish (reference default-on BFGS stage,
        # desi_fit.py -> vel_fit.py:653-660)
        pol = bf.run_polish(mapper, xbest, fun0=fun_best)
        xbest, fun_best = pol['x'], pol['fun']
        _phase('polish')
    vel_b, params_b, vsini_b = mapper.unpack_host(xbest)
    ref = bf.refine_velocities(vel_b, params_b, vsinis=vsini_b)
    _phase('refine')
    errs, covars, bad_hess = bf.hessian_errors(
        ref['best_vel'], params_b, vsinis=vsini_b, parnames=parnames)
    _phase('hessian')
    mods = bf.best_models(ref['best_vel'], params_b, vsinis=vsini_b)
    _phase('models')
    logging.debug('fit phases: %s', ' '.join(_ph))
    return dict(ref=ref, params=params_b, vsini=vsini_b, errs=errs,
                bad_hess=bad_hess, mods=mods, **base)


def _finish_one(prep, fit, lo, tab_ofname, mod_ofname, fig_prefix,
                config, arms, doplot=False, cmdline=None,
                templates=None):
    """Assemble one file's rows from its slice [lo, lo+nsel) of a
    (possibly multi-file) group fit and write RVTAB/RVMOD (+ plots)."""
    nf = prep['nsel']
    sl = slice(lo, lo + nf)
    ref = {k: np.asarray(v)[sl] for k, v in fit['ref'].items()}
    mods = {k: {an: np.asarray(v)[sl] for an, v in d.items()}
            for k, d in fit['mods'].items()}
    params_b = np.asarray(fit['params'])[sl]
    vsini_b = np.asarray(fit['vsini'])[sl]
    errs = np.asarray(fit['errs'])[sl]
    parnames = fit['parnames']
    idx = prep['idx']
    sns = prep['sns']
    setups = prep['setups']
    fibermap = prep['fibermap']
    goodmask = prep['goodmask']

    res = {}
    res['VRAD'] = ref['best_vel']
    res['VRAD_ERR'] = ref['vel_err']
    res['VRAD_SKEW'] = ref['skewness']
    res['VRAD_KURT'] = ref['kurtosis']
    res['VSINI'] = vsini_b
    name_map = dict(teff='TEFF', logg='LOGG', feh='FEH', alpha='ALPHAFE')
    for i, p in enumerate(parnames):
        res[name_map.get(p, p.upper())] = params_b[:, i]
        res[name_map.get(p, p.upper()) + '_ERR'] = errs[:, i]
    res['CHISQ_TOT'] = np.sum([mods['chisq'][a.name] for a in arms],
                              axis=0)
    res['CHISQ_C_TOT'] = np.sum([mods['cont_chisq'][a.name]
                                 for a in arms], axis=0)
    res['NPIX_TOT'] = np.sum([mods['npix'][a.name] for a in arms],
                             axis=0).astype(np.float64)
    for s, a in zip(setups, arms):
        res['CHISQ_%s' % s.upper()] = mods['chisq'][a.name]
        res['CHISQ_C_%s' % s.upper()] = mods['cont_chisq'][a.name]
        res['SN_%s' % s.upper()] = sns[s][idx]
    res['VRAD_CCF'] = np.asarray(fit['vrad_ccf'])[sl]
    for k, v in fit['ccf_cols'].items():
        res[k] = np.asarray(v)[sl]
    res['BAD_HESSIAN'] = np.asarray(fit['bad_hess'])[sl]
    res['SUCCESS'] = np.asarray(fit['converged'])[sl] & goodmask
    res['RVS_WARN'] = get_rvs_warn_batch(res, config)
    res['RVS_WARN'] |= np.where(~goodmask, bitmasks['BAD_SPECTRUM'], 0)
    res['TARGETID'] = fibermap['TARGETID'][idx]
    if 'EXPID' in fibermap:
        res['EXPID'] = fibermap['EXPID'][idx]
    for k, v in prep['rr_info'].items():
        res[k] = np.asarray(v)[idx]

    if doplot and fig_prefix:
        for k in range(nf):
            title = ('logg=%.1f teff=%.0f feh=%.1f alpha=%.1f '
                     'V=%.1f+/-%.1f' % (
                         res['LOGG'][k], res['TEFF'][k], res['FEH'][k],
                         res['ALPHAFE'][k], res['VRAD'][k],
                         res['VRAD_ERR'][k]))
            try:
                make_plot([a.lam for a in arms],
                          [a.flux[lo + k] for a in arms],
                          [mods['models'][a.name][k] for a in arms],
                          title, f'{fig_prefix}_{res["TARGETID"][k]}.png')
            except Exception as exc:
                logging.warning('plotting failed: %s', exc)

    _write_outputs(tab_ofname, mod_ofname, res, mods, arms,
                   prep['waves'], fibermap, idx, setups, config,
                   prep['fname'], scores=prep['scores'],
                   exp_fibermap=prep['exp_fibermap'],
                   cmdline=cmdline, templates=templates,
                   spectrum_header=prep['spectrum_header'],
                   zbest_path=prep['zbest_path'])


def proc_desi(fname, tab_ofname, mod_ofname, fig_prefix, config, options,
              setups=('b', 'r', 'z'), minsn=-1e9, fit_targetid=None,
              expid_range=None, ccf_init=True, use_resolution_matrix=False,
              zbest_path=None, zbest_select=False, objtype_mask=None,
              objtypes=None, target_tables=None, npoly=10, doplot=False,
              templates=None, fitarm=None, cmdline=None, prehdus=None,
              defer_finish=False):
    """Fit every selected fiber of one DESI file; write RVTAB/RVMOD.

    ``prehdus``: optionally a pre-read FITS object for ``fname``
    (proc_many's lookahead thread reads the next file while the
    current one is fitting on the device).

    ``defer_finish``: return ``(nsel, finish)`` instead of writing the
    outputs inline — ``finish()`` fetches the best-fit models from the
    device, assembles the rows and writes RVTAB/RVMOD (+ plots).
    proc_many runs it on a writer thread so one file's output I/O
    overlaps the next file's device fit (the device half of the
    reference's process-pool overlap, desi_fit.py:1471-1481).

    Returns the number of fitted objects (0 when nothing selected).
    """
    t0 = time.time()
    prep = _prepare_one(fname, config, setups=setups, minsn=minsn,
                        fit_targetid=fit_targetid,
                        expid_range=expid_range,
                        use_resolution_matrix=use_resolution_matrix,
                        zbest_path=zbest_path, zbest_select=zbest_select,
                        objtype_mask=objtype_mask, objtypes=objtypes,
                        target_tables=target_tables,
                        fitarm=fitarm, prehdus=prehdus)
    if prep['nsel'] == 0:
        def finish_empty():
            _write_empty(tab_ofname, mod_ofname, prep['setups'],
                         prep['waves'], prep['fibermap'],
                         scores=prep['scores'],
                         exp_fibermap=prep['exp_fibermap'], config=config,
                         cmdline=cmdline, templates=templates,
                         spectrum_header=prep['spectrum_header'],
                         zbest_path=prep['zbest_path'])
        # deferred like every other write so it runs on proc_many's
        # writer thread, never concurrently with a previous file's
        # FITS write on this (main) thread
        if defer_finish:
            return 0, finish_empty
        finish_empty()
        return 0
    if templates is None:
        templates = library.load_template_models(
            config, {f'desi_{s}' for s in prep['setups']})
    fit = _run_group_fit(prep['arms'], templates, config, options,
                         ccf_init=ccf_init)

    def finish(templates=templates):
        _finish_one(prep, fit, 0, tab_ofname, mod_ofname, fig_prefix,
                    config, prep['arms'], doplot=doplot,
                    cmdline=cmdline, templates=templates)
        logging.info('%s: fitted %d fibers in %.1f s', fname,
                     prep['nsel'], time.time() - t0)

    if defer_finish:
        return prep['nsel'], finish
    finish()
    return prep['nsel']


def _log_crash(fname, info, throw):
    """Crash-isolation bookkeeping shared by the per-file wrapper and
    the group path (reference: desi_fit.py:1311)."""
    crashfile = 'crash_%d_%d.log' % (os.getpid(), int(time.time()))
    with open(crashfile, 'w') as fp:
        fp.write('File: %s\nInfo: %s\n' % (fname, info))
        fp.write(traceback.format_exc())
    logging.exception('Failed processing %s (crash log %s)', fname,
                      crashfile)
    if throw:
        raise


def _arm_group_key(prep):
    """Program/batch-compatibility key: files whose arms share names,
    wavelength grids and resolution structure may be concatenated into
    one fit batch (and hit the same compiled programs)."""
    import hashlib
    ks = []
    for a in prep['arms']:
        res = a.resolution
        h = hashlib.sha1(
            np.ascontiguousarray(a.lam).tobytes()).hexdigest()[:16]
        ks.append((a.name, a.setup, h,
                   None if res is None else int(np.asarray(res).shape[1])))
    return (tuple(prep['setups']), tuple(ks))


def _concat_arms(arm_lists):
    """Concatenate per-file BatchArm lists along the fiber axis."""
    out = []
    for parts in zip(*arm_lists):
        a0 = parts[0]
        res = None
        if a0.resolution is not None:
            res = np.concatenate(
                [np.asarray(p.resolution) for p in parts], axis=0)
        out.append(BatchArm(
            a0.name, a0.lam,
            np.concatenate([p.flux for p in parts], axis=0),
            np.concatenate([p.ivar for p in parts], axis=0),
            badmask=np.concatenate([p.badmask for p in parts], axis=0),
            resolution=res, setup=a0.setup))
    return out


def proc_desi_group(fnames, tab_ofnames, mod_ofnames, fig_prefixes,
                    config, options, setups=('b', 'r', 'z'), minsn=-1e9,
                    fit_targetid=None, expid_range=None, ccf_init=True,
                    use_resolution_matrix=False, zbest_paths=None,
                    zbest_select=False, objtype_mask=None, objtypes=None,
                    target_tables=None, npoly=10, doplot=False,
                    templates=None, fitarm=None,
                    cmdline=None, prehdus_list=None,
                    throw_exceptions=False, defer_finish=False):
    """Fit several DESI files as ONE device batch (``--coalesce``).

    The fiber batches of compatible files (same arm names, wavelength
    grids and resolution structure — _arm_group_key) are concatenated
    and run through the batched fitter together: NM straggler-
    compaction rounds pack ALL files' unconverged fibers into shared
    tiles, and every pipeline phase pays its host<->device dispatch
    round-trip once per group instead of once per file.  The compiled
    programs are unchanged (fibers are microbatch tiles either way),
    and per-fiber results are bit-identical to per-file runs because
    every program is elementwise over the fiber axis.

    One deliberate semantic difference: whether rotation is modeled
    (fit_vsini) is decided from the CCF result of the whole group,
    not per file (the reference decides per spectrum,
    desi_fit.py:293-299).

    Per-file crash isolation is preserved: a file that fails to read
    or prepare gets a crash log and a None count without sinking its
    group; if a group FIT fails, each member retries independently.

    Returns per-file fitted-object counts (None = failure), aligned
    with ``fnames``.  With ``defer_finish`` returns
    ``(counts, finish)`` instead, where ``finish()`` performs all
    member output writes and returns the final counts — proc_many runs
    it on a writer thread so this group's output I/O overlaps the next
    group's device fit.
    """
    gprep = prepare_desi_group(
        fnames, config, setups=setups, minsn=minsn,
        fit_targetid=fit_targetid, expid_range=expid_range,
        ccf_init=ccf_init, use_resolution_matrix=use_resolution_matrix,
        zbest_paths=zbest_paths, zbest_select=zbest_select,
        objtype_mask=objtype_mask, objtypes=objtypes,
        target_tables=target_tables, fitarm=fitarm,
        prehdus_list=prehdus_list, throw_exceptions=throw_exceptions)
    return fit_desi_group(
        gprep, tab_ofnames, mod_ofnames, fig_prefixes, config, options,
        doplot=doplot, templates=templates, cmdline=cmdline,
        throw_exceptions=throw_exceptions, defer_finish=defer_finish,
        ccf_init=ccf_init)


def prepare_desi_group(fnames, config, setups=('b', 'r', 'z'),
                       minsn=-1e9, fit_targetid=None, expid_range=None,
                       ccf_init=True, use_resolution_matrix=False,
                       zbest_paths=None, zbest_select=False,
                       objtype_mask=None, objtypes=None,
                       target_tables=None, fitarm=None,
                       prehdus_list=None, throw_exceptions=False,
                       dispatch_ccf=True):
    """Host + device-DISPATCH stage of a coalesced group: read/select/
    stack every member file, partition into arm-compatible sub-groups,
    and ENQUEUE each sub-group's CCF correlation tiles on the device
    (ccf.fit_batch_async) without fetching.

    proc_many runs this for group N+1 on a background thread while
    group N's fit occupies the main thread: the CCF's device work
    executes inside the idle gaps of group N's dispatch-latency-bound
    NM rounds, so by the time fit_desi_group(N+1) collects it, the
    correlations are already done (the reference keeps the device busy
    the same way with its per-node worker pool,
    desi_fit.py:1471-1481).  Per-file crash isolation matches
    proc_desi_group: a member that fails to prepare gets a crash log
    and stays None in ``preps``.

    Returns an opaque dict consumed by fit_desi_group.
    """
    n = len(fnames)
    prehdus_list = prehdus_list or [None] * n
    zbest_paths = zbest_paths or [None] * n
    preps = [None] * n
    for i, f in enumerate(fnames):
        try:
            preps[i] = _prepare_one(
                f, config, setups=setups, minsn=minsn,
                fit_targetid=fit_targetid, expid_range=expid_range,
                use_resolution_matrix=use_resolution_matrix,
                zbest_path=zbest_paths[i], zbest_select=zbest_select,
                objtype_mask=objtype_mask, objtypes=objtypes,
                target_tables=target_tables,
                fitarm=fitarm, prehdus=prehdus_list[i])
        except Exception:
            _log_crash(f, 'prepare', throw_exceptions)
    live = [i for i, p in enumerate(preps)
            if p is not None and p['nsel'] > 0]
    groups = {}
    for i in live:
        groups.setdefault(_arm_group_key(preps[i]), []).append(i)
    units = []
    for members in groups.values():
        group_arms = _concat_arms([preps[i]['arms'] for i in members]) \
            if len(members) > 1 else preps[members[0]]['arms']
        ccf_collect = None
        if ccf_init and dispatch_ccf:
            try:
                ccf_collect = ccf_mod.fit_batch_async(
                    _ccf_args(group_arms), config)
            except Exception as exc:
                logging.debug('CCF dispatch failed: %s', exc)

                def ccf_collect(exc=exc):
                    # surfaces in _run_group_fit's CCF except path,
                    # which degrades to default start parameters —
                    # identical to a synchronous CCF failure
                    raise exc
        units.append(dict(members=members, arms=group_arms,
                          ccf=ccf_collect))
    return dict(fnames=list(fnames), preps=preps, units=units)


def fit_desi_group(gprep, tab_ofnames, mod_ofnames, fig_prefixes,
                   config, options, doplot=False, templates=None,
                   cmdline=None, throw_exceptions=False,
                   defer_finish=False, ccf_init=True):
    """Fit + write stage of a coalesced group prepared by
    prepare_desi_group (see proc_desi_group for the semantics of the
    return value and ``defer_finish``)."""
    preps = gprep['preps']
    counts = [None] * len(preps)
    # ALL output writes (including empty files and per-file retries)
    # are deferred into `pending` and run by finish() — with
    # defer_finish that is proc_many's single writer thread, so no
    # FITS/pyplot call ever runs on the main thread concurrently with
    # a previous group's write.
    pending = []          # deferred per-member write closures
    for i, p in enumerate(preps):
        if p is not None and p['nsel'] == 0:
            def write_empty_one(i=i, p=p):
                try:
                    _write_empty(tab_ofnames[i], mod_ofnames[i],
                                 p['setups'], p['waves'], p['fibermap'],
                                 scores=p['scores'],
                                 exp_fibermap=p['exp_fibermap'],
                                 config=config, cmdline=cmdline,
                                 templates=templates,
                                 spectrum_header=p['spectrum_header'],
                                 zbest_path=p['zbest_path'])
                    counts[i] = 0
                except Exception:
                    _log_crash(p['fname'], 'write_empty',
                               throw_exceptions)
            pending.append(write_empty_one)

    def finish():
        for w in pending:
            w()
        return counts

    if not gprep['units']:
        if defer_finish:
            return counts, finish
        return finish()
    if templates is None:
        first_live = gprep['units'][0]['members'][0]
        templates = library.load_template_models(
            config, {f'desi_{s}' for s in preps[first_live]['setups']})

    for unit in gprep['units']:
        members = unit['members']
        group_arms = unit['arms']
        try:
            fit = _run_group_fit(group_arms, templates, config, options,
                                 ccf_init=ccf_init,
                                 ccf_collect=unit['ccf'])
            lo = 0
            for i in members:
                p = preps[i]

                def write_one(i=i, p=p, lo=lo, fit=fit,
                              group_arms=group_arms):
                    try:
                        _finish_one(p, fit, lo, tab_ofnames[i],
                                    mod_ofnames[i], fig_prefixes[i],
                                    config, group_arms, doplot=doplot,
                                    cmdline=cmdline,
                                    templates=templates)
                        counts[i] = p['nsel']
                    except Exception:
                        _log_crash(p['fname'], 'write',
                                   throw_exceptions)
                pending.append(write_one)
                lo += p['nsel']
        except Exception:
            logging.exception('group fit of %d files failed; retrying '
                              'per-file', len(members))
            if throw_exceptions:
                raise
            for i in members:
                p = preps[i]
                try:
                    fit = _run_group_fit(p['arms'], templates, config,
                                         options, ccf_init=ccf_init)
                except Exception:
                    _log_crash(p['fname'], 'per-file retry', False)
                    continue

                def write_retry(i=i, p=p, fit=fit):
                    try:
                        _finish_one(p, fit, 0, tab_ofnames[i],
                                    mod_ofnames[i], fig_prefixes[i],
                                    config, p['arms'], doplot=doplot,
                                    cmdline=cmdline, templates=templates)
                        counts[i] = p['nsel']
                    except Exception:
                        _log_crash(p['fname'], 'write', False)
                pending.append(write_retry)

    if defer_finish:
        return counts, finish
    finish()
    return counts


def make_plot(lam_list, flux_list, model_list, title, fig_fname):
    """Diagnostic plot of data + best-fit models per arm
    (reference: desi_fit.py:159-222)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.figure(figsize=(10, 4), dpi=100)
    for lam, fl, mo in zip(lam_list, flux_list, model_list):
        plt.plot(lam, fl, 'k-', lw=0.5)
        plt.plot(lam, mo, 'r-', lw=0.8)
    plt.title(title, fontsize=8)
    plt.xlabel('Wavelength [A]')
    plt.tight_layout()
    try:
        plt.savefig(fig_fname)
    finally:
        plt.close()


# packages whose versions are stamped into output headers
# (reference: desi_fit.py:45-48 DEPEND_PACKAGES + :77-90)
DEPEND_PACKAGES = ['numpy', 'scipy', 'jax', 'h5py', 'yaml', 'matplotlib']

# input header keywords copied into the output primary header
# (reference: desi_fit.py:141-149)
COPY_HEADER_KEYS = ['SPGRP', 'SPGRPVAL', 'TILEID', 'SPECTRO', 'PETAL',
                    'NIGHT', 'EXPID', 'HPXPIXEL', 'HPXNSIDE', 'HPXNEST']


def _dep_versions():
    ret = {'python': sys.version.split(' ')[0],
           'rvspecfit_tpu': __version__}
    for pkg in DEPEND_PACKAGES:
        try:
            mod = __import__(pkg)
            ret[pkg] = str(getattr(mod, '__version__', ''))
        except ImportError:
            pass
    return ret


def _prim_header(config=None, cmdline=None, templates=None,
                 spectrum_header=None, zbest_path=None):
    """Primary-header provenance cards: dependency versions, template
    library revisions, copied input keywords
    (reference: desi_fit.py:119-156)."""
    cards = [('RVS_VER', __version__, 'rvspecfit_tpu version'),
             ('RVS_DATE', time.strftime('%Y-%m-%dT%H:%M:%S'),
              'processing time')]
    for i, (k, v) in enumerate(_dep_versions().items()):
        cards.append(('DEPNAM%02d' % i, k, 'Software'))
        cards.append(('DEPVER%02d' % i, v, 'Version'))
    if templates:
        for i, (setup, tm) in enumerate(sorted(templates.items())):
            extra = getattr(tm, 'extra', None) or {}
            cards.append(('TMPLCON%d' % i, setup, 'Spec arm config name'))
            cards.append(('TMPLREV%d' % i, extra.get('revision', ''),
                          'Spec template revision'))
            cards.append(('TMPLSVR%d' % i,
                          extra.get('creation_soft_version', ''),
                          'Spec template soft version'))
    if config is not None:
        cards.append(('RVS_CONF', str(config.get('config_file_path', '')),
                      'config path'))
    if cmdline:
        cards.append(('RVS_CMD', cmdline[:60], 'command line'))
    if zbest_path is not None:
        cards.append(('RR_FILE', str(zbest_path),
                      'Redrock redshift file'))
    if spectrum_header is not None:
        for key in COPY_HEADER_KEYS:
            if key in spectrum_header:
                cards.append((key, spectrum_header[key], ''))
    return cards


def _write_empty(tab_ofname, mod_ofname, setups, waves, fibermap,
                 scores=None, exp_fibermap=None, config=None,
                 cmdline=None, templates=None, spectrum_header=None,
                 zbest_path=None):
    """Zero-selection outputs with the FULL column structure, so
    downstream concatenation tools see a uniform schema
    (reference: desi_fit.py:1106-1134)."""
    col_desc = get_column_desc([s.upper() for s in setups])
    cols, units, comments = [], {}, {}
    for k, (dtype, descr, unit) in col_desc.items():
        arr = np.zeros(0, dtype=np.dtype('U8') if dtype is str else dtype)
        cols.append((k, arr))
        comments[k] = descr
        if unit:
            units[k] = unit
    idx0 = np.zeros(0, dtype=int)
    fm_cols = [(k, np.asarray(v)[idx0]) for k, v in fibermap.items()]
    hdr = _prim_header(config, cmdline, templates, spectrum_header,
                       zbest_path)
    hdus = [dict(kind='image', data=None, header=hdr),
            dict(kind='table', data=cols, name='RVTAB', units=units,
                 comments=comments),
            dict(kind='table', data=fm_cols, name='FIBERMAP')]
    if scores is not None:
        hdus.append(dict(kind='table', name='SCORES',
                         data=[(k, np.asarray(v)[idx0])
                               for k, v in scores.items()]))
    if exp_fibermap is not None:
        hdus.append(dict(kind='table', name='EXP_FIBERMAP',
                         data=[(k, np.asarray(v)[idx0])
                               for k, v in exp_fibermap.items()]))
    fitsio.write(tab_ofname, hdus)

    mhdus = [dict(kind='image', data=None, header=hdr)]
    for s in setups:
        mhdus.append(dict(kind='image', data=waves[s].astype(np.float64),
                          name=f'{s.upper()}_WAVELENGTH'))
        mhdus.append(dict(kind='image', data=None,
                          name=f'{s.upper()}_MODEL'))
    fitsio.write(mod_ofname, mhdus)


def _write_outputs(tab_ofname, mod_ofname, res, mods, arms, waves,
                   fibermap, idx, setups, config, src_fname,
                   scores=None, exp_fibermap=None, cmdline=None,
                   templates=None, spectrum_header=None,
                   zbest_path=None):
    # RVTAB with the reference's column dtypes / descriptions / units
    # (reference: desi_fit.py:910-959)
    col_desc = get_column_desc([s.upper() for s in setups])
    drop = {'BAD_HESSIAN'}
    cols, units, comments = [], {}, {}
    for k, v in res.items():
        if k in drop:
            continue
        v = np.asarray(v)
        if v.dtype == object:
            v = v.astype(str)
        if k in col_desc:
            dtype, descr, unit = col_desc[k]
            if dtype is not str and v.dtype.kind not in 'US':
                v = v.astype(dtype)
            comments[k] = descr
            if unit:
                units[k] = unit
        elif v.dtype.kind == 'f':
            v = v.astype(np.float32)
        cols.append((k, v))
    # carry over a useful FIBERMAP subset
    fm_keep = ['TARGETID', 'TARGET_RA', 'TARGET_DEC', 'REF_ID',
               'REF_CAT', 'FIBER', 'DESI_TARGET', 'PMRA', 'PMDEC']
    fm_cols = []
    for k in fm_keep:
        if k in fibermap:
            fm_cols.append((k, np.asarray(fibermap[k])[idx]))
    prim_hdr = _prim_header(config, cmdline, templates, spectrum_header,
                            zbest_path)
    hdus = [dict(kind='image', data=None, header=prim_hdr),
            dict(kind='table', data=cols, name='RVTAB',
                 units=units, comments=comments),
            dict(kind='table', data=fm_cols, name='FIBERMAP')]
    if scores is not None:
        hdus.append(dict(
            kind='table', name='SCORES',
            data=[(k, np.asarray(v)[idx]) for k, v in scores.items()]))
    if exp_fibermap is not None and 'TARGETID' in exp_fibermap:
        sub = np.isin(exp_fibermap['TARGETID'],
                      np.asarray(fibermap['TARGETID'])[idx])
        hdus.append(dict(
            kind='table', name='EXP_FIBERMAP',
            data=[(k, np.asarray(v)[sub])
                  for k, v in exp_fibermap.items()]))
    fitsio.write(tab_ofname, hdus)

    # RVMOD: best-fit model vectors per arm
    mhdus = [dict(kind='image', data=None, header=prim_hdr)]
    for s, a in zip(setups, arms):
        mhdus.append(dict(kind='image', data=waves[s].astype(np.float64),
                          name=f'{s.upper()}_WAVELENGTH'))
        mhdus.append(dict(kind='image',
                          data=mods['models'][a.name].astype(np.float32),
                          name=f'{s.upper()}_MODEL'))
    fitsio.write(mod_ofname, mhdus)


def proc_desi_wrapper(*args, **kwargs):
    """Crash isolation: log + continue (reference: desi_fit.py:1311)."""
    throw = kwargs.pop('throw_exceptions', False)
    try:
        return proc_desi(*args, **kwargs)
    except Exception:
        _log_crash(args[0] if args else '?',
                   'Args: %s %s' % (args, kwargs), throw)
        return None


def proc_many(files, *args, **kwargs):
    """Process a sequence of files (public entry; see _proc_many for
    the full parameter list).  Owns the per-call writer thread pool so
    it is always shut down, and guarantees ``files.shutdown()`` runs
    even when an exception propagates (``--throw_exceptions``)."""
    from concurrent.futures import ThreadPoolExecutor
    wpool = ThreadPoolExecutor(max_workers=1,
                               thread_name_prefix='rvst-writer')
    try:
        return _proc_many(files, *args, _wpool=wpool, **kwargs)
    finally:
        wpool.shutdown(wait=True)
        if hasattr(files, 'shutdown'):
            files.shutdown()


def _proc_many(files, output_dir, output_tab_prefix=TABLE_PREFIX,
               output_mod_prefix=MODEL_PREFIX, config=None, options=None,
               skipexisting=False, status_fname=None, figure_dir=None,
               figure_prefix='fig', coalesce=1, **proc_kwargs):
    """Process a sequence of files (reference: desi_fit.py:1392-1551).

    ``figure_dir``/``figure_prefix``: where diagnostic plots go when
    plotting is enabled (reference: desi_fit.py:1396-1397,1500-1510);
    default is ``output_dir`` with prefix ``fig``.

    ``coalesce``: fit up to this many consecutive compatible files as
    ONE device batch (see proc_desi_group) — amortizes per-phase
    dispatch round-trips and packs all files' NM stragglers into
    shared tiles.  Needs a statically-known file list (queue inputs
    stay serial: claims happen on pop, and early claims widen the
    crash-loss window).  Host memory holds ~2x``coalesce`` files
    (current group + prefetched next group).
    """
    os.makedirs(output_dir, exist_ok=True)
    if status_fname:
        update_process_status_file(status_fname, None, None, 0, 0,
                                   start=True)

    def output_paths(f):
        base = os.path.basename(f)
        for pref in ('coadd-', 'spectra-'):
            if base.startswith(pref):
                base = base[len(pref):]
        base = base.replace('.fits', '')
        return (base,
                os.path.join(output_dir,
                             f'{output_tab_prefix}-{base}.fits'),
                os.path.join(output_dir,
                             f'{output_mod_prefix}-{base}.fits'))

    # one-file lookahead: while file N fits on the device, a reader
    # thread loads file N+1's FITS (the dominant host I/O) — the
    # host-side half of the reference's process-pool overlap (SURVEY
    # "host-side prefetch + pad-to-batch").  Only for statically-known
    # file lists: lock-queue inputs claim work on pop, and an early
    # claim would widen the crash-loss window.
    if isinstance(files, (list, tuple)):
        flist = list(files)
    elif getattr(files, 'queue', True) is False \
            and getattr(files, 'file_list', None) is not None:
        flist = list(files.file_list)          # static FileQueue
    elif getattr(files, 'files', None) is not None:
        flist = list(files.files)              # ShardedFileQueue
    else:
        flist = None
    slot = {}

    # deferred output writes: a single writer thread runs the previous
    # file's (or group's) finish closure — device-result fetch, row
    # assembly, RVTAB/RVMOD writes, plots — while the main thread fits
    # the next one on the device (RVST_ASYNC_WRITE=0 restores strictly
    # serial writes).  One outstanding write at most, drained in
    # submission order, so status-file lines keep the input order and
    # host memory holds at most one extra file's results.
    wpool = proc_kwargs.pop('_wpool')
    throw = bool(proc_kwargs.get('throw_exceptions', False))
    async_write = os.environ.get('RVST_ASYNC_WRITE', '1') != '0'
    wslot = []

    def drain_writer():
        while wslot:
            fut, record = wslot.pop(0)
            try:
                res, dt, ts = fut.result()
            except Exception:
                if throw:
                    raise
                res, dt, ts = None, None, None
            record(res, dt, ts)

    def submit_write(fn, record, t0):
        # per-file wall time AND completion timestamp are captured
        # when the write COMPLETES on the writer thread (not at drain
        # time, by which the next file's fit has already overlapped
        # the deferred write)
        def timed():
            res = fn()
            t1 = time.time()
            return res, t1 - t0, t1
        wslot.append((wpool.submit(timed), record))

    coalesce = max(1, int(coalesce or 1))
    if coalesce > 1 and flist is None:
        logging.info('--coalesce needs a statically-known file list; '
                     'queue inputs stay serial')
        coalesce = 1
    if coalesce > 1:
        import threading
        pfmap = {}

        def prefetch_many(fs):
            for f in fs:
                if f in pfmap:
                    continue
                ev, holder = threading.Event(), {}

                def go(f=f, ev=ev, holder=holder):
                    try:
                        holder['fp'] = fitsio.read(f)
                    except Exception:
                        holder['fp'] = None
                    ev.set()
                threading.Thread(target=go, daemon=True).start()
                pfmap[f] = (ev, holder)

        work = []
        for f in flist:
            t0 = time.time()
            base, tabf, modf = output_paths(f)
            if skipexisting and os.path.exists(tabf) \
                    and os.path.exists(modf):
                logging.info('skipping existing %s', f)
                if status_fname:
                    update_process_status_file(
                        status_fname, f, PROC_STATUS_EXISTING, 0,
                        time.time() - t0)
                continue
            work.append((f, base, tabf, modf))

        kw = dict(proc_kwargs)
        zbest_from_coadd = kw.pop('zbest_from_coadd', False)
        doplot_figs = kw.pop('doplot_figs', False)
        doplot = kw.pop('doplot', False) or doplot_figs
        throw = kw.pop('throw_exceptions', False)
        kw.pop('prehdus', None)
        zbest_path0 = kw.pop('zbest_path', None)
        templates = kw.pop('templates', None)
        if templates is None and config is not None:
            try:
                templates = library.load_template_models(
                    config, {f'desi_{s}'
                             for s in kw.get('setups', ('b', 'r', 'z'))})
            except Exception:
                templates = None
        # split the remaining kwargs between the two group stages
        prep_keys = ('setups', 'minsn', 'fit_targetid', 'expid_range',
                     'ccf_init', 'use_resolution_matrix', 'zbest_select',
                     'objtype_mask', 'objtypes', 'target_tables',
                     'fitarm')
        prep_kw = {k: kw.pop(k) for k in prep_keys if k in kw}
        fit_ccf_init = prep_kw.get('ccf_init', True)
        cmdline = kw.pop('cmdline', None)
        if kw:
            raise TypeError('unexpected proc_many kwargs: %s'
                            % sorted(kw))

        def build_inputs(grp):
            """Pre-read HDUs, redrock paths and figure prefixes for a
            group (waits on the lookahead reader threads)."""
            fnames = [g[0] for g in grp]
            prehdus_list = []
            for f in fnames:
                ev, holder = pfmap.pop(f, (None, None))
                if ev is None:
                    try:
                        prehdus_list.append(fitsio.read(f))
                    except Exception:
                        prehdus_list.append(None)
                else:
                    ev.wait()
                    prehdus_list.append(holder.get('fp'))
            zpaths = []
            for f in fnames:
                zb = zbest_path0
                if zbest_from_coadd:
                    cand = os.path.join(
                        os.path.dirname(f),
                        os.path.basename(f).replace('coadd-',
                                                    'redrock-'))
                    if os.path.exists(cand):
                        zb = cand
                zpaths.append(zb)
            figs = []
            for (f, base, _, _) in grp:
                if doplot_figs:
                    fdir = figure_dir or output_dir
                    os.makedirs(fdir, exist_ok=True)
                    figs.append(os.path.join(
                        fdir, f'{figure_prefix}-{base}'))
                else:
                    figs.append(None)
            return fnames, prehdus_list, zpaths, figs

        def do_prepare(grp):
            fnames, prehdus_list, zpaths, figs = build_inputs(grp)
            gp = prepare_desi_group(
                fnames, config, zbest_paths=zpaths,
                prehdus_list=prehdus_list, throw_exceptions=throw,
                **prep_kw)
            return fnames, figs, gp

        # software pipeline: group N+1's host prep + CCF DISPATCH run
        # on a lookahead thread while group N's fit occupies the main
        # thread, so N+1's correlation tiles execute inside the idle
        # device gaps of N's dispatch-latency-bound NM rounds and its
        # CCF phase collapses to a fetch (RVST_PIPELINE_PREP=0
        # restores strictly serial groups).  Host memory holds up to
        # three groups transiently (fitting + prepped + prefetched
        # reads).
        pipeline = os.environ.get('RVST_PIPELINE_PREP', '1') != '0'

        def spawn_prep(grp):
            holder = dict(key=tuple(g[0] for g in grp),
                          ev=threading.Event())

            def run():
                try:
                    holder['out'] = do_prepare(grp)
                except BaseException as exc:
                    holder['exc'] = exc
                holder['ev'].set()
            threading.Thread(target=run, daemon=True,
                             name='rvst-prep').start()
            return holder

        i = 0
        nxt_prep = None
        while i < len(work):
            grp = work[i:i + coalesce]
            i += len(grp)
            key = tuple(g[0] for g in grp)
            # next group's reads overlap this group's device fit
            prefetch_many([g[0] for g in work[i:i + coalesce]])
            t0 = time.time()
            if nxt_prep is not None and nxt_prep['key'] == key:
                nxt_prep['ev'].wait()
                if 'exc' in nxt_prep:
                    raise nxt_prep['exc']
                fnames, figs, gp = nxt_prep['out']
            else:
                prefetch_many(key)
                fnames, figs, gp = do_prepare(grp)
            nxt_prep = None
            if pipeline and i < len(work):
                # reads for the group after next overlap this fit too
                prefetch_many([g[0] for g in
                               work[i + coalesce:i + 2 * coalesce]])
                nxt_prep = spawn_prep(work[i:i + coalesce])
            out = fit_desi_group(
                gp, [g[2] for g in grp], [g[3] for g in grp], figs,
                config, options or {}, templates=templates,
                doplot=doplot, cmdline=cmdline, throw_exceptions=throw,
                defer_finish=async_write, ccf_init=fit_ccf_init)

            def record(counts, dt=None, ts=None, fnames=fnames, t0=t0,
                       ngrp=len(grp)):
                dt = ((time.time() - t0) if dt is None else dt) / ngrp
                for f, nobj in zip(fnames, counts or [None] * ngrp):
                    if status_fname:
                        status = PROC_STATUS_SUCCESS \
                            if nobj is not None else PROC_STATUS_FAILURE
                        update_process_status_file(
                            status_fname, f, status, nobj or 0, dt,
                            finished_at=ts)

            if async_write:
                counts0, finish = out
                drain_writer()
                submit_write(finish, record, t0)
            else:
                record(out)
        drain_writer()
        return

    def next_unskipped(i):
        while flist is not None and i < len(flist):
            _, tabf, modf = output_paths(flist[i])
            if not (skipexisting and os.path.exists(tabf)
                    and os.path.exists(modf)):
                return flist[i]
            i += 1
        return None

    def start_prefetch(nextf):
        import threading
        done = threading.Event()
        holder = {}

        def go():
            try:
                holder['fp'] = fitsio.read(nextf)
            except Exception:
                holder['fp'] = None
            done.set()
        threading.Thread(target=go, daemon=True).start()
        slot.clear()
        slot.update(f=nextf, done=done, holder=holder)

    def take_prefetched(f):
        if slot.get('f') == f:
            slot['done'].wait()
            fp = slot['holder'].get('fp')
            slot.clear()
            return fp
        return None

    templates = None
    for i, f in enumerate(flist if flist is not None else files):
        t0 = time.time()
        base, tab_ofname, mod_ofname = output_paths(f)
        if skipexisting and os.path.exists(tab_ofname) \
                and os.path.exists(mod_ofname):
            logging.info('skipping existing %s', f)
            if status_fname:
                update_process_status_file(
                    status_fname, f, PROC_STATUS_EXISTING, 0,
                    time.time() - t0)
            continue
        if templates is None and config is not None:
            setups = proc_kwargs.get('setups', ('b', 'r', 'z'))
            try:
                templates = library.load_template_models(
                    config, {f'desi_{s}' for s in setups})
            except Exception:
                templates = None
        kw = dict(proc_kwargs)
        if kw.pop('zbest_from_coadd', False):
            zb = os.path.join(os.path.dirname(f),
                              os.path.basename(f).replace(
                                  'coadd-', 'redrock-'))
            if os.path.exists(zb):
                kw['zbest_path'] = zb
        fig_prefix = None
        if kw.pop('doplot_figs', False):
            fdir = figure_dir or output_dir
            os.makedirs(fdir, exist_ok=True)
            fig_prefix = os.path.join(fdir, f'{figure_prefix}-{base}')
            kw['doplot'] = True
        prehdus = take_prefetched(f)
        nxt = next_unskipped(i + 1)
        if nxt is not None:
            start_prefetch(nxt)
        out = proc_desi_wrapper(f, tab_ofname, mod_ofname, fig_prefix,
                                config, options or {},
                                templates=templates, prehdus=prehdus,
                                defer_finish=async_write, **kw)

        def record(nobj, dt=None, ts=None, f=f, t0=t0):
            if status_fname:
                status = PROC_STATUS_SUCCESS if nobj is not None else \
                    PROC_STATUS_FAILURE
                update_process_status_file(
                    status_fname, f, status, nobj or 0,
                    (time.time() - t0) if dt is None else dt,
                    finished_at=ts)

        if not async_write:
            record(out)
            continue
        drain_writer()
        if out is None:                       # prepare/fit crashed
            record(None)
        else:
            nsel, finish = out
            if finish is None:                # empty file, written
                record(nsel)
            else:
                def run_finish(finish=finish, nsel=nsel, f=f):
                    try:
                        finish()
                        return nsel
                    except Exception:
                        _log_crash(f, 'write', throw)
                        return None
                submit_write(run_finish, record, t0)
    drain_writer()


def main(args=None):
    if args is None:
        args = sys.argv[1:]
    cmdline = ' '.join(['rvst_desi_fit'] + list(args))
    parser = argparse.ArgumentParser(description='Fit DESI spectra')
    parser.add_argument('input_files', nargs='*', default=[])
    parser.add_argument('--input_file_from', type=str, default=None)
    parser.add_argument('--queue_file', action='store_true',
                        default=False)
    parser.add_argument('--dynamic_queue', action='store_true',
                        default=False,
                        help='claim --input_file_from items dynamically '
                        'across the jax.distributed world through the '
                        'coordination service (no shared filesystem '
                        'needed); requires --coordinator')
    parser.add_argument('--output_dir', type=str, required=True)
    parser.add_argument('--config', type=str, default=None)
    parser.add_argument('--templ_lib', type=str, default=None)
    parser.add_argument('--setups', type=str, default='b,r,z')
    parser.add_argument('--fitarm', type=str, default=None,
                        help='comma-separated subset of arms to fit '
                        '(e.g. b,r)')
    parser.add_argument('--minsn', type=float, default=-1e9)
    parser.add_argument('--npoly', type=int, default=10)
    parser.add_argument('--targetid', type=int, default=None)
    parser.add_argument('--targetid_file_from', type=str, default=None)
    parser.add_argument('--minexpid', type=int, default=None)
    parser.add_argument('--maxexpid', type=int, default=None)
    parser.add_argument('--zbest_select', action='store_true',
                        default=False,
                        help='select STAR-like objects using the '
                        'redrock file next to the coadd')
    parser.add_argument('--doplot', action='store_true', default=False)
    parser.add_argument('--figure_dir', type=str, default=None,
                        help='directory for diagnostic plots '
                        '(default: output_dir)')
    parser.add_argument('--figure_prefix', type=str, default='fig',
                        help='filename prefix for diagnostic plots')
    parser.add_argument('--output_tab_prefix', type=str,
                        default=TABLE_PREFIX,
                        help='prefix of the output table files')
    parser.add_argument('--output_mod_prefix', type=str,
                        default=MODEL_PREFIX,
                        help='prefix of the output model files')
    parser.add_argument('--param_init', type=str, default='CCF',
                        help='initial parameter/RV source: CCF or '
                        'bruteforce')
    parser.add_argument('--targetmask_yaml', type=str, default=None,
                        action='append',
                        help='desitarget-format targetmask yaml(s) '
                        '(e.g. the public sv1_targetmask.yaml / '
                        'cmx_targetmask.yaml) whose *_desi_mask/'
                        'cmx_mask bit names extend the embedded '
                        'tables for --objtypes selection; repeatable')
    parser.add_argument('--objtype_mask', type=int, default=None,
                        help='explicit DESI_TARGET bitmask (for SV/CMX '
                        'bits not in the embedded main-survey table)')
    parser.add_argument('--objtypes', type=str, default=None,
                        help='comma-separated regexes matched against '
                        'main-survey DESI_TARGET names, e.g. '
                        "'MWS_.*,STD_.*'")
    parser.add_argument('--overwrite', type=str, default=None,
                        help='(kept for reference CLI compatibility; '
                        'meaningless now)')
    parser.add_argument('--version', action='store_true', default=False,
                        help='print the software version and exit')
    parser.add_argument('--no_ccf_continuum_normalize',
                        dest='ccf_continuum_normalize',
                        action='store_false', default=True)
    parser.add_argument('--resolution_matrix', action='store_true',
                        default=False)
    # reference CLI compatibility (desi_fit.py:1673-1677): an explicit
    # opt-out spelling of the same default-off switch
    parser.add_argument('--no-resolution_matrix',
                        dest='resolution_matrix', action='store_false')
    # reference CLI compatibility (desi_fit.py:1561-1566): worker
    # count of the reference's per-fiber process pool.  Fibers are a
    # batch axis here, so the value is accepted and ignored.
    parser.add_argument('--nthreads', type=int, default=None,
                        help='ignored (reference compatibility): '
                        'fibers are fitted as one device batch')
    parser.add_argument('--coalesce', type=int, default=2,
                        help='fit up to N consecutive compatible files '
                        'as one device batch (amortizes dispatch '
                        'latency; static file lists only — queue '
                        'inputs fall back to 1).  Default 2: the '
                        'on-chip knee (TPU v5e, 500-fiber files: '
                        '6.5 s/file at 1, 5.4-5.7 at 2, 5.5 at 4 '
                        'with 4x the crash-loss window); '
                        '--coalesce 1 restores strict per-file '
                        'batching')
    parser.add_argument('--skipexisting', action='store_true',
                        default=False)
    parser.add_argument('--throw_exceptions', action='store_true',
                        default=False)
    parser.add_argument('--process_status_file', type=str, default=None)
    parser.add_argument('--log', type=str, default=None)
    parser.add_argument('--log_level', type=str, default='INFO')
    parser.add_argument('--rank', type=int, default=None)
    parser.add_argument('--world', type=int, default=None)
    parser.add_argument('--coordinator', type=str, default=None,
                        help='host:port of the jax.distributed '
                        'coordinator; enables the multi-host world '
                        '(rank/world default to the world indices)')
    args = parser.parse_args(args)

    if args.version:
        print(__version__)
        return
    # honor JAX_PLATFORMS even under site hooks that pre-imported jax
    # (a cpu-pinned rank must never touch a pinned TPU backend)
    utils.honor_jax_platforms_env()
    # persistent compilation cache: fleet processes (queue consumers,
    # per-rank shards) relaunch identical programs — only the first
    # process ever compiles (override dir/off: RVST_COMPILE_CACHE)
    utils.enable_compilation_cache()
    if args.overwrite is not None:
        logging.warning('overwrite keyword is meaningless now')
    if args.param_init not in ('CCF', 'bruteforce'):
        parser.error('Unknown param_init value; only known ones are '
                     'CCF and bruteforce')

    # opt-in multi-host world (reference analogue: the MPI task farm,
    # utils.py:180-318); rank/world drive the static file sharding
    # and the per-rank %d filename substitutions below
    if args.coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS'):
        from rvspecfit_tpu.parallel import distributed
        pid, nproc = distributed.init_distributed(
            args.coordinator, args.world, args.rank)
        if args.rank is None:
            args.rank = pid
        if args.world is None:
            args.world = nproc

    # per-rank log/status file names for multi-host runs
    # (reference: desi_fit.py:1753-1770)
    log_fname = args.log
    if log_fname is not None and args.rank is not None \
            and '%' in log_fname:
        log_fname = log_fname % args.rank
    status_fname = args.process_status_file
    if status_fname is not None and args.rank is not None \
            and '%' in status_fname:
        status_fname = status_fname % args.rank
    logging.basicConfig(
        filename=log_fname, level=getattr(logging, args.log_level))

    override = {}
    if args.templ_lib:
        override['template_lib'] = args.templ_lib
    override['ccf_continuum_normalize'] = args.ccf_continuum_normalize
    config = utils.read_config(args.config, override)

    fit_targetid = None
    if args.targetid is not None:
        fit_targetid = np.array([args.targetid])
    elif args.targetid_file_from:
        fit_targetid = np.loadtxt(args.targetid_file_from,
                                  dtype=np.int64, ndmin=1)
    expid_range = None
    if args.minexpid is not None or args.maxexpid is not None:
        expid_range = (args.minexpid if args.minexpid is not None
                       else -10**18,
                       args.maxexpid if args.maxexpid is not None
                       else 10**18)

    if args.input_files:
        files = utils.FileQueue(file_list=args.input_files)
    elif args.input_file_from:
        if args.dynamic_queue:
            # dynamic cross-host balance via the coordination service
            # (reference MPIFileQueue semantics, utils.py:180-318)
            from rvspecfit_tpu.parallel import distributed
            with open(args.input_file_from) as fp:
                lst = [ln.strip() for ln in fp if ln.strip()]
            files = distributed.CoordinatedFileQueue(lst)
        elif args.world is not None or args.rank is not None:
            with open(args.input_file_from) as fp:
                lst = [ln.strip() for ln in fp if ln.strip()]
            files = utils.ShardedFileQueue(lst, rank=args.rank,
                                           world=args.world)
        else:
            files = utils.FileQueue(file_from=args.input_file_from,
                                    queue=args.queue_file)
    else:
        parser.error('provide input files or --input_file_from')

    try:
        proc_many(files, args.output_dir,
                  output_tab_prefix=args.output_tab_prefix,
                  output_mod_prefix=args.output_mod_prefix,
                  config=config,
                  options={'npoly': args.npoly},
                  skipexisting=args.skipexisting,
                  status_fname=status_fname,
                  figure_dir=args.figure_dir,
                  figure_prefix=args.figure_prefix,
                  coalesce=args.coalesce,
                  cmdline=cmdline,
                  setups=tuple(args.setups.split(',')),
                  minsn=args.minsn, fit_targetid=fit_targetid,
                  expid_range=expid_range,
                  zbest_select=args.zbest_select,
                  zbest_from_coadd=args.zbest_select,
                  doplot_figs=args.doplot,
                  objtype_mask=args.objtype_mask,
                  objtypes=(args.objtypes.split(',')
                            if args.objtypes else None),
                  target_tables=(load_targetmask_yaml(
                      args.targetmask_yaml)
                      if args.targetmask_yaml else None),
                  ccf_init=args.param_init == 'CCF',
                  use_resolution_matrix=args.resolution_matrix,
                  fitarm=(tuple(args.fitarm.split(','))
                          if args.fitarm else None),
                  throw_exceptions=args.throw_exceptions)
    finally:
        if args.coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS'):
            from rvspecfit_tpu.parallel import distributed
            distributed.barrier('rvst_desi_fit_done')
            distributed.shutdown()


if __name__ == '__main__':
    main()
