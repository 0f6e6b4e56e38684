"""Batched multi-object (fiber) fitting — the production TPU path.

Where the reference farms independent per-fiber fits out to a process
pool (reference: py/rvspecfit/desi/desi_fit.py:1215-1218), here a
whole exposure of fibers is fitted *simultaneously* on one chip: the
fiber axis is a vmapped batch axis of the fused likelihood, the
Nelder-Mead instance axis, and (for scale-out) a `shard_map` data-
parallel axis over the device mesh (see parallel/mesh.py).

Requirements: all fibers share per-arm wavelength grids (true for
survey coadds — e.g. DESI B/R/Z — where every fiber is resampled to a
common grid).  Per-fiber data (flux, errors, optional per-fiber
resolution matrices) are stacked along the leading axis.
"""
from __future__ import annotations

import logging
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu.fit import neldermead as nm
from rvspecfit_tpu.fit import vel_fit as vf
from rvspecfit_tpu.fit.likelihood import chisq_trials_core, _overlap_check
from rvspecfit_tpu.fit.likelihood import scan_core as likelihood_scan_core
from rvspecfit_tpu.fit.spec_data import ArmState
from rvspecfit_tpu.ops import basis as basis_mod
from rvspecfit_tpu.ops import vsini as vsini_mod
from rvspecfit_tpu.ops.resolution import BandedMatrix


def _device_scan_stats(vels, mask, chi):
    """Minimum + posterior moments of one velocity scan, on device.

    Returns a packed (5,) vector [best_vel, vel_err, best_chi,
    skewness, kurtosis].  Requires a uniformly spaced velocity grid;
    masked-out entries are ignored.  Quadratic minimum refinement with
    the reference's fallbacks (grid edge, non-convex, vertex escaping
    the bracket -> grid point).
    """
    v = vels.shape[0]
    inf = jnp.asarray(jnp.inf, dtype=chi.dtype)
    chi_m = jnp.where(mask, chi, inf)
    i1 = jnp.argmin(chi_m)
    best_chi = chi_m[i1]
    step = vels[1] - vels[0]
    ic = jnp.clip(i1, 1, v - 2)
    y0, y1, y2 = chi_m[ic - 1], chi_m[ic], chi_m[ic + 1]
    denom = y0 - 2 * y1 + y2
    offset = 0.5 * (y0 - y2) / jnp.where(denom == 0, 1.0, denom)
    interior = (i1 >= 1) & (i1 <= v - 2) & jnp.isfinite(y0) \
        & jnp.isfinite(y2)
    good = interior & (denom > 0) & (jnp.abs(offset) < 1)
    best_vel = jnp.where(good, vels[ic] + offset * step, vels[i1])

    dchi = chi_m - best_chi
    probs = jnp.where(mask, jnp.exp(-0.5 * jnp.clip(dchi, 0, 1400)), 0.0)
    probs = probs / jnp.sum(probs)
    dv = vels - best_vel
    err = jnp.sqrt(jnp.sum(probs * dv * dv))
    safe = err > 1e-10
    err_s = jnp.where(safe, err, 1.0)
    skew = jnp.where(safe, jnp.sum(probs * dv**3) / err_s**3, 0.0)
    kurt = jnp.where(safe, jnp.sum(probs * dv**4) / err_s**4, 0.0)
    return jnp.stack([best_vel, err, best_chi, skew, kurt])


class BatchArm:
    """Stacked per-fiber data of one arm (host-side descriptor)."""

    def __init__(self, name, lam, flux, ivar, badmask=None, resolution=None,
                 setup=None):
        """
        lam : (npix,) shared wavelength grid
        flux, ivar : (B, npix) per-fiber flux and inverse variance
        badmask : (B, npix) bool, optional
        resolution : (B, noff, npix) per-fiber band data, optional
        """
        self.name = str(name)
        self.setup = setup or self.name
        self.lam = np.asarray(lam, dtype=np.float64)
        self.flux = np.asarray(flux, dtype=np.float64)
        self.ivar = np.asarray(ivar, dtype=np.float64)
        self.badmask = (np.zeros(self.flux.shape, dtype=bool)
                        if badmask is None else np.asarray(badmask, bool))
        self.resolution = resolution
        if self.flux.ndim != 2 or self.flux.shape[1] != len(self.lam):
            raise ValueError('flux must be (nfibers, npix)')

    @property
    def nfibers(self):
        return self.flux.shape[0]

    def espec(self):
        """Error vector; masked/invalid pixels get huge errors
        (so they carry no likelihood weight)."""
        bad = (~np.isfinite(self.ivar)) | (self.ivar <= 0) | self.badmask \
            | ~np.isfinite(self.flux)
        with np.errstate(divide='ignore', invalid='ignore'):
            esp = 1.0 / np.sqrt(np.where(bad, 1.0, self.ivar))
        med = np.median(np.where(bad, np.nan, esp), axis=1)
        med = np.where(np.isfinite(med) & (med > 0), med, 1.0)
        esp = np.where(bad, 1e9 * med[:, None], esp)
        return esp


def gather_arm_states(arms, idx):
    """ArmState list with the fiber-axis leaves gathered at ``idx``.

    Trace-safe (pure jnp), so it can run INSIDE a jitted program: the
    NM tile programs take the full device-resident ArmStates plus the
    tile's fiber indices and gather in-graph, instead of the host
    dispatching a dozen small take-programs per tile per round
    (dispatch latency is the NM bottleneck on remote TPU runtimes).
    """
    idx = jnp.asarray(idx, jnp.int32)
    out = []
    for arm in arms:
        band = arm.band
        if band is not None:
            band = BandedMatrix(band.offsets,
                                jnp.take(band.bands, idx, axis=0))
        out.append(ArmState(
            lam=arm.lam,
            dvec=jnp.take(arm.dvec, idx, axis=0),
            espec_inv=jnp.take(arm.espec_inv, idx, axis=0),
            polys=arm.polys,
            log_espec_sum=jnp.take(arm.log_espec_sum, idx, axis=0),
            band=band, name=arm.name, setup=arm.setup,
            idx0=arm.idx0, lam_over_step=arm.lam_over_step,
            pallas_window=arm.pallas_window))
    return out


class BatchedFitter:
    """Fit a batch of fibers sharing arm wavelength grids."""

    def __init__(self, arms, templates, config, options=None,
                 use_vsini=False, dtype=None, solve_dtype=None,
                 microbatch=None):
        """``microbatch``: process fibers through fixed-size tiles of
        this many instances.  Every jitted program then compiles once
        at the tile shape and is reused for any exposure size — on
        remote-compile TPU backends, compile time grows steeply with
        the batch dimension, so tiling turns a minutes-long (or
        crashing) compile into one modest compile plus a few extra
        dispatches."""
        options = options or {}
        self.npoly = options.get('npoly') or 5
        self.rbf = options.get('rbf_continuum', True)
        self.config = config
        self.use_vsini = bool(use_vsini)
        self.solve_dtype = solve_dtype
        self.batch_arms = list(arms)
        self.nfibers = arms[0].nfibers
        self.microbatch = microbatch
        if dtype is None:
            dtype = jnp.zeros(0).dtype
        self.dtype = dtype

        self.templates = {}
        for a in arms:
            if a.setup not in templates:
                raise KeyError(f'no template model for setup {a.setup!r}')
            self.templates[a.setup] = templates[a.setup]
            _overlap_check(templates[a.setup], a.lam,
                           config['min_vel'], config['max_vel'])

        # stacked ArmStates: leading fiber axis on dvec/espec_inv/
        # log_espec_sum/band, shared lam/polys.  All host arrays are
        # shipped in a single device_put — on remote-backend tunnels
        # every transfer pays O(seconds) latency, so one batched
        # transfer instead of ~6 per arm matters a lot.
        host_arms = []
        pallas_windows = []
        for a in arms:
            esp = a.espec()
            flux = np.where(np.isfinite(a.flux), a.flux, 0.0)
            polys = basis_mod.continuum_basis(a.lam, self.npoly,
                                              rbf=self.rbf)
            band_np = None
            if a.resolution is not None:
                band_np = np.asarray(a.resolution)
            cast = lambda x: np.asarray(x, dtype=np.dtype(dtype))
            from rvspecfit_tpu.ops.spline import fractional_index
            from rvspecfit_tpu.fit.spec_data import pallas_spline_window
            geom_a = self.templates[a.setup].geom
            idx0 = fractional_index(geom_a, a.lam)
            pallas_windows.append(pallas_spline_window(idx0, geom_a))
            lam_over_step = None if geom_a.log_step else \
                a.lam / geom_a.step
            host_arms.append(dict(
                lam=cast(a.lam), dvec=cast(flux / esp),
                espec_inv=cast(1.0 / esp), polys=cast(polys),
                log_espec_sum=cast(np.log(esp).sum(axis=1)),
                band=None if band_np is None else cast(band_np),
                idx0=cast(idx0),
                lam_over_step=None if lam_over_step is None else
                cast(lam_over_step)))
        dev_arms = jax.device_put(host_arms)

        self.arms = []
        self.arm_axes = []
        for a, d, pwin in zip(arms, dev_arms, pallas_windows):
            band = None
            band_ax = None
            if d['band'] is not None:
                noff = d['band'].shape[1]
                w = noff // 2
                # row-indexed band from prepare_resolution_band:
                # rows[k, i] multiplies input pixel i + (k - w)
                offsets = tuple(int(k - w) for k in range(noff))
                band = BandedMatrix(offsets, d['band'])
                band_ax = BandedMatrix(offsets, 0)
            self.arms.append(ArmState(
                lam=d['lam'], dvec=d['dvec'], espec_inv=d['espec_inv'],
                polys=d['polys'], log_espec_sum=d['log_espec_sum'],
                band=band, name=a.name, setup=a.setup,
                idx0=d['idx0'], lam_over_step=d['lam_over_step'],
                pallas_window=pwin))
            self.arm_axes.append(ArmState(
                lam=None, dvec=0, espec_inv=0, polys=None, log_espec_sum=0,
                band=band_ax, name=a.name, setup=a.setup,
                idx0=None, lam_over_step=None, pallas_window=pwin))

        self.badchi = float(10 * sum(len(a.lam) for a in arms))
        self._objective_cache = {}
        self._half_widths = {}
        if self.use_vsini:
            for s, tm in self.templates.items():
                self._half_widths[s] = vsini_mod.kernel_half_width(
                    float(config['max_vsini']), tm.log_step)

        # NOTE: every jitted program below takes ``templates`` as a
        # TRACED argument (vmap in_axes None), never as a closure
        # constant: jit embeds closed-over arrays as literals in the
        # executable, and the template grids are tens of MB — on the
        # remote-load TPU backend each such executable then costs
        # ~10+ s to ship at warm-up (measured: 40-115 MB per cached
        # program before this change)
        def chisq_one_fiber(arms_slice, templates, vels, params, vsinis):
            return chisq_trials_core(
                arms_slice, templates, vels, params, vsinis,
                badchi=self.badchi, use_vsini=self.use_vsini,
                half_widths=self._half_widths, outside_penalty=True,
                solve_dtype=self.solve_dtype)

        # vmap over the fiber axis: per-fiber arm data, per-fiber trials
        self._chisq_fibers = jax.jit(jax.vmap(
            chisq_one_fiber, in_axes=(self.arm_axes, None, 0, 0, 0)))

        def scan_one_fiber(arms_slice, templates, vels, param, vsini,
                           fast_interp=False):
            return likelihood_scan_core(
                arms_slice, templates, vels, param, vsini,
                badchi=self.badchi, use_vsini=self.use_vsini,
                half_widths=self._half_widths, outside_penalty=True,
                solve_dtype=self.solve_dtype, fast_interp=fast_interp)

        # fast velocity-scan path: template stage once per fiber
        self._scan_one_fiber = scan_one_fiber
        self._scan_fibers = jax.jit(jax.vmap(
            scan_one_fiber, in_axes=(self.arm_axes, None, 0, 0, 0)))

        def scan_stats_one(arms_slice, templates, vels, mask, param,
                           vsini):
            chi = scan_one_fiber(arms_slice, templates, vels, param,
                                 vsini)
            return _device_scan_stats(vels, mask, chi)

        # scan + statistics fused: ONE program, (B, 5) result — on
        # remote TPU tunnels every host<->device sync costs seconds,
        # so the scan must return only the distilled per-fiber stats
        self._scan_stats_fibers = jax.jit(jax.vmap(
            scan_stats_one, in_axes=(self.arm_axes, None, 0, 0, 0, 0)))

        self._refine_fibers = None  # built lazily (needs static grid)

    # ----------------------- micro-batching -----------------------
    def _mb_ranges(self):
        mb = self.microbatch or self.nfibers
        return [(lo, min(lo + mb, self.nfibers))
                for lo in range(0, self.nfibers, mb)], mb

    @staticmethod
    def _pad_slice(x, lo, hi, mb):
        y = x[lo:hi]
        pad = mb - (hi - lo)
        if pad:
            reps = jnp.repeat(y[-1:], pad, axis=0) if hasattr(y, 'shape') \
                else None
            y = jnp.concatenate([jnp.asarray(y), reps], axis=0)
        return y

    def _slice_arms(self, lo, hi, mb, arms=None):
        out = []
        for arm in (self.arms if arms is None else arms):
            band = arm.band
            if band is not None:
                band = BandedMatrix(band.offsets,
                                    self._pad_slice(band.bands, lo, hi,
                                                    mb))
            out.append(ArmState(
                lam=arm.lam,
                dvec=self._pad_slice(arm.dvec, lo, hi, mb),
                espec_inv=self._pad_slice(arm.espec_inv, lo, hi, mb),
                polys=arm.polys,
                log_espec_sum=self._pad_slice(arm.log_espec_sum, lo, hi,
                                              mb),
                band=band, name=arm.name, setup=arm.setup,
                idx0=arm.idx0, lam_over_step=arm.lam_over_step,
                pallas_window=arm.pallas_window))
        return out

    def update_arms(self, arms):
        """Swap in a new exposure's fiber data, KEEPING every compiled
        program.

        All jitted programs take the ArmState pytrees as traced
        arguments, so replacing only the fiber-axis leaves (data
        vector, inverse errors, resolution bands) reuses the whole
        program cache.  This is what makes multi-file survey runs pay
        the compile/executable-ingest cost once per process instead
        of once per file — on remote-compile TPU backends that cost
        is minutes per file (the reference's per-process model reuses
        its numba/C kernels across files the same way).

        The new arms must match the fitter's static signature: same
        arm count/order, setups, wavelength grids, and resolution-band
        structure.  The fiber count may differ (tile padding absorbs
        it when ``microbatch`` is set).
        """
        import dataclasses as _dc
        arms = list(arms)
        if len(arms) != len(self.batch_arms):
            raise ValueError('arm count mismatch')
        for a, old, cur in zip(arms, self.batch_arms, self.arms):
            if a.setup != cur.setup or a.name != cur.name:
                raise ValueError(f'arm identity mismatch: {a.name}')
            if not np.array_equal(a.lam, old.lam):
                raise ValueError(f'wavelength grid mismatch: {a.name}')
            if (a.resolution is None) != (cur.band is None):
                raise ValueError(f'resolution presence mismatch: '
                                 f'{a.name}')
            if a.resolution is not None and \
                    np.asarray(a.resolution).shape[1] \
                    != cur.band.bands.shape[1]:
                raise ValueError(f'resolution band width mismatch: '
                                 f'{a.name}')
        cast = lambda x: np.asarray(x, dtype=np.dtype(self.dtype))
        host = []
        for a in arms:
            esp = a.espec()
            flux = np.where(np.isfinite(a.flux), a.flux, 0.0)
            host.append(dict(
                dvec=cast(flux / esp), espec_inv=cast(1.0 / esp),
                log_espec_sum=cast(np.log(esp).sum(axis=1)),
                band=None if a.resolution is None else
                cast(np.asarray(a.resolution))))
        # a mesh-sharded fitter keeps its new exposure sharded the same
        # way (padded to the device multiple, fiber rows on the mesh)
        sh = getattr(self, '_fiber_sharding', None)
        if sh is not None:
            nm = self._mesh_size

            def pad(x):
                p = (-x.shape[0]) % nm
                if p:
                    x = np.concatenate(
                        [x, np.repeat(x[-1:], p, axis=0)], axis=0)
                return x

            host = [{k: (None if v is None else pad(v))
                     for k, v in h.items()} for h in host]
            dev = jax.device_put(host, sh)
        else:
            dev = jax.device_put(host)
        new_states = []
        for d, cur in zip(dev, self.arms):
            band = cur.band
            if d['band'] is not None:
                band = BandedMatrix(cur.band.offsets, d['band'])
            new_states.append(_dc.replace(
                cur, dvec=d['dvec'], espec_inv=d['espec_inv'],
                log_espec_sum=d['log_espec_sum'], band=band))
        self.arms = new_states
        self.batch_arms = arms
        self.nfibers = arms[0].nfibers
        for attr in ('_arms_ad', '_arm_axes_ad'):
            if hasattr(self, attr):
                delattr(self, attr)

    @property
    def arms_ad(self):
        """ArmStates with the Pallas spline kernel disabled — for the
        differentiated paths (AD Hessian / gradient polish): the
        windowed-DMA kernel defines no VJP, so those trace the XLA
        gather path instead."""
        if not hasattr(self, '_arms_ad'):
            import dataclasses as _dc
            self._arms_ad = [_dc.replace(a, pallas_window=None)
                             for a in self.arms]
            self._arm_axes_ad = [_dc.replace(a, pallas_window=None)
                                 for a in self.arm_axes]
        return self._arms_ad

    @property
    def arm_axes_ad(self):
        self.arms_ad
        return self._arm_axes_ad

    @property
    def _chisq_fibers_ad(self):
        """Batched chisq vmapped over the AD (no-Pallas) arm axes."""
        if not hasattr(self, '_chisq_fibers_ad_fn'):
            def chisq_one_fiber(arms_slice, templates, vels, params,
                                vsinis):
                return chisq_trials_core(
                    arms_slice, templates, vels, params, vsinis,
                    badchi=self.badchi, use_vsini=self.use_vsini,
                    half_widths=self._half_widths, outside_penalty=True,
                    solve_dtype=self.solve_dtype)
            self._chisq_fibers_ad_fn = jax.vmap(
                chisq_one_fiber,
                in_axes=(self.arm_axes_ad, None, 0, 0, 0))
        return self._chisq_fibers_ad_fn

    def _run_mb(self, fn, *per_fiber_args, arms=None):
        """Run fn(arms, templates, *args) over fiber tiles and
        concatenate outputs.

        With no microbatch (or a single full tile) this is a direct
        call.  Outputs may be arbitrary pytrees of arrays whose
        leading axis is the fiber axis.
        """
        base = self.arms if arms is None else arms
        ranges, mb = self._mb_ranges()
        # direct call only when the stored arm rows match the tile
        # width exactly (a mesh-sharded fitter pads its stored rows to
        # a device multiple, see parallel/mesh.shard_fitter)
        if len(ranges) == 1 and ranges[0][1] - ranges[0][0] == mb \
                and base[0].dvec.shape[0] == mb:
            return fn(base, self.templates, *per_fiber_args)
        parts = []
        for lo, hi in ranges:
            args = [self._pad_slice(jnp.asarray(a), lo, hi, mb)
                    for a in per_fiber_args]
            out = fn(self._slice_arms(lo, hi, mb, arms=base),
                     self.templates, *args)
            parts.append(jax.tree_util.tree_map(
                lambda x: x[:hi - lo], out))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    # -------------------------------------------------------------
    def chisq(self, vels, params, vsinis=None):
        """(B, T) velocities x (B, T, ndim) params -> (B, T) chi2."""
        vels = jnp.asarray(vels, dtype=self.dtype)
        params = jnp.asarray(params, dtype=self.dtype)
        if vsinis is None:
            vsinis = jnp.zeros(vels.shape, dtype=self.dtype)
        else:
            vsinis = jnp.asarray(vsinis, dtype=self.dtype)
        return self._run_mb(self._chisq_fibers, vels, params, vsinis)

    def scan_chisq(self, vel_grids, params0, vsini0=None, vchunk=128):
        """(B, V) per-fiber velocity grids x (B, ndim) params -> (B, V).

        Uses the fast scan path (template stage once per fiber) and
        chunks the velocity axis to bound device intermediates.
        """
        b = self.nfibers
        vel_grids = np.asarray(vel_grids, np.float64)
        v = vel_grids.shape[1]
        params = jnp.asarray(params0, self.dtype)
        vs = jnp.zeros(b, self.dtype) if vsini0 is None else \
            jnp.asarray(vsini0, self.dtype)
        outs = []
        for i in range(0, v, vchunk):
            cur = vel_grids[:, i:i + vchunk]
            pad = vchunk - cur.shape[1]
            if pad and i > 0:
                cur = np.pad(cur, ((0, 0), (0, pad)), mode='edge')
            outs.append(np.asarray(self._run_mb(
                self._scan_fibers, jnp.asarray(cur, self.dtype), params,
                vs))[:, :min(vchunk, v - i)])
        return np.concatenate(outs, axis=1)

    def scan_velocities(self, vel_grid, params0, vsini0=None):
        """Initial velocity scan: shared grid, per-fiber parameters.

        vel_grid : (V,); params0 : (B, ndim); vsini0 : (B,) or None.
        Returns dict with (B,) best_vel/vel_err/best_chi — computed on
        device, fetched as one (B, 5) array.
        """
        b = self.nfibers
        grids = np.tile(np.asarray(vel_grid, np.float64), (b, 1))
        packed = np.asarray(self._run_mb(
            self._scan_stats_fibers, jnp.asarray(grids, self.dtype),
            jnp.ones(grids.shape, bool),
            jnp.asarray(params0, self.dtype),
            jnp.zeros(b, self.dtype) if vsini0 is None else
            jnp.asarray(vsini0, self.dtype)))
        return dict(best_vel=packed[:, 0], vel_err=packed[:, 1],
                    best_chi=packed[:, 2], skewness=packed[:, 3],
                    kurtosis=packed[:, 4])

    @staticmethod
    def _scan_stats(vel_grids, chis, masks=None):
        """Per-fiber minimum + posterior moments from (B, V) scans,
        vectorized over fibers.  Velocity grids must be uniformly
        spaced per fiber (they are arange-built); the quadratic
        minimum refinement uses the uniform-grid parabola vertex with
        the reference's fallbacks (grid edges, non-convex, vertex
        escaping the bracket -> grid point)."""
        b, v = chis.shape
        vel_grids = np.asarray(vel_grids, np.float64)
        chis = np.asarray(chis, np.float64)
        if masks is None:
            masks = np.ones((b, v), bool)
        chi_m = np.where(masks, chis, np.inf)
        i1 = np.argmin(chi_m, axis=1)
        rows = np.arange(b)
        best_chi = chi_m[rows, i1]

        step = vel_grids[:, 1] - vel_grids[:, 0]
        ic = np.clip(i1, 1, v - 2)
        y0 = chi_m[rows, ic - 1]
        y1 = chi_m[rows, ic]
        y2 = chi_m[rows, ic + 1]
        denom = y0 - 2 * y1 + y2
        with np.errstate(invalid='ignore', divide='ignore'):
            offset = 0.5 * (y0 - y2) / denom
        interior = (i1 >= 1) & (i1 <= v - 2) & np.isfinite(y0) \
            & np.isfinite(y2)
        good = interior & (denom > 0) & (np.abs(offset) < 1)
        best_vel = np.where(good, vel_grids[rows, ic] + offset * step,
                            vel_grids[rows, i1])

        dchi = chi_m - best_chi[:, None]
        probs = np.where(masks, np.exp(-0.5 * np.clip(dchi, 0, 1400)), 0.0)
        probs /= probs.sum(axis=1)[:, None]
        dv = vel_grids - best_vel[:, None]
        err = np.sqrt((probs * dv**2).sum(axis=1))
        safe = err > 1e-10
        err_s = np.where(safe, err, 1.0)
        skew = np.where(safe, (probs * dv**3).sum(axis=1) / err_s**3, 0.0)
        kurt = np.where(safe, (probs * dv**4).sum(axis=1) / err_s**4, 0.0)
        return dict(best_vel=best_vel, vel_err=err, best_chi=best_chi,
                    skewness=skew, kurtosis=kurt)

    # -------------------------------------------------------------
    def _gather_arms(self, idx):
        """ArmState list with the fiber-axis leaves gathered at
        ``idx`` (device gather — used for straggler compaction)."""
        return gather_arm_states(self.arms,
                                 jnp.asarray(np.asarray(idx, np.int32)))

    @staticmethod
    def _priors_key(priors):
        return None if priors is None else tuple(
            sorted((k, tuple(v)) for k, v in priors.items()))

    def _nm_objective(self, mapper, priors):
        key = (mapper.cache_key(), self._priors_key(priors))
        objective = self._objective_cache.get(key)
        if objective is None:
            objective = self._make_objective(mapper, priors)
            self._objective_cache[key] = objective
        return objective

    def nm_xatol(self, mapper):
        """Default scale-normalized NM tolerance (see run_neldermead).

        Kept in sync with run_neldermead's default so warm() compiles
        the program the production call will actually use."""
        return tuple(mapper.scales().astype(np.float64)
                     * float(os.environ.get('RVST_NM_XATOL_FRAC',
                                            '0.08')))

    def _nm_programs(self, mapper, priors, fatol, xatol, chunk):
        """Jitted (init, chunk) NM programs returning ONE packed array
        [simplex | fvals | done] — a single fetch per tile per round
        (device->host round-trips pay O(0.1 s) latency on remote TPU
        tunnels, so three fetches per tile would dominate).  Cached per
        (mapper, priors, tolerances, chunk); each tile WIDTH compiles
        on first use under the same callables."""
        xatol_key = tuple(np.atleast_1d(np.asarray(
            xatol, np.float64)).tolist())
        pkey = ('nm_packed', mapper.cache_key(),
                self._priors_key(priors),
                fatol, xatol_key, chunk,
                nm.nm_scheme())
        fns = self._objective_cache.get(pkey)
        if fns is None:
            objective = self._nm_objective(mapper, priors)
            init_raw, chunk_raw = nm.make_stepper(objective, fatol=fatol,
                                                  xatol=xatol, chunk=chunk)

            def pack(s, f, d, it):
                # layout: [simplex | fvals | done | iters-executed]
                bb = s.shape[0]
                return jnp.concatenate(
                    [s.reshape(bb, -1), f, d[:, None].astype(s.dtype),
                     jnp.broadcast_to(
                         jnp.asarray(it, s.dtype)[None, None],
                         (bb, 1))], axis=1)

            # the tile's fiber gather happens IN-GRAPH (idx arg):
            # zero extra dispatches per tile, and XLA fuses the
            # gather into the first consumers
            init_p = jax.jit(lambda s, idx, arms, templ: pack(
                *init_raw(s, gather_arm_states(arms, idx),
                          templ)[:3], 0))
            chunk_p = jax.jit(lambda s, f, d, idx, arms, templ: pack(
                *(lambda o: (o[0], o[1], o[2], o[4]))(
                    chunk_raw(s, f, d, gather_arm_states(arms, idx),
                              templ))))
            fns = (init_p, chunk_p)
            self._objective_cache[pkey] = fns
        return fns

    def warm(self, mapper, priors=None, steps=None, fatol=5e-2, xatol=None,
             nm_chunk=64, widths=None, skip=()):
        """Warm every pipeline program CONCURRENTLY (threaded).

        On remote-compile TPU backends each program's first execution
        pays a large server-side compile/executable-ingest cost even
        when the persistent compilation cache hits (measured: 470 s
        warm-up with 0 cache writes).  Tracing holds the GIL but the
        server wait does not, so warming each phase from its own
        thread overlaps the ingests: measured 147 s threaded vs 517 s
        sequential for the five production phases at B=500.

        Dispatches dummy inputs of the production tile shapes through
        the NM init/chunk programs (every ladder width), the gradient
        polish, the velocity refinement, and the AD Hessian; results
        are discarded.  Returns {phase: seconds}.
        """
        import threading
        import time as _time

        b = self.nfibers
        mb = self.microbatch or b
        if xatol is None:
            xatol = self.nm_xatol(mapper)
        if widths is None:
            widths = sorted({mb} | {w for w in (mb // 2, mb // 4)
                                    if w >= 32}, reverse=True)
        # keep the warmed chunk program in sync with run_neldermead's
        # RVST_NM_CHUNK override, or the warm-up compiles the wrong one
        nm_chunk = int(os.environ.get('RVST_NM_CHUNK', '0')) or nm_chunk
        init_p, chunk_p = self._nm_programs(mapper, priors, fatol,
                                            xatol, nm_chunk)
        scales = mapper.scales().astype(np.float64)
        nvec = len(mapper.start_vector(0.0))
        np1 = nvec + 1
        dt = self.dtype
        x_dummy = np.tile(mapper.start_vector(0.0), (b, 1))
        vel_dummy = np.zeros(b)
        params_dummy = np.tile(mapper.unpack_host(x_dummy[:1])[1][0],
                               (b, 1))

        def w_nm(w):
            def go():
                idx = np.arange(w) % b
                simplex = np.array(nm.build_simplex(
                    jnp.asarray(x_dummy[idx]), scales,
                    seed=vf.SIMPLEX_SEED), np.float64)
                idx_d = jnp.asarray(idx, jnp.int32)
                packed = init_p(jnp.asarray(simplex, dt), idx_d,
                                self.arms, self.templates)
                np.asarray(packed)
                packed = chunk_p(jnp.asarray(simplex, dt),
                                 jnp.zeros((w, np1), dt),
                                 jnp.zeros(w, bool), idx_d,
                                 self.arms, self.templates)
                np.asarray(packed)
            return go

        def w_polish():
            self.run_polish(mapper, x_dummy, priors=priors, steps=steps)

        def w_refine():
            self.refine_velocities(vel_dummy, params_dummy)

        def w_hessian():
            self.hessian_errors(vel_dummy, params_dummy,
                                parnames=list(mapper.specParams),
                                quiet=True)

        def w_models():
            self.best_models(vel_dummy, params_dummy)

        phases = [(f'nm_w{w}', w_nm(w)) for w in widths]
        phases += [('polish', w_polish), ('refine', w_refine),
                   ('hessian', w_hessian), ('models', w_models)]
        phases = [(n, f) for n, f in phases if n not in skip
                  and n.split('_')[0] not in skip]
        times = {}
        failed = []

        def runner(name, fn, attempts=3):
            # transient remote-compile/tunnel errors (dropped response
            # bodies etc.) must not silently push the compile into the
            # first real fit: bounded retry with backoff, and phases
            # that still fail are surfaced to the caller (bench puts
            # them in the artifact JSON)
            t0 = _time.time()
            for attempt in range(attempts):
                try:
                    fn()
                    break
                except Exception:
                    logging.exception(
                        'pipeline warm-up phase %s failed '
                        '(attempt %d/%d)', name, attempt + 1, attempts)
                    if attempt + 1 == attempts:
                        failed.append(name)
                    else:
                        _time.sleep(2.0 * (attempt + 1))
            times[name] = _time.time() - t0

        threads = [threading.Thread(target=runner, args=p, daemon=True)
                   for p in phases]
        t0 = _time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        times['wall'] = _time.time() - t0
        logging.info('threaded pipeline warm-up: %s',
                     ' '.join(f'{k}={v:.1f}s' for k, v in times.items()))
        if failed:
            times['failed'] = list(failed)
            logging.error(
                'pipeline warm-up FAILED for phase(s) %s after retries; '
                'their compiles will happen during the first fit',
                ','.join(failed))
        self._warmed = True
        return times

    def run_neldermead(self, mapper, best_vel0, priors=None, maxrestart=2,
                       fatol=5e-2, xatol=None, maxiter=384, x0=None,
                       nm_chunk=64):
        """Batched NM over fibers, with straggler compaction.

        The optimization runs as host-driven rounds of ``nm_chunk``
        on-device iterations.  Between rounds, *unconverged* fibers are
        repacked (device gather of their arm data + simplex state) into
        as few microbatch tiles as possible — once most fibers have
        converged, each round costs one tile instead of B/mb tiles, so
        straggler fibers no longer hold whole-exposure compute hostage.
        Restart rounds rebuild a FRESH randomized simplex around each
        unconverged fiber's current best point, which escapes collapsed
        simplexes (re-feeding the collapsed simplex, as the reference
        does at vel_fit.py:643, just replays the collapse).

        mapper : vel_fit.ParamMapper; starting vectors default to the
            mapper's paramDict0 with per-fiber velocities best_vel0
            (B,), or pass ``x0`` (B, nvec) for fully per-fiber starts
            (e.g. per-fiber CCF guesses).
        Returns dict with x (B, nvec), fun, converged.
        """
        if x0 is None:
            x0 = np.tile(mapper.start_vector(0.0), (self.nfibers, 1))
            x0[:, 0] = np.asarray(best_vel0)
        else:
            x0 = np.asarray(x0, np.float64)

        b = self.nfibers
        nvec = x0.shape[1]
        np1 = nvec + 1
        scales = mapper.scales().astype(np.float64)
        if xatol is None:
            # scale-normalized per-dimension tolerance: 8% of each
            # parameter's natural scale (teff ~24 K, vel ~0.4 km/s)
            # instead of one raw-unit scalar the teff axis can never
            # meet without collapsing the simplex to ~0.01 K.  The
            # default is deliberately loose: the gradient polish
            # (run_polish) and the exact velocity refinement own the
            # endgame, so NM only needs to deliver the basin (on-chip
            # sweep: 8% + polish reproduces the 3% optima to median
            # dchi2 +0.002 at 2/3 the NM wall time)
            xatol = tuple(scales * float(os.environ.get(
                'RVST_NM_XATOL_FRAC', '0.08')))
        # RVST_NM_CHUNK: on-device iterations per host round — the
        # knob trading host round-trips (fewer at larger chunks)
        # against straggler-compaction granularity (repacking happens
        # only between rounds); sweepable on chip without code changes
        chunk = int(os.environ.get('RVST_NM_CHUNK', '0')) or \
            int(nm_chunk or min(64, maxiter))
        mb = self.microbatch or b
        dt = self.dtype
        init_p, chunk_p = self._nm_programs(mapper, priors, fatol,
                                            xatol, chunk)

        # initial-simplex size: a fraction of the natural scales.
        # The CCF start is typically within a few km/s / one grid cell
        # of the optimum, so a smaller-than-natural first simplex can
        # converge in fewer iterations; sweepable on chip without
        # recompiles (the simplex is program INPUT, not a constant).
        # Restart simplexes always use the full scales — their job is
        # escaping a collapsed simplex, not refining a good one.
        sim_scale = float(os.environ.get('RVST_NM_SIMPLEX_SCALE', '1.0'))
        simplex_h = np.array(
            nm.build_simplex(jnp.asarray(x0), scales * sim_scale,
                             seed=vf.SIMPLEX_SEED),
            np.float64)                                   # (B, n+1, n)
        fvals_h = np.zeros((b, np1))
        done_h = np.zeros(b, bool)

        # tile-width ladder: straggler rounds run through NARROW
        # programs instead of the full-width tile.  Late rounds have
        # few unconverged fibers (measured trajectory at B=500:
        # 500 -> 427 -> 145 -> 30 -> 4), so padding them to the full
        # microbatch wastes most of the device work; a width-mb//2 or
        # -mb//4 program costs proportionally less.  jax.jit compiles
        # each width on first use (bounded: at most 3 widths).
        ladder = sorted({mb} | {w for w in (mb // 2, mb // 4)
                                if w >= 32}, reverse=True)

        def tiles_of(idx):
            u = idx.size
            w, best_cost = mb, None
            for cand in ladder:
                ntiles = -(-u // cand)
                # padded fiber-iterations + a dispatch-latency penalty
                # per extra tile (device round-trips cost ~0.1 s on
                # remote TPU tunnels)
                cost = ntiles * cand + 0.25 * mb * (ntiles - 1)
                if best_cost is None or cost < best_cost:
                    best_cost, w = cost, cand
            for lo in range(0, u, w):
                sel = idx[lo:lo + w]
                sel_p = sel if sel.size == w else np.concatenate(
                    [sel, np.repeat(sel[-1:], w - sel.size)])
                yield sel, sel_p

        def unpack_to_host(sel, packed):
            # packed layout: [simplex | fvals | done | iters-executed]
            k = sel.size
            p = np.asarray(packed, np.float64)[:k]
            simplex_h[sel] = p[:, :np1 * nvec].reshape(k, np1, nvec)
            fvals_h[sel] = p[:, np1 * nvec:np1 * nvec + np1]
            done_h[sel] = p[:, -2] > 0.5
            return int(p[0, -1])

        # objective-evaluation accounting (padded fiber-trials actually
        # EXECUTED — chunk programs exit early once a tile converges
        # and report the iteration count) — lets callers convert
        # flops/trial into an achieved-FLOP/s / MFU figure for the NM
        # phase (bench RVST_MFU)
        ncand = nm.nm_ncand()
        evals = [0]

        def eval_init(idx):
            # dispatch every tile first (async), then fetch: tiles of
            # one round are independent, so their device programs
            # overlap and only one round-trip latency is paid
            outs = []
            for sel, sel_p in tiles_of(idx):
                evals[0] += sel_p.size * np1
                outs.append((sel, init_p(
                    jnp.asarray(simplex_h[sel_p], dt),
                    jnp.asarray(sel_p, jnp.int32),
                    self.arms, self.templates)))
            for sel, packed in outs:
                unpack_to_host(sel, packed)

        eval_init(np.arange(b))
        for restart in range(maxrestart):
            if restart > 0:
                undone = np.where(~done_h)[0]
                if undone.size == 0:
                    break
                xb = simplex_h[undone,
                               np.argmin(fvals_h[undone], axis=1)]
                simplex_h[undone] = np.array(nm.build_simplex(
                    jnp.asarray(xb), scales,
                    seed=vf.SIMPLEX_SEED + restart), np.float64)
                eval_init(undone)
            nit = 0
            while nit < maxiter:
                undone = np.where(~done_h)[0]
                if undone.size == 0:
                    break
                logging.info('NM restart %d nit %d: %d/%d unconverged',
                              restart, nit, undone.size, b)
                outs = []
                for sel, sel_p in tiles_of(undone):
                    outs.append((sel, sel_p.size, chunk_p(
                        jnp.asarray(simplex_h[sel_p], dt),
                        jnp.asarray(fvals_h[sel_p], dt),
                        jnp.asarray(done_h[sel_p]),
                        jnp.asarray(sel_p, jnp.int32),
                        self.arms, self.templates)))
                for sel, w, packed in outs:
                    it_done = unpack_to_host(sel, packed)
                    evals[0] += w * it_done * ncand
                nit += chunk

        rows = np.arange(b)
        ib = np.argmin(fvals_h, axis=1)
        return dict(x=simplex_h[rows, ib], fun=fvals_h[rows, ib],
                    converged=done_h.copy(), obj_evals=evals[0])

    def run_polish(self, mapper, x, priors=None, steps=None, fun0=None,
                   fetch=True):
        """Batched gradient polish — the ``second_minimizer`` stage.

        The reference runs a BFGS polish over [vel, params] after
        Nelder-Mead for every object when config['second_minimizer']
        is set (default True; reference py/rvspecfit/vel_fit.py:653-660,
        utils.py:26).  Here the polish is ``steps`` batched
        damped-Newton iterations over the NON-velocity coordinates
        [vsini?, free params], using *exact* AD gradients/Hessians of
        the fused likelihood; the velocity coordinate is deliberately
        left to the refinement stage, which re-measures it by exact
        grid scan immediately after (block coordinate descent — the
        vel direction of the AD Hessian routes through the
        Doppler-gather index chain, which costs ~15x the parameter
        directions on TPU, and the scan optimizes it globally rather
        than locally anyway).  Each iteration solves
        (H + ridge) dx = -grad and evaluates a fixed step ladder
        [1, 0.25, 0.05] plus the current point in ONE batched call; a
        fiber's state moves only when a trial strictly improves its
        chi-square, so the polish never degrades the NM result.

        x : (B, nvec) NM optima; fun0 : optional (B,) NM best values.
        ``steps`` defaults to the production value (2; env
        ``RVST_POLISH_STEPS`` overrides for on-chip sweeps — bench and
        drivers share this default so the benchmark measures the real
        pipeline).
        Returns dict with x (B, nvec), fun (B,), moved (B,).
        """
        if steps is None:
            steps = int(os.environ.get('RVST_POLISH_STEPS', 2))
        key = ('polish', mapper.cache_key(), steps,
               os.environ.get('RVST_POLISH_FREEZE_H') == '1',
               None if priors is None else
               tuple(sorted((k, tuple(v)) for k, v in priors.items())))
        fn = self._objective_cache.get(key)
        if fn is None:
            objective = self._make_objective(mapper, priors, ad=True)
            prior_rows = []
            if priors:
                for i, pname in enumerate(mapper.specParams):
                    if pname in priors:
                        mu, sig = priors[pname]
                        prior_rows.append((i, float(mu), float(sig)))

            def scalar_obj(arms_one, templates, vel, rest):
                # rest: (nvec-1,) non-velocity coordinates -> scalar
                # differentiable -2logL for ONE fiber (arms_one: the
                # vmap-stripped per-fiber ArmState list)
                xv = jnp.concatenate([vel[None], rest])
                _, params, vsini, penalty = mapper.unpack(xv[None])
                chi = chisq_trials_core(
                    arms_one, templates, vel[None], params, vsini,
                    badchi=self.badchi, use_vsini=self.use_vsini,
                    half_widths=self._half_widths, outside_penalty=True,
                    solve_dtype=self.solve_dtype)[0]
                for i, mu, sig in prior_rows:
                    chi = chi + ((params[0, i] - mu) / sig)**2
                return chi + penalty[0]

            ladder = jnp.asarray([1.0, 0.25, 0.05])
            # RVST_POLISH_FREEZE_H=1: evaluate the AD Hessian only on
            # the first Newton step and reuse it (the gradient is
            # recomputed every step).  Near the NM optimum the
            # curvature barely moves between steps, the Hessian is the
            # dominant cost of the stage (forward-over-reverse ~n
            # tangents x the gradient cost), and the strict-improvement
            # ladder below makes a stale direction safe: a fiber only
            # moves when its chi-square actually decreases.
            freeze_h = os.environ.get('RVST_POLISH_FREEZE_H') == '1'

            def polish_tile(arms_slice, templates, x0, f0):
                def hess_at(xc):
                    vel, rest = xc[:, 0], xc[:, 1:]
                    return jax.vmap(
                        jax.hessian(scalar_obj, argnums=3),
                        in_axes=(self.arm_axes_ad, None, 0, 0))(
                            arms_slice, templates, vel, rest)

                def body(i, carry):
                    xc, fc, h = carry
                    vel, rest = xc[:, 0], xc[:, 1:]
                    g = jax.vmap(jax.grad(scalar_obj, argnums=3),
                                 in_axes=(self.arm_axes_ad, None, 0, 0))(
                                     arms_slice, templates, vel, rest)
                    if freeze_h:
                        h = jax.lax.cond(i == 0,
                                         lambda: hess_at(xc),
                                         lambda: h)
                    else:
                        h = hess_at(xc)
                    dh = jnp.abs(jnp.diagonal(h, axis1=-2, axis2=-1))
                    ridge = 1e-6 * jnp.maximum(dh, 1e-12)
                    hs = h + jax.vmap(jnp.diag)(ridge)
                    dx = -jnp.linalg.solve(hs, g[..., None])[..., 0]
                    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
                    cand_rest = rest[:, None, :] \
                        + ladder[None, :, None].astype(xc.dtype) \
                        * dx[:, None, :]
                    cand = jnp.concatenate([
                        jnp.broadcast_to(vel[:, None, None],
                                         cand_rest.shape[:2] + (1,)),
                        cand_rest], axis=2)
                    cand = jnp.concatenate([cand, xc[:, None, :]],
                                           axis=1)          # (B, 4, n)
                    fcand = objective(cand, arms_slice, templates)
                    fcand = jnp.where(jnp.isfinite(fcand), fcand,
                                      jnp.inf)
                    ib = jnp.argmin(fcand, axis=1)
                    oh = jax.nn.one_hot(ib, fcand.shape[1],
                                        dtype=xc.dtype)
                    fbest = jnp.sum(oh * fcand, axis=1)
                    xbest = jnp.sum(jnp.where(oh[:, :, None] > 0, cand,
                                              0.0), axis=1)
                    better = fbest < fc
                    return (jnp.where(better[:, None], xbest, xc),
                            jnp.where(better, fbest, fc), h)

                nrest = x0.shape[1] - 1
                h0 = jnp.zeros((x0.shape[0], nrest, nrest), x0.dtype)
                xf, ff, _ = jax.lax.fori_loop(0, steps, body,
                                              (x0, f0, h0))
                return xf, ff

            fn = jax.jit(polish_tile)
            self._objective_cache[key] = fn

        dt = self.dtype
        x = np.asarray(x, np.float64)
        if fun0 is None:
            fun0 = np.full(x.shape[0], np.inf)
        xf, ff = self._run_mb(fn, jnp.asarray(x, dt),
                              jnp.asarray(np.asarray(fun0), dt),
                              arms=self.arms_ad)
        if not fetch:
            # deferred mode (run_tail_async): keep the polished state
            # on device for the downstream stages; the caller fetches
            return dict(x=xf, fun=ff, moved=None)
        xf = np.asarray(xf, np.float64)
        ff = np.asarray(ff, np.float64)
        moved = np.any(xf != x, axis=1)
        return dict(x=xf, fun=ff, moved=moved)

    def _make_objective(self, mapper, priors=None, ad=False):
        min_vel = float(self.config['min_vel'])
        max_vel = float(self.config['max_vel'])
        prior_rows = []
        if priors:
            for i, pname in enumerate(mapper.specParams):
                if pname in priors:
                    mu, sig = priors[pname]
                    prior_rows.append((i, float(mu), float(sig)))

        def objective(x, arms, templates):
            # x: (B, K, nvec) -> (B, K); arms + templates passed as
            # traced args so one compiled program serves every fiber
            # tile and no big constants are baked into the executable
            b, k, nvec = x.shape
            vel, params, vsini, penalty = mapper.unpack(
                x.reshape(b * k, nvec))
            vel = vel.reshape(b, k)
            params = params.reshape(b, k, -1)
            vsini = vsini.reshape(b, k)
            penalty = penalty.reshape(b, k)
            chisq_b = self._chisq_fibers_ad if ad else \
                self._chisq_fibers.__wrapped__
            chis = chisq_b(arms, templates, vel, params, vsini)
            for i, mu, sig in prior_rows:
                chis = chis + ((params[:, :, i] - mu) / sig)**2
            chis = chis + penalty
            bad = ((vel > max_vel) | (vel < min_vel)
                   | ~jnp.isfinite(params).all(axis=-1))
            return jnp.where(bad, 1e30, chis)

        return objective

    # -------------------------------------------------------------
    def _build_refine(self, nv, maxiter):
        """Jitted whole-refinement program: the reference's iterative
        _minimum_sampler loop (py/rvspecfit/vel_fit.py:358-439) as a
        single on-device fori_loop per fiber — grids rebuilt in-graph,
        one (B, 5) fetch for the whole refinement."""
        cfg = self.config
        crit_ratio, goal_width = 5.0, 10.0
        min_vel0 = float(cfg['min_vel'])
        max_vel0 = float(cfg['max_vel'])
        min_vel_step = float(cfg['min_vel_step'])
        vel_step0 = float(cfg['vel_step0'])

        # window grids after the first full-range pass: the narrow
        # passes use step = err/5*0.8 over width 2*10*err = 20*err,
        # i.e. <= 125 points — 128 covers it at lane granularity
        # (the scan is HBM-bound on (B, V, npix) intermediates, so V
        # is worth trimming)
        nv_win = 128

        def step_one(arms_slice, templates, nv_cur, state, param, vsini,
                     fast_interp=False):
            """One refinement iteration on an nv_cur-point grid."""
            dt = self.dtype
            best, lo, hi, step, done, stats = state
            g0 = jnp.ceil((lo - best) / step) * step
            grid = g0 + jnp.arange(nv_cur, dtype=dt) * step + best
            mask = grid < hi
            mask = mask.at[0].set(True)   # at least one valid point
            grid = jnp.where(mask, grid, grid[0])
            chi = self._scan_one_fiber(arms_slice, templates, grid,
                                       param, vsini,
                                       fast_interp=fast_interp)
            new_stats = _device_scan_stats(grid, mask, chi)
            stats = jnp.where(done, stats, new_stats)
            best_new = jnp.where(done, best, new_stats[0])
            err = new_stats[1]
            stop = (step < err / crit_ratio) | (step < min_vel_step)
            unresolved = step > err
            step_new = jnp.where(unresolved, step / crit_ratio,
                                 err / crit_ratio * 0.8)
            width = jnp.where(unresolved, step * goal_width,
                              err * goal_width)
            lo_new = jnp.maximum(best_new - width, min_vel0)
            hi_new = jnp.minimum(best_new + width, max_vel0)
            keep = done
            return (best_new,
                    jnp.where(keep, lo, lo_new),
                    jnp.where(keep, hi, hi_new),
                    jnp.where(keep, step, step_new),
                    done | stop,
                    stats)

        def step_all(nv_cur, fast_interp=False):
            def fn(arms, templates, s0, s1, s2, s3, s4, s5, params,
                   vsinis):
                st = jax.vmap(
                    lambda a, tm, t0, t1, t2, t3, t4, t5, p, w: step_one(
                        a, tm, nv_cur, (t0, t1, t2, t3, t4, t5), p, w,
                        fast_interp=fast_interp),
                    in_axes=(self.arm_axes, None) + (0,) * 8)(
                        arms, templates, s0, s1, s2, s3, s4, s5, params,
                        vsinis)
                return st + (jnp.all(st[4]),)
            return fn

        full_step = step_all(nv)
        win_step = step_all(nv_win)

        # ONE jitted program per tile: the full-range pass followed by
        # a lax.while_loop of window passes.  On the remote TPU tunnel
        # every dispatched program pays ~25 ms latency plus a host
        # sync, so the previous step-per-dispatch driver spent more
        # time in round trips than in device compute.  (Measured on
        # chip: running the broad pass in fast_interp nearest-pixel
        # mode is SLOWER — the XLA gather it lowers to loses to the
        # Pallas cubic.)
        def refine_prog(arms, templates, best0, params, vsinis):
            bb = best0.shape[0]
            dt = best0.dtype
            state = (jnp.clip(best0, min_vel0, max_vel0),
                     jnp.full(bb, min_vel0, dt),
                     jnp.full(bb, max_vel0, dt),
                     jnp.full(bb, vel_step0, dt),
                     jnp.zeros(bb, bool), jnp.zeros((bb, 5), dt))
            out = full_step(arms, templates, *state, params, vsinis)
            state = out[:6]

            def cond(carry):
                it, st = carry
                return (it < maxiter) & ~jnp.all(st[4])

            def body(carry):
                it, st = carry
                out = win_step(arms, templates, *st, params, vsinis)
                return it + 1, out[:6]

            it, state = jax.lax.while_loop(cond, body, (1, state))
            # stats (B,5) + the iteration count broadcast as column 5
            # (diagnostics: how many window passes the tile took)
            return jnp.concatenate(
                [state[5], jnp.broadcast_to(
                    it.astype(state[5].dtype)[None, None],
                    (state[5].shape[0], 1))], axis=1)

        return jax.jit(refine_prog)

    def run_tail_async(self, mapper, x, fun=None, parnames=None,
                       priors=None, polish=True):
        """Dispatch the whole post-NM chain — gradient polish (opt) ->
        device unpack -> velocity refinement -> AD Hessians -> best
        models — WITHOUT any blocking fetch, and return a ``collect``
        closure that fetches + host-finalizes everything.

        Rationale: every stage here is a pure device program, but the
        synchronous API fetches between stages, pinning ~2-4 s of
        dispatch-latency-bound device work to the caller's critical
        path.  The survey drivers instead dispatch the tail and hand
        ``collect`` to their deferred-write thread, so group N's tail
        executes inside the idle device gaps of group N+1's NM rounds
        (the host-side analogue of the reference's per-node worker
        pool overlap, desi_fit.py:1471-1481).

        x : (B, nvec) NM optima (host); fun : (B,) NM best values.
        collect() -> dict(x, fun, params, vsini, ref, errs, covars,
        bad_hess, mods) with exactly the synchronous methods' values.
        """
        dt = self.dtype
        x_host = np.asarray(x, np.float64)
        if polish:
            pol = self.run_polish(mapper, x_host, priors=priors,
                                  fun0=fun, fetch=False)
            x_dev = pol['x']
        else:
            pol = None
            x_dev = jnp.asarray(x_host, dt)
        ukey = ('unpack', mapper.cache_key())
        ufn = self._objective_cache.get(ukey)
        if ufn is None:
            ufn = jax.jit(lambda pv: mapper.unpack(pv)[:3])
            self._objective_cache[ukey] = ufn
        vel_d, params_d, vsini_d = ufn(x_dev)
        ref_d = self.refine_velocities(vel_d, params_d, vsinis=vsini_d,
                                       fetch=False)
        hess_d = self.hessian_errors(ref_d[:, 0], params_d,
                                     vsinis=vsini_d, priors=priors,
                                     parnames=parnames, fetch=False)
        mods_d = self.best_models(ref_d[:, 0], params_d,
                                  vsinis=vsini_d, fetch=False)

        def collect():
            out = {}
            if pol is not None:
                out['x'] = np.asarray(pol['x'], np.float64)
                out['fun'] = np.asarray(pol['fun'], np.float64)
            else:
                out['x'] = x_host
                out['fun'] = None if fun is None else \
                    np.asarray(fun, np.float64)
            out['params'] = np.asarray(params_d, np.float64)
            out['vsini'] = np.asarray(vsini_d, np.float64)
            out['ref'] = self._refine_finalize(ref_d)
            errs, covars, bad = self._hessian_finalize(hess_d)
            out['errs'], out['covars'], out['bad_hess'] = \
                errs, covars, bad
            out['mods'] = self._models_finalize(mods_d)
            return out

        return collect

    def refine_velocities(self, best_vel, params, vsinis=None,
                          maxiter=10, fetch=True):
        """Batched iterative velocity refinement: a full-range pass
        ("crucially we start from a broad range to capture multiple
        CCF peaks", reference vel_fit.py:368-372) followed by narrow-
        window passes until every fiber's step resolves its
        uncertainty."""
        b = self.nfibers
        nv = int(math.ceil((float(self.config['max_vel'])
                            - float(self.config['min_vel']))
                           / float(self.config['vel_step0']))) + 1
        key = ('refine', nv, maxiter)
        refine_fn = self._objective_cache.get(key)
        if refine_fn is None:
            refine_fn = self._build_refine(nv, maxiter)
            self._objective_cache[key] = refine_fn
        dt = self.dtype
        vs = jnp.zeros(b, dt) if vsinis is None else \
            jnp.asarray(vsinis, dt)
        params_j = jnp.asarray(params, dt)

        packed = self._run_mb(refine_fn, jnp.asarray(best_vel, dt),
                              params_j, vs)
        if not fetch:
            return packed                      # device (B, 6)
        return self._refine_finalize(packed)

    @staticmethod
    def _refine_finalize(packed):
        """Device (B, 6) refine output -> the host result dict."""
        packed = np.asarray(packed, np.float64)
        logging.debug('refine_velocities window passes per tile: %s',
                      np.unique(packed[:, 5]).tolist())
        return dict(best_vel=packed[:, 0], vel_err=packed[:, 1],
                    best_chi=packed[:, 2], skewness=packed[:, 3],
                    kurtosis=packed[:, 4], iterations=packed[:, 5])

    # -------------------------------------------------------------
    def best_models(self, best_vel, params, vsinis=None, fetch=True):
        """Best-fit models for every fiber and arm at the optimum.

        Returns dict with per-arm lists: models {name: (B, npix)},
        raw_models, and host-computed true chi-squares / reduced
        chi-squares / npix (masked-pixel aware), plus the continuum-
        only chi-squares (reference get_chisq_continuum,
        spec_fit.py:739-783).
        """
        b = self.nfibers

        def model_one(arms_slice, templates, vel, param, vsini):
            from rvspecfit_tpu.fit.likelihood import (template_stage,
                                                      _eval_doppler_single)
            from rvspecfit_tpu.ops import chisq as chisq_mod
            stage = {s: template_stage(
                templates[s], param[None, :], vsini[None],
                self.use_vsini, self._half_widths.get(s))
                for s in templates}
            out = []
            for arm in arms_slice:
                coeffs = stage[arm.setup][0][0]
                tm = templates[arm.setup]
                val = _eval_doppler_single(arm, tm, coeffs, vel[None])[0]
                if arm.band is not None:
                    val = arm.band.matvec(val)
                _, coef = chisq_mod.chisq_continuum_marg(
                    arm.dvec, val * arm.espec_inv, arm.polys,
                    arm.log_espec_sum, solve_dtype=self.solve_dtype,
                    with_coeffs=True)
                model = jnp.dot(coef, arm.polys * val[None, :],
                                precision=jax.lax.Precision.HIGHEST)
                # continuum-only model
                ctempl = jnp.ones_like(val)
                if arm.band is not None:
                    ctempl = arm.band.matvec(ctempl)
                _, ccoef = chisq_mod.chisq_continuum_marg(
                    arm.dvec, ctempl * arm.espec_inv, arm.polys,
                    arm.log_espec_sum, solve_dtype=self.solve_dtype,
                    with_coeffs=True)
                cmodel = jnp.dot(ccoef, arm.polys * ctempl[None, :],
                                 precision=jax.lax.Precision.HIGHEST)
                out.extend([model, val, cmodel])
            return tuple(out)

        key = ('models',)
        fn = self._objective_cache.get(key)
        if fn is None:
            fn = jax.jit(jax.vmap(model_one,
                                  in_axes=(self.arm_axes, None, 0, 0,
                                           0)))
            self._objective_cache[key] = fn
        vs = jnp.zeros(b, self.dtype) if vsinis is None else \
            jnp.asarray(vsinis, self.dtype)
        flat = self._run_mb(fn, jnp.asarray(best_vel, self.dtype),
                            jnp.asarray(params, self.dtype), vs)
        if not fetch:
            return flat                        # device tuple
        return self._models_finalize(flat)

    def _models_finalize(self, flat):
        """Device model tuple -> the host result dict with the masked
        true/continuum chi-squares (host math)."""
        flat = [np.asarray(x) for x in flat]

        ret = dict(models={}, raw_models={}, cont_models={},
                   chisq={}, red_chisq={}, npix={}, cont_chisq={})
        for k, a in enumerate(self.batch_arms):
            model, raw, cmodel = flat[3 * k:3 * k + 3]
            esp = a.espec()
            good = ~(a.badmask | ~np.isfinite(a.flux)
                     | ~np.isfinite(a.ivar) | (a.ivar <= 0))
            dev = np.where(good, (model - np.where(good, a.flux, 0.0))
                           / esp, 0.0)
            cdev = np.where(good, (cmodel - np.where(good, a.flux, 0.0))
                            / esp, 0.0)
            ret['models'][a.name] = model
            ret['raw_models'][a.name] = raw
            ret['cont_models'][a.name] = cmodel
            ret['chisq'][a.name] = (dev**2).sum(axis=1)
            ret['cont_chisq'][a.name] = (cdev**2).sum(axis=1)
            ret['npix'][a.name] = good.sum(axis=1)
            ret['red_chisq'][a.name] = ret['chisq'][a.name] / np.maximum(
                ret['npix'][a.name], 1)
        return ret

    # -------------------------------------------------------------
    def hessian_errors(self, best_vel, params, vsinis=None, priors=None,
                       parnames=None, quiet=False, fetch=True):
        """Batched exact AD Hessians -> per-fiber parameter errors.

        ``quiet`` keeps the BAD_HESSIAN batch summary at DEBUG —
        used by warm(), whose dummy inputs are nowhere near an
        optimum, so most of their Hessians are legitimately non-PD
        and the WARNING would read like a production failure."""
        b, ndim = np.shape(params)
        prior_rows = []
        if priors and parnames:
            for i, pname in enumerate(parnames):
                if pname in priors:
                    mu, sig = priors[pname]
                    prior_rows.append((i, float(mu), float(sig)))

        hkey = ('hess', tuple(prior_rows))
        hess_fn = self._objective_cache.get(hkey)
        if hess_fn is None:
            def half_chisq(arms_slice, templates, vel, param, vsini):
                chi = chisq_trials_core(
                    arms_slice, templates, vel[None], param[None, :],
                    vsini[None], badchi=self.badchi,
                    use_vsini=self.use_vsini,
                    half_widths=self._half_widths, outside_penalty=True,
                    solve_dtype=self.solve_dtype)[0]
                for i, mu, sig in prior_rows:
                    chi = chi + ((param[i] - mu) / sig)**2
                return 0.5 * chi

            hess_fn = jax.jit(jax.vmap(
                jax.hessian(half_chisq, argnums=3),
                in_axes=(self.arm_axes_ad, None, 0, 0, 0)))
            self._objective_cache[hkey] = hess_fn
        vs = jnp.zeros(b, self.dtype) if vsinis is None else \
            jnp.asarray(vsinis, self.dtype)
        hess_dev = self._run_mb(
            hess_fn, jnp.asarray(best_vel, self.dtype),
            jnp.asarray(params, self.dtype), vs, arms=self.arms_ad)
        if not fetch:
            return hess_dev                    # device (B, ndim, ndim)
        return self._hessian_finalize(hess_dev, quiet=quiet)

    @staticmethod
    def _hessian_finalize(hess_dev, quiet=False):
        """Device Hessians -> (errs, covars, bad) with the per-fiber
        robust-inversion fallbacks (host loop)."""
        hessians = np.asarray(hess_dev, np.float64)
        b, ndim = hessians.shape[:2]
        errs = np.zeros((b, ndim))
        covars = np.zeros((b, ndim, ndim))
        bad = np.zeros(b, bool)
        for i in range(b):
            errs[i], covars[i], bad[i] = vf._uncertainties_from_hessian(
                hessians[i], quiet=True)
        nbad = int(bad.sum())
        if nbad:
            # one summary line per batch; per-fiber detail is at DEBUG
            (logging.debug if quiet else logging.warning)(
                '%d/%d fibers flagged BAD_HESSIAN (robust inversion '
                'fallback used)', nbad, b)
        return errs, covars, bad
