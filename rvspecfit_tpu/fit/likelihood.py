"""The fused, batched spectral likelihood.

This is the TPU re-design of the reference hot path
(reference: py/rvspecfit/spec_fit.py:797-989 `get_chisq` and its
callees).  Where the reference evaluates one (velocity, parameters,
vsini) point at a time through a chain of lru-cached Python calls and
a C spline, here the *entire* chain —

    parameter mapping -> template interpolation (gather / MLP)
    -> rotational broadening -> spline construction
    -> Doppler-shifted spline evaluation -> resolution convolution
    -> continuum-marginalized chi-square -> outside-grid penalties

— is one jit-compiled function of a whole *batch* of trial points,
with arms unrolled statically.  Optimizers, velocity-grid scans, and
per-fiber batches all call the same compiled kernel with different
batch contents; XLA fuses the elementwise stages and maps the
normal-matrix contractions onto the MXU.

Semantics replicated from the reference (with file:line citations):
* outside-grid penalty ``outside * 10 * sum(npix)`` added per arm
  (spec_fit.py:863, :888-896);
* templates with |values| > 1e100 or non-finite outside the grid get
  the 1000x bad-chi contribution (spec_fit.py:392-397, :888-891);
* non-finite chi-square with a finite template outside the grid is
  skipped with just the penalty (spec_fit.py:963-969); inside the
  grid it surfaces as +inf (the reference raises; in-graph we return
  inf which optimizers treat as a rejected point and hosts can check);
* systematic error added in quadrature, per-call resolution matrices
  mutually exclusive with per-dataset ones (spec_fit.py:922-940).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rvspecfit_tpu.fit.spec_data import ArmState, SpecData
from rvspecfit_tpu.interp.api import TemplateModel
from rvspecfit_tpu.ops import spline as spline_mod
from rvspecfit_tpu.ops import vsini as vsini_mod
from rvspecfit_tpu.ops import chisq as chisq_mod

SPEED_OF_LIGHT = 299792.458  # km/s
MAX_TEMPLATE_VALUE = 1e100


def _overlap_check(tm_or_bounds, arm_lam, min_vel, max_vel):
    """Template must cover the data at all considered velocities
    (reference: py/rvspecfit/spec_fit.py:786-794).

    Accepts a TemplateModel (uses its static geometry bounds — never
    touches device arrays: device->host readbacks can cost seconds on
    remote TPU tunnels) or a (lam0, lam1) pair / wavelength array.
    """
    if hasattr(tm_or_bounds, 'geom'):
        t0, t1 = tm_or_bounds.geom.x0, tm_or_bounds.geom.x_last
    else:
        t0, t1 = float(tm_or_bounds[0]), float(tm_or_bounds[-1])
    a0, a1 = float(arm_lam[0]), float(arm_lam[-1])
    for vel in (min_vel, max_vel):
        corr = np.sqrt((1 + vel / SPEED_OF_LIGHT)
                       / (1 - vel / SPEED_OF_LIGHT))
        if t0 * corr > a0 or t1 * corr < a1:
            raise RuntimeError(
                f'Template wavelengths ({t0},{t1}) do not cover the '
                f'data ({a0},{a1}) at velocities {min_vel}..{max_vel}')




def _pallas_interpret():
    import os
    return os.environ.get('RVST_PALLAS_SPLINE') == 'interpret'


def _doppler_u(arm, tm, vels):
    """Fractional-index query grid (T, npix) for the index eval path."""
    shift = spline_mod.doppler_index_shift(tm.geom, vels,
                                           arm.lam_over_step)
    if tm.geom.log_step:
        return arm.idx0[None, :] + shift[:, None]
    return arm.idx0[None, :] + shift[:, None] * arm.lam_over_step[None, :]


def _eval_doppler_single(arm, tm, coeffs, vels, fast_interp=False):
    """Doppler evaluation of ONE template at many velocities.

    coeffs: (4, n-1) planes-first spline coefficients — or (n,) raw
    knot values in
    ``fast_interp`` (nearest-pixel) mode; vels: (V,) -> (V, npix).
    """
    if arm.idx0 is not None:
        u = _doppler_u(arm, tm, vels)
        if fast_interp:
            return spline_mod.nearest_eval_index(tm.geom, coeffs, u)[0]
        if getattr(arm, 'pallas_window', None):
            from rvspecfit_tpu.ops import pallas_spline as ps
            return ps.spline_eval_index_pallas_shared(
                tm.geom, coeffs, u, arm.pallas_window,
                interpret=_pallas_interpret())[0]
        return spline_mod.spline_eval_index(tm.geom, coeffs, u)[0]
    beta = vels / SPEED_OF_LIGHT
    dop = jnp.sqrt((1.0 - beta) / (1.0 + beta))
    q = arm.lam[None, :] * dop[:, None]
    if fast_interp:
        u = spline_mod.fractional_index_device(tm.geom, q)
        return spline_mod.nearest_eval_index(tm.geom, coeffs, u)[0]
    return jax.vmap(
        lambda x: spline_mod.spline_eval(tm.geom, coeffs, x)[0])(q)


def _eval_doppler(arm, tm, coeffs, vels, fast_interp=False):
    """Doppler-shifted template evaluation at the arm pixels.

    Uses the cancellation-free fractional-index path when the arm
    carries precomputed indices (ops.spline.spline_eval_index) —
    essential on TPUs where per-query float32 logs jitter the knot
    assignment; falls back to direct wavelength evaluation otherwise.
    ``fast_interp`` switches to nearest-pixel gathers on raw template
    values (reference: spec_fit.py:913-918).

    coeffs: (T, 4, n-1) per-trial planes-first spline coefficients (or (T, n) raw
    values in fast_interp mode); vels: (T,).  Returns (T, npix).
    """
    if arm.idx0 is not None:
        u = _doppler_u(arm, tm, vels)
        if fast_interp:
            return jax.vmap(lambda c, uu: spline_mod.nearest_eval_index(
                tm.geom, c, uu)[0])(coeffs, u)
        if getattr(arm, 'pallas_window', None):
            from rvspecfit_tpu.ops import pallas_spline as ps
            return ps.spline_eval_index_pallas(
                tm.geom, coeffs, u, arm.pallas_window,
                interpret=_pallas_interpret())[0]
        return jax.vmap(
            lambda c, uu: spline_mod.spline_eval_index(tm.geom, c,
                                                       uu)[0])(coeffs, u)
    beta = vels / SPEED_OF_LIGHT
    dop = jnp.sqrt((1.0 - beta) / (1.0 + beta))
    q = arm.lam[None, :] * dop[:, None]
    if fast_interp:
        u = spline_mod.fractional_index_device(tm.geom, q)
        return jax.vmap(lambda c, uu: spline_mod.nearest_eval_index(
            tm.geom, c, uu)[0])(coeffs, u)
    return jax.vmap(
        lambda c, x: spline_mod.spline_eval(tm.geom, c, x)[0])(coeffs, q)


def template_stage(tm: TemplateModel, params, vsinis, use_vsini,
                   half_width, fast_interp=False):
    """Evaluate + broaden + spline-construct templates for T trials.

    Returns (coeffs (T,4,n-1), outside (T,), crap (T,), finite (T,)).
    With ``fast_interp`` the spline construction is skipped and raw
    (broadened) knot values (T, n) are returned instead.
    """
    spec_t, outside = tm.eval_batch(params)           # (T, npixt)
    finite_t = jnp.isfinite(spec_t).all(axis=-1)
    maxabs = jnp.max(jnp.abs(jnp.where(jnp.isfinite(spec_t), spec_t, 0.0)),
                     axis=-1)
    # template garbage detection (reference spec_fit.py:392-397);
    # clamp the threshold into the working dtype's range (float32
    # cannot represent 1e100)
    max_val = min(MAX_TEMPLATE_VALUE,
                  float(jnp.finfo(spec_t.dtype).max) / 4)
    crap = (outside > 0) & (~finite_t | (maxabs > max_val))
    spec_safe = jnp.where(finite_t[:, None], spec_t, 1.0)
    if use_vsini:
        kern = jax.vmap(
            lambda v: vsini_mod.rotation_kernel(
                v, tm.log_step, half_width, dtype=spec_safe.dtype))(vsinis)
        spec_safe = jax.vmap(vsini_mod.convolve_kernel_same)(spec_safe, kern)
    if fast_interp:
        return spec_safe, outside, crap, finite_t
    coeffs = spline_mod.spline_coeffs(tm.geom, spec_safe)
    return coeffs, outside, crap, finite_t


def chisq_trials_core(arms, templates, vels, params, vsinis, *, badchi,
                      use_vsini, half_widths, outside_penalty, solve_dtype,
                      fast_interp=False):
    """Pure batched -2logL over T trial points for one object.

    arms : list of ArmState (leaves may carry extra batch axes when
        vmapped by the multi-fiber path)
    templates : dict setup -> TemplateModel
    vels, vsinis : (T,); params : (T, ndim)
    Remaining arguments are static.
    """
    vels = jnp.atleast_1d(vels)

    stage = {s: template_stage(templates[s], params, vsinis, use_vsini,
                               half_widths.get(s), fast_interp)
             for s in templates}

    total = jnp.zeros_like(vels)
    for arm in arms:
        coeffs, outside, crap, finite_t = stage[arm.setup]
        tm = templates[arm.setup]
        val = _eval_doppler(arm, tm, coeffs, vels,
                            fast_interp=fast_interp)  # (T, npix)
        if arm.band is not None:
            val = jax.vmap(arm.band.matvec)(val)
        t_over_e = val * arm.espec_inv[None, :] if arm.espec_inv.ndim == 1 \
            else val * arm.espec_inv
        chi = chisq_mod.chisq_continuum_marg_batch(
            arm.dvec, t_over_e, arm.polys,
            chisq_mod.basis_products(arm.polys), arm.log_espec_sum,
            solve_dtype=solve_dtype)

        penalty = outside * badchi if outside_penalty else 0.0
        good = jnp.isfinite(chi)
        # salvage: non-finite chi2 for a finite template outside the
        # grid contributes penalty only (spec_fit.py:963-969);
        # non-finite inside the grid -> inf
        inf = jnp.asarray(jnp.inf, dtype=vels.dtype)
        contrib = jnp.where(
            crap, 1000.0 * badchi,
            jnp.where(good, chi + penalty,
                      jnp.where((outside > 0) & finite_t, penalty, inf)))
        total = total + contrib
    return total


def scan_core(arms, templates, vels, param, vsini, *, badchi, use_vsini,
              half_widths, outside_penalty, solve_dtype,
              fast_interp=False):
    """-2logL over a velocity grid at ONE parameter point.

    The template stage (interpolation, broadening, spline
    construction) runs once and is reused for every velocity — the
    fast path for velocity grid scans, where the generic per-trial
    path would redo it V times.
    """
    vels = jnp.atleast_1d(vels)

    stage = {s: template_stage(templates[s], param[None, :], vsini[None],
                               use_vsini, half_widths.get(s), fast_interp)
             for s in templates}

    total = jnp.zeros_like(vels)
    for arm in arms:
        coeffs, outside, crap, finite_t = stage[arm.setup]
        coeffs, outside, crap, finite_t = (coeffs[0], outside[0], crap[0],
                                           finite_t[0])
        tm = templates[arm.setup]
        val = _eval_doppler_single(arm, tm, coeffs, vels,
                                   fast_interp=fast_interp)  # (V, npix)
        if arm.band is not None:
            val = jax.vmap(arm.band.matvec)(val)
        t_over_e = val * arm.espec_inv[None, :]
        chi = chisq_mod.chisq_continuum_marg_batch(
            arm.dvec, t_over_e, arm.polys,
            chisq_mod.basis_products(arm.polys), arm.log_espec_sum,
            solve_dtype=solve_dtype)

        penalty = outside * badchi if outside_penalty else 0.0
        good = jnp.isfinite(chi)
        inf = jnp.asarray(jnp.inf, dtype=vels.dtype)
        contrib = jnp.where(
            crap, 1000.0 * badchi,
            jnp.where(good, chi + penalty,
                      jnp.where((outside > 0) & finite_t, penalty, inf)))
        total = total + contrib
    return total


import functools


@functools.lru_cache(maxsize=None)
def _shared_trials_fn(badchi, use_vsini, half_widths_items,
                      outside_penalty, solve_dtype_name, fast_interp):
    """One compiled trials program per static configuration, shared by
    every FusedChisq instance; arms and templates are traced args."""
    solve_dtype = None if solve_dtype_name is None else \
        jnp.dtype(solve_dtype_name)
    half_widths = dict(half_widths_items)

    @jax.jit
    def fn(arms, templates, vels, params, vsinis):
        return chisq_trials_core(
            tuple(arms), templates, vels, params, vsinis,
            badchi=badchi, use_vsini=use_vsini,
            half_widths=half_widths, outside_penalty=outside_penalty,
            solve_dtype=solve_dtype, fast_interp=fast_interp)

    return fn


class FusedChisq:
    """Compiled batched likelihood for a fixed set of datasets.

    Parameters
    ----------
    specdata : list of SpecData
    templates : dict setup-name -> TemplateModel (must contain every
        dataset's name, or provide ``setup_of`` to map names)
    config : mapping with min_vel/max_vel/max_vsini
    options : dict, npoly (default 5) and rbf_continuum (default True)
    resol_mats : optional dict name -> BandedMatrix (per-call
        resolution; exclusive with per-SpecData resolution)
    espec_systematic : optional float or dict name -> float
    use_vsini : static bool — whether trial points carry a vsini to
        convolve with (fixed-but-nonzero vsini also needs True)
    outside_penalty : include the outside-grid penalty term
    solve_dtype : dtype for the tiny continuum solves (None = input)
    dtype : device dtype of the constants (None = jax default)
    """

    def __init__(self, specdata, templates, config, options=None,
                 resol_mats=None, espec_systematic=None, use_vsini=False,
                 outside_penalty=True, solve_dtype=None, dtype=None):
        if isinstance(specdata, SpecData):
            specdata = [specdata]
        options = options or {}
        self.npoly = options.get('npoly') or 5
        self.rbf = options.get('rbf_continuum', True)
        self.fast_interp = bool(options.get('fast_interp', False))
        self.config = config
        self.use_vsini = bool(use_vsini)
        self.outside_penalty = bool(outside_penalty)
        self.solve_dtype = solve_dtype
        self.specdata = list(specdata)

        self.templates = {}
        for sd in specdata:
            if sd.name not in templates:
                raise KeyError(f'no template model for setup {sd.name!r}')
            self.templates[sd.name] = templates[sd.name]

        self.arms = []
        for sd in specdata:
            sysdict = espec_systematic
            if isinstance(espec_systematic, dict):
                sysdict = espec_systematic[sd.name]
            rm = None if resol_mats is None else resol_mats.get(sd.name)
            self.arms.append(ArmState.build(
                sd, npoly=self.npoly, rbf=self.rbf,
                espec_systematic=sysdict, resol_matrix=rm, dtype=dtype,
                geom=templates[sd.name].geom))

        min_vel, max_vel = config['min_vel'], config['max_vel']
        for sd in self.specdata:
            _overlap_check(self.templates[
                self.arms[self.specdata.index(sd)].setup],
                sd.lam, min_vel, max_vel)

        self.badchi = float(10 * sum(a.npix for a in self.arms))
        # static vsini kernel half-width from the configured max vsini
        self._half_widths = {}
        if self.use_vsini:
            for s, tm in self.templates.items():
                self._half_widths[s] = vsini_mod.kernel_half_width(
                    float(config['max_vsini']), tm.log_step)

        # module-level jitted cores shared across FusedChisq instances
        # (vel_fit.process builds one FusedChisq per object; per-
        # instance jits would retrace and recompile per object, and
        # closing over arms/templates would bake tens of MB of
        # constants into each executable)
        self._jit_trials_core = _shared_trials_fn(
            self.badchi, self.use_vsini,
            tuple(sorted(self._half_widths.items())),
            self.outside_penalty,
            None if self.solve_dtype is None else
            np.dtype(self.solve_dtype).name,
            self.fast_interp)
        self._jit_full = jax.jit(self._full_single)

    # ---------------- core batched computation ----------------

    def _template_stage(self, setup, params, vsinis):
        """(T,ndim),(T,) -> spline coeffs (T,4,n-1), outside, crap, finite."""
        return template_stage(self.templates[setup], params, vsinis,
                              self.use_vsini, self._half_widths.get(setup),
                              self.fast_interp)

    def _chisq_trials(self, vels, params, vsinis):
        """(T,),(T,ndim),(T,) -> (T,) total -2logL."""
        return chisq_trials_core(
            self.arms, self.templates, vels, params, vsinis,
            badchi=self.badchi, use_vsini=self.use_vsini,
            half_widths=self._half_widths,
            outside_penalty=self.outside_penalty,
            solve_dtype=self.solve_dtype, fast_interp=self.fast_interp)

    # ---------------- public API ----------------

    def chisq_trials(self, vels, params, vsinis=None, chunk=None):
        """Batched -2logL at trial points.

        vels : (T,), params : (T, ndim), vsinis : (T,) or None.
        ``chunk`` optionally bounds the compiled batch size (the last
        chunk is padded, so only two program shapes ever compile).
        """
        vels = jnp.asarray(vels)
        params = jnp.asarray(params)
        t = vels.shape[0]
        if vsinis is None:
            vsinis = jnp.zeros(t, dtype=vels.dtype)
        else:
            vsinis = jnp.asarray(vsinis)
        run = lambda v, p, w: self._jit_trials_core(
            tuple(self.arms), self.templates, v, p, w)
        if chunk is None or t <= chunk:
            return run(vels, params, vsinis)
        outs = []
        for i in range(0, t, chunk):
            sl = slice(i, min(i + chunk, t))
            v, p, w = vels[sl], params[sl], vsinis[sl]
            pad = chunk - v.shape[0]
            if pad:
                v = jnp.pad(v, (0, pad))
                p = jnp.pad(p, ((0, pad), (0, 0)), mode='edge')
                w = jnp.pad(w, (0, pad))
            outs.append(run(v, p, w)[:sl.stop - sl.start])
        return jnp.concatenate(outs)

    def chisq_one(self, vel, params, vsini=None):
        """Scalar convenience wrapper."""
        v = jnp.asarray([vel], dtype=jnp.asarray(self.arms[0].lam).dtype)
        p = jnp.asarray(params)[None, :]
        w = None if vsini is None else jnp.asarray([vsini])
        return float(self.chisq_trials(v, p, w)[0])

    # ---------------- full-output path ----------------

    def _full_single(self, vel, params, vsini):
        """Models + per-arm statistics at one point
        (reference: spec_fit.py:946-961)."""
        coeffs_by_setup = {
            s: self._template_stage(s, params[None, :], vsini[None])
            for s in self.templates}
        out = {'models': [], 'raw_models': [], 'chisq_marg': []}
        for arm in self.arms:
            coeffs, outside, crap, finite_t = coeffs_by_setup[arm.setup]
            tm = self.templates[arm.setup]
            val = _eval_doppler_single(arm, tm, coeffs[0], vel[None],
                                       fast_interp=self.fast_interp)[0]
            if arm.band is not None:
                val = arm.band.matvec(val)
            t_over_e = val * arm.espec_inv
            chi, coef = chisq_mod.chisq_continuum_marg(
                arm.dvec, t_over_e, arm.polys, arm.log_espec_sum,
                solve_dtype=self.solve_dtype, with_coeffs=True)
            model = jnp.dot(coef, arm.polys * val[None, :],
                            precision=jax.lax.Precision.HIGHEST)
            out['models'].append(model)
            out['raw_models'].append(val)
            out['chisq_marg'].append(chi)
        return out

    def full_output(self, vel, params, vsini=None):
        """Chi-square + best-fit models + per-arm true chi-squares.

        Returns a dict with the reference's full_output keys
        (spec_fit.py:977-986): chisq, logl, chisq_array,
        red_chisq_array, npix_array, models, raw_models.
        """
        dt = self.arms[0].dvec.dtype
        vel_j = jnp.asarray(vel, dtype=dt)
        par_j = jnp.asarray(params, dtype=dt)
        vs_j = jnp.asarray(0.0 if vsini is None else vsini, dtype=dt)
        raw = self._jit_full(vel_j, par_j, vs_j)
        chisq_total = float(self.chisq_trials(
            vel_j[None], par_j[None, :],
            None if vsini is None else vs_j[None])[0])

        models = [np.asarray(m) for m in raw['models']]
        ret = dict(chisq=chisq_total, logl=-0.5 * chisq_total,
                   models=models,
                   raw_models=[np.asarray(m) for m in raw['raw_models']],
                   chisq_array=[], red_chisq_array=[], npix_array=[])
        for sd, model in zip(self.specdata, models):
            dev = (model - sd.spec) / sd.espec
            mask = ~sd.badmask
            true_chi = float((dev[mask]**2).sum())
            npixg = int(mask.sum())
            ret['chisq_array'].append(true_chi)
            ret['npix_array'].append(npixg)
            ret['red_chisq_array'].append(true_chi / max(npixg, 1))
        return ret


def get_chisq_continuum(specdata, options=None):
    """Continuum-only fit quality per dataset
    (reference: py/rvspecfit/spec_fit.py:739-783).

    Fits each spectrum with the continuum basis times a flat template
    (resolution-convolved when the dataset has one) and returns proper
    and reduced chi-squares.
    """
    options = options or {}
    npoly = options.get('npoly') or 5
    rbf = options.get('rbf_continuum', True)
    chisq_array = np.zeros(len(specdata))
    redchisq_array = np.zeros(len(specdata))
    for i, sd in enumerate(specdata):
        arm = ArmState.build(sd, npoly=npoly, rbf=rbf)
        templ = jnp.ones(len(sd.spec), dtype=arm.dvec.dtype)
        if arm.band is not None:
            templ = arm.band.matvec(templ)
        _, coef = chisq_mod.chisq_continuum_marg(
            arm.dvec, templ * arm.espec_inv, arm.polys, arm.log_espec_sum,
            with_coeffs=True)
        model = np.asarray(jnp.dot(coef, arm.polys * templ[None, :],
                                   precision=jax.lax.Precision.HIGHEST))
        dev = (model - sd.spec) / sd.espec
        mask = ~sd.badmask
        chisq_array[i] = (dev[mask]**2).sum()
        redchisq_array[i] = chisq_array[i] / max(mask.sum(), 1)
    return dict(chisq_array=chisq_array, redchisq_array=redchisq_array)
