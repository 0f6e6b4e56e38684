"""Maximum-likelihood fit driver.

Equivalent of the reference per-object fit
(reference: py/rvspecfit/vel_fit.py:505-737 `process` and helpers),
re-built around the fused batched likelihood:

1. velocity grid scan at the starting parameters;
2. batched Nelder-Mead on [vel, vsini?, free atmospheric params] with
   the vsini clip+quadratic-penalty transform, velocity bounds, and
   Gaussian priors; restart (fresh simplex around the current best)
   up to two times;
3. optional gradient polish ("second minimizer") using *exact* JAX
   gradients of the fused likelihood through BFGS (the reference uses
   numerical BFGS);
4. iterative velocity-grid refinement around the optimum until the
   step resolves the uncertainty (same control logic as the
   reference's _minimum_sampler, vel_fit.py:358-439), run on
   fixed-size padded grids so only two program shapes ever compile;
5. exact parameter uncertainties from the AD Hessian of the
   likelihood (replacing numdifftools), with the reference's robust
   inversion fallbacks.
"""
from __future__ import annotations

import itertools
import logging
import math

import numpy as np
import scipy.linalg
import scipy.optimize
import jax
import jax.numpy as jnp

from rvspecfit_tpu.fit import neldermead as nm
from rvspecfit_tpu.fit.likelihood import FusedChisq
from rvspecfit_tpu.fit.find_best import find_best, quadratic_interp_min

SIMPLEX_SEED = 20260816


class VSiniMapper:
    """Internal <-> physical vsini with quadratic out-of-range penalty
    (reference: py/rvspecfit/vel_fit.py:97-116).  ``min_vsini``
    (config key, reference vel_fit.py:566) floors the fitted rotation:
    below ~0.01 km/s broadening is unresolvable and the kernel width
    degenerates, so the optimizer is kept out of that regime."""

    def __init__(self, max_vsini, min_vsini=0.0):
        self.max_vsini = float(max_vsini)
        self.min_vsini = float(min_vsini)

    def to_internal(self, vsini):
        return float(np.clip(vsini, self.min_vsini, self.max_vsini))

    def to_vsini(self, x):
        v = jnp.clip(x, self.min_vsini, self.max_vsini)
        penalty = (v - x)**2
        return v, penalty


class ParamMapper:
    """Pack/unpack the optimization vector
    [vel, vsini?, free atmospheric params]
    (reference: py/rvspecfit/vel_fit.py:119-207)."""

    def __init__(self, specParams, paramDict0, fixParam, vsiniMapper,
                 fitVsini):
        self.specParams = tuple(specParams)
        self.paramDict0 = dict(paramDict0)
        self.fixParam = tuple(fixParam or ())
        self.vsiniMapper = vsiniMapper
        self.fitVsini = bool(fitVsini)
        self.free_names = [p for p in self.specParams
                           if p not in self.fixParam]

    @property
    def nvec(self):
        return 1 + int(self.fitVsini) + len(self.free_names)

    def cache_key(self):
        """Content key for compiled-program caches.

        Two mappers with equal keys produce identical ``unpack``
        traces (and hence identical jitted objectives), so programs
        built for one can serve the other.  ``paramDict0`` enters the
        trace only through the FIXED parameters — the free-parameter
        starting values are runtime data — so only those are keyed;
        this is what lets a multi-file survey run reuse one program
        set even though each file builds a fresh mapper with its own
        mean starting point.
        """
        vs = None
        if self.vsiniMapper is not None:
            vs = (float(self.vsiniMapper.min_vsini),
                  float(self.vsiniMapper.max_vsini))
        fixed_vals = tuple(
            (p, float(self.paramDict0[p])) for p in self.fixParam
            if p in self.paramDict0)
        return (self.specParams, self.fixParam, fixed_vals, vs,
                self.fitVsini)

    def get_fitted_params(self):
        out = ['vel']
        if self.fitVsini:
            out.append('vsini')
        out.extend(self.free_names)
        return out

    def start_vector(self, best_vel):
        vec = [best_vel]
        if self.fitVsini:
            vec.append(self.vsiniMapper.to_internal(
                self.paramDict0['vsini']))
        vec.extend(self.paramDict0[p] for p in self.free_names)
        return np.array(vec, dtype=np.float64)

    def scales(self):
        std = {'logg': 0.5, 'teff': 300.0, 'feh': 0.5, 'alpha': 0.25}
        vec = [5.0]
        if self.fitVsini:
            vec.append(3.0)
        vec.extend(std.get(p, 0.5) for p in self.free_names)
        return np.array(vec, dtype=np.float64)

    def unpack_host(self, pvec):
        """Numpy version of :meth:`unpack` for host post-processing
        (avoids device round-trips on fetched optimizer results)."""
        pvec = np.atleast_2d(np.asarray(pvec, np.float64))
        b = pvec.shape[0]
        vel = pvec[:, 0]
        idx = 1
        if self.fitVsini:
            vsini = np.clip(pvec[:, 1], self.vsiniMapper.min_vsini,
                            self.vsiniMapper.max_vsini)
            idx = 2
        elif 'vsini' in self.fixParam:
            vsini = np.full(b, float(self.paramDict0['vsini']))
        else:
            vsini = np.zeros(b)
        cols = []
        free_iter = itertools.count(idx)
        for p in self.specParams:
            if p in self.fixParam:
                cols.append(np.full(b, float(self.paramDict0[p])))
            else:
                cols.append(pvec[:, next(free_iter)])
        return vel, np.stack(cols, axis=1), vsini

    def unpack(self, pvec):
        """Batched (B, nvec) -> (vel (B,), params (B, ndim), vsini (B,),
        penalty (B,)).  vsini is 0 when rotation is not modeled."""
        pvec = jnp.atleast_2d(pvec)
        b = pvec.shape[0]
        vel = pvec[:, 0]
        idx = 1
        penalty = jnp.zeros(b, dtype=pvec.dtype)
        if self.fitVsini:
            vsini, penalty = self.vsiniMapper.to_vsini(pvec[:, 1])
            idx = 2
        elif 'vsini' in self.fixParam:
            vsini = jnp.full(b, float(self.paramDict0['vsini']),
                             dtype=pvec.dtype)
        else:
            vsini = jnp.zeros(b, dtype=pvec.dtype)
        cols = []
        free_iter = itertools.count(idx)
        for p in self.specParams:
            if p in self.fixParam:
                cols.append(jnp.full(b, float(self.paramDict0[p]),
                                     dtype=pvec.dtype))
            else:
                cols.append(pvec[:, next(free_iter)])
        params = jnp.stack(cols, axis=1)
        return vel, params, vsini, penalty


def _make_objective(fused, mapper, config, priors):
    """Batched objective (B, nvec) -> (B,) with bounds + priors
    (reference: py/rvspecfit/vel_fit.py:210-257)."""
    min_vel = float(config['min_vel'])
    max_vel = float(config['max_vel'])
    prior_rows = []
    if priors:
        for i, pname in enumerate(mapper.specParams):
            if pname in priors:
                mu, sig = priors[pname]
                prior_rows.append((i, float(mu), float(sig)))

    def objective(pvec):
        vel, params, vsini, penalty = mapper.unpack(pvec)
        chis = fused._chisq_trials(vel, params, vsini)
        for i, mu, sig in prior_rows:
            chis = chis + ((params[:, i] - mu) / sig)**2
        chis = chis + penalty
        bad = ((vel > max_vel) | (vel < min_vel)
               | ~jnp.isfinite(params).all(axis=1))
        return jnp.where(bad, 1e30, chis)

    return objective


def _minimum_sampler(scan_fn, best_vel, min_vel, max_vel, vel_step0,
                     min_vel_step, crit_ratio=5.0, goal_width=10.0,
                     maxiter=10):
    """Iterative velocity-grid refinement
    (reference control logic: py/rvspecfit/vel_fit.py:358-439)."""
    best_vel = float(np.clip(best_vel, min_vel, max_vel))
    vel_step = vel_step0
    res = None
    for it in range(maxiter):
        grid_lo = math.ceil((min_vel - best_vel) / vel_step) * vel_step
        vels = np.arange(grid_lo, max_vel - best_vel, vel_step) + best_vel
        best_vel, cur_err, res = scan_fn(vels)
        if vel_step < cur_err / crit_ratio or vel_step < min_vel_step:
            break
        if vel_step > cur_err:
            # step does not resolve the uncertainty yet
            vel_step_new = vel_step / crit_ratio
            width_new = vel_step * goal_width
        else:
            vel_step_new = cur_err / crit_ratio * 0.8
            width_new = cur_err * goal_width
        min_vel = max(best_vel - width_new, min_vel)
        max_vel = min(best_vel + width_new, max_vel)
        vel_step = vel_step_new
    if it > 5:
        logging.warning('Velocity-error refinement used %d iterations', it)
    return best_vel, cur_err, res


def _scan_velocities_padded(fused, vels, param, vsini, pad_to=None):
    """find_best for one parameter vector on a padded fixed-size grid.

    Padding repeats the final velocity and is excluded from the
    minimum search and moments, so refinement iterations reuse one
    compiled shape.
    """
    nv = len(vels)
    if pad_to is None:
        pad_to = 1 << (nv - 1).bit_length()
    vels_p = np.concatenate([vels, np.full(pad_to - nv, vels[-1])])
    chis = np.asarray(fused.chisq_trials(
        jnp.asarray(vels_p),
        jnp.asarray(np.tile(param, (pad_to, 1))),
        None if vsini is None else jnp.full(pad_to, float(vsini))))[:nv]
    i1 = int(np.argmin(chis))
    best_vel = quadratic_interp_min(vels, chis, i1)
    dchi = chis - chis[i1]
    probs = np.exp(-0.5 * np.clip(dchi, 0, 1400))
    probs /= probs.sum()
    err = float(np.sqrt((probs * (vels - best_vel)**2).sum()))
    if err < 1e-10:
        skew = kurt = 0.0
    else:
        kurt = float((probs * (vels - best_vel)**4).sum() / err**4)
        skew = float((probs * (vels - best_vel)**3).sum() / err**3)
    return best_vel, err, dict(best_vel=best_vel, vel_err=err,
                               skewness=skew, kurtosis=kurt,
                               best_chi=float(chis[i1]))


def _uncertainties_from_hessian(hessian, quiet=False):
    """Robust parameter errors + covariance from a (possibly bad)
    Hessian (reference: py/rvspecfit/vel_fit.py:463-502).

    ``quiet`` demotes the per-object warning to DEBUG — the batch
    driver counts failures across the fiber batch and logs ONE
    summary line instead (reference warning policy:
    desi_fit.py:381-430)."""
    diag_h = np.diag(hessian)
    inv_diag = 1.0 / (diag_h + (diag_h == 0))
    inv_diag[diag_h == 0] = np.inf
    bad_hessian = False
    try:
        hess_inv = scipy.linalg.inv(hessian)
    except (np.linalg.LinAlgError, ValueError):
        bad_hessian = True
        logging.log(logging.DEBUG if quiet else logging.WARNING,
                    'Hessian inversion failed')
        hess_inv = np.diag(inv_diag)
    diag_err0 = np.array(np.diag(hess_inv), dtype=np.float64)
    diag_err1 = inv_diag
    bad0 = diag_err0 < 0
    bad1 = diag_err1 < 0
    if bad0.any():
        bad_hessian = True
    sub1 = bad0 & ~bad1
    sub2 = bad0 & bad1
    diag_err0[sub1] = diag_err1[sub1]
    diag_err0[sub2] = 0
    err = np.sqrt(diag_err0)
    err[sub2] = np.nan
    if (~np.isfinite(err)).any():
        bad_hessian = True
    return err, hess_inv, bad_hessian


def process(specdata, paramDict0, fixParam=None, options=None, config=None,
            resolParams=None, priors=None, templates=None,
            espec_systematic=None):
    """Full maximum-likelihood fit of one object.

    Mirrors the reference API (py/rvspecfit/vel_fit.py:505): specdata
    is a list of SpecData, paramDict0 the starting parameters (include
    'vsini' to model rotation; add it to fixParam to keep it fixed),
    priors maps parameter name -> (mean, sigma).

    ``templates`` maps setup name -> TemplateModel; if None they are
    loaded from config['template_lib'] via the template library loader.

    Returns the reference result keys: param, param_err, param_covar,
    vel, vel_err, vel_skewness, vel_kurtosis, [vsini], yfit,
    raw_models, chisq, logl, chisq_array, npix_array,
    minimize_success, bad_hessian.
    """
    if config is None:
        raise RuntimeError('config must be provided')
    if not isinstance(specdata, (list, tuple)):
        specdata = [specdata]
    options = options or {}
    fixParam = fixParam or []

    if templates is None:
        from rvspecfit_tpu.pipeline.library import load_template_models
        templates = load_template_models(
            config, setups={sd.name for sd in specdata})

    min_vel = config['min_vel']
    max_vel = config['max_vel']
    vel_step0 = config['vel_step0']
    min_vel_step = config['min_vel_step']
    second_minimizer = config.get('second_minimizer') or False
    # optional chunked-NM execution (see neldermead.minimize_batch):
    # recommended on remote-compile TPU backends
    nm_chunk = config.get('nm_chunk')

    fitVsini = 'vsini' in paramDict0 and 'vsini' not in fixParam
    use_vsini = 'vsini' in paramDict0
    vsiniMapper = VSiniMapper(config['max_vsini'],
                              config.get('min_vsini') or 0.0) \
        if fitVsini else None

    setup0 = specdata[0].name
    specParamNames = templates[setup0].parnames
    curparam = np.array([paramDict0[p] for p in specParamNames])

    import time as _time
    _t = [_time.time()]

    def _phase(name):
        # per-fit phase timing at DEBUG (reference: vel_fit.py:592-735)
        _t.append(_time.time())
        logging.debug('process() phase %s: %.3f s', name,
                      _t[-1] - _t[-2])

    fused = FusedChisq(specdata, templates, config, options=options,
                       resol_mats=resolParams, use_vsini=use_vsini,
                       espec_systematic=espec_systematic)
    _phase('setup')

    # ---- stage 1: velocity scan at starting parameters ----
    vels_grid = np.arange(min_vel, max_vel, vel_step0)
    rot0 = paramDict0.get('vsini') if use_vsini else None
    res = find_best(fused, vels_grid, [curparam], vsini=rot0)
    best_vel = res['best_vel']
    _phase('scan')

    # ---- stage 2: Nelder-Mead ----
    mapper = ParamMapper(specParamNames, paramDict0, fixParam, vsiniMapper,
                         fitVsini)
    objective = jax.jit(_make_objective(fused, mapper, config, priors))
    nvec = mapper.nvec

    def nm_objective(x):
        # NM contract: (B, K, n) -> (B, K); data is shared here so all
        # rows are equivalent trial points
        return objective(x.reshape(-1, nvec)).reshape(x.shape[:2])

    x0 = mapper.start_vector(best_vel)
    simplex = nm.build_simplex(jnp.asarray(x0[None]), mapper.scales(),
                               seed=SIMPLEX_SEED)
    minimize_success = True
    maxiter = 2
    nm_fatol = config.get('nm_fatol') or 1e-3
    for curiter in range(1, maxiter + 1):
        nmres = nm.minimize_batch(nm_objective, simplex, fatol=nm_fatol,
                                  xatol=tuple(mapper.scales() * 0.01),
                                  maxiter=10000,
                                  chunk=nm_chunk)
        xbest = np.asarray(nmres['x'])[0]
        if bool(nmres['converged'][0]):
            break
        if curiter == maxiter:
            logging.warning('Maximum number of NM restarts reached')
            minimize_success = False
            break
        # restart with a FRESH randomized simplex around the current
        # best: a converged-but-not-accepted simplex has collapsed, and
        # re-feeding it (what the reference does, vel_fit.py:643) just
        # replays the collapse; fresh vertices actually escape it
        simplex = nm.build_simplex(jnp.asarray(xbest[None]),
                                   mapper.scales(),
                                   seed=SIMPLEX_SEED + curiter)

    # ---- stage 3: optional gradient polish (exact AD gradients) ----
    if second_minimizer:
        vg = jax.jit(jax.value_and_grad(lambda p: objective(p[None])[0]))

        def fun_and_jac(p):
            v, g = vg(jnp.asarray(p))
            return float(v), np.asarray(g, dtype=np.float64)

        res2 = scipy.optimize.minimize(fun_and_jac, xbest, jac=True,
                                       method='BFGS')
        if np.isfinite(res2.fun) and res2.fun <= float(nmres['fun'][0]):
            xbest = res2.x

    _phase('neldermead')
    vel_b, params_b, vsini_b, _ = mapper.unpack(jnp.asarray(xbest[None]))
    best_params = np.asarray(params_b)[0]
    best_vel = float(np.asarray(vel_b)[0])
    best_vsini = float(np.asarray(vsini_b)[0]) if use_vsini else None

    ret = {}
    ret['param'] = dict(zip(specParamNames, best_params.tolist()))
    if fitVsini:
        ret['vsini'] = best_vsini

    # ---- stage 4: velocity refinement ----
    def scan_fn(vels):
        return _scan_velocities_padded(fused, vels, best_params, best_vsini)

    best_vel, vel_err, res1 = _minimum_sampler(
        scan_fn, best_vel, min_vel, max_vel, vel_step0, min_vel_step)
    _phase('refinement')
    ret['vel'] = best_vel
    ret['vel_err'] = vel_err
    ret['vel_skewness'] = res1['skewness']
    ret['vel_kurtosis'] = res1['kurtosis']

    # ---- stage 5: models at the optimum ----
    outp = fused.full_output(best_vel, best_params, best_vsini)
    _phase('models')

    # ---- stage 6: exact AD Hessian of 0.5*chisq over atm params ----
    prior_rows = []
    if priors:
        for i, pname in enumerate(specParamNames):
            if pname in priors:
                mu, sig = priors[pname]
                prior_rows.append((i, float(mu), float(sig)))

    def half_chisq(params):
        vs = jnp.asarray(0.0 if best_vsini is None else best_vsini)
        chi = fused._chisq_trials(jnp.asarray([best_vel]),
                                  params[None, :], vs[None])[0]
        for i, mu, sig in prior_rows:
            chi = chi + ((params[i] - mu) / sig)**2
        return 0.5 * chi

    hess = np.asarray(jax.hessian(half_chisq)(jnp.asarray(best_params)),
                      dtype=np.float64)
    diag_err, covar, bad_hessian = _uncertainties_from_hessian(hess)
    _phase('hessian')
    logging.debug('process() total: %.3f s', _t[-1] - _t[0])

    ret['param_err'] = dict(zip(specParamNames, diag_err.tolist()))
    ret['param_covar'] = covar
    ret['minimize_success'] = minimize_success
    ret['bad_hessian'] = bad_hessian
    ret['yfit'] = outp['models']
    ret['raw_models'] = outp['raw_models']
    ret['chisq'] = outp['chisq']
    ret['logl'] = outp['logl']
    ret['chisq_array'] = outp['chisq_array']
    ret['npix_array'] = outp['npix_array']
    return ret


def firstguess(specdata, options=None, config=None, resolParams=None,
               vsinigrid=(None, 10, 100), paramsgrid=None, templates=None):
    """Brute-force starting point over a small template grid
    (reference: py/rvspecfit/vel_fit.py:13-94)."""
    options = options or {}
    if templates is None:
        from rvspecfit_tpu.pipeline.library import load_template_models
        templates = load_template_models(
            config, setups={sd.name for sd in specdata})
    if paramsgrid is None:
        paramsgrid = {'logg': [1, 2, 3, 4, 5],
                      'teff': [3000, 5000, 8000, 10000],
                      'feh': [-2, -1, 0],
                      'alpha': [0]}
    specParams = templates[specdata[0].name].parnames
    params = []
    for combo in itertools.product(*paramsgrid.values()):
        cur = dict(zip(paramsgrid.keys(), combo))
        params.append([cur[p] for p in specParams])
    vels_grid = np.arange(config['min_vel'], config['max_vel'],
                          config['vel_step0'])

    best_chisq = np.inf
    bestpar = None
    for vsini in vsinigrid:
        fused = FusedChisq(specdata, templates, config, options=options,
                           resol_mats=resolParams,
                           use_vsini=vsini is not None)
        res = find_best(fused, vels_grid, params, vsini=vsini)
        if res['best_chi'] < best_chisq:
            bestpar = dict(zip(specParams, res['best_param']))
            if vsini is not None:
                bestpar['vsini'] = vsini
            best_chisq = res['best_chi']
    return bestpar
