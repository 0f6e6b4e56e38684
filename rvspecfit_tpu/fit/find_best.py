"""Velocity x parameter grid scans and posterior moments.

Equivalent of the reference find_best
(reference: py/rvspecfit/spec_fit.py:992-1092), with the (velocity,
parameter) grid evaluated as one batched call into the fused
likelihood instead of a double Python loop.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def quadratic_interp_min(vel_grid, chisq, i):
    """Refine the grid minimum with a parabola through 3 points
    (reference: py/rvspecfit/spec_fit.py:992-1015).  Falls back to the
    grid point if the parabola vertex leaves the bracketing interval
    (the reference asserts instead)."""
    if i == 0 or i == len(vel_grid) - 1:
        return float(vel_grid[i])
    x = vel_grid[i - 1:i + 2]
    y = chisq[i - 1:i + 2]
    a2, a1, _ = np.polyfit(x, y, 2)
    if a2 <= 0:
        return float(vel_grid[i])
    val = -a1 / 2 / a2
    if not (vel_grid[i - 1] < val < vel_grid[i + 1]):
        return float(vel_grid[i])
    return float(val)


def find_best(fused, vel_grid, params_list, vsini=None, quadratic=True,
              chunk=16384):
    """Scan chi-square over (velocity grid) x (parameter list).

    Parameters
    ----------
    fused : FusedChisq
    vel_grid : (V,) velocities
    params_list : (P, ndim) parameter vectors
    vsini : scalar applied to all trials, or None
    quadratic : refine the velocity minimum with a parabola
    chunk : max batch per compiled call

    Returns
    -------
    dict with best_chi, best_vel, vel_err, best_param, skewness,
    kurtosis, probs (reference keys, spec_fit.py:1086-1092) plus the
    full (V, P) chisq array.
    """
    vel_grid = np.asarray(vel_grid, dtype=np.float64)
    params_list = np.atleast_2d(np.asarray(params_list, dtype=np.float64))
    nv, npar = len(vel_grid), len(params_list)

    vels = jnp.asarray(np.tile(vel_grid, npar))
    pars = jnp.asarray(np.repeat(params_list, nv, axis=0))
    vsinis = None
    if vsini is not None:
        vsinis = jnp.full((nv * npar,), float(vsini))
    chis = np.asarray(fused.chisq_trials(vels, pars, vsinis, chunk=chunk))
    chisq = chis.reshape(npar, nv).T                     # (V, P)

    xind = np.argmin(chisq)
    i1, i2 = np.unravel_index(xind, chisq.shape)
    dchi = chisq[:, i2] - chisq[i1, i2]
    probs = np.exp(-0.5 * np.clip(dchi, 0, 1400))
    probs = probs / probs.sum()
    if quadratic:
        best_vel = quadratic_interp_min(vel_grid, chisq[:, i2], i1)
    else:
        best_vel = float(vel_grid[i1])
    best_err = float(np.sqrt((probs * (vel_grid - best_vel)**2).sum()))
    if best_err < 1e-10:
        kurtosis, skewness = 0.0, 0.0
    else:
        kurtosis = float(((probs * (vel_grid - best_vel)**4).sum())
                         / best_err**4)
        skewness = float(((probs * (vel_grid - best_vel)**3).sum())
                         / best_err**3)
    return dict(best_chi=float(chisq[i1, i2]),
                best_vel=best_vel,
                vel_err=best_err,
                best_param=params_list[i2],
                kurtosis=kurtosis,
                skewness=skewness,
                probs=probs,
                chisq_grid=chisq)
