"""Batched Nelder-Mead simplex minimization in JAX.

The reference drives its maximum-likelihood fit with scipy's
Nelder-Mead (reference: py/rvspecfit/vel_fit.py:630-650).  On TPU the
optimizer must (a) run under jit with fixed shapes and (b) optimize
*many* objects at once — each DESI fiber is an independent small
problem.  This module implements the standard simplex algorithm
(alpha=1, gamma=2, rho=0.5, sigma=0.5, scipy-compatible fatol/xatol
convergence) natively over a batch axis:

* candidate evaluation follows scipy's literal flow by default
  (``scan2``: reflection, then the one derived second candidate, as a
  2-step lax.scan whose body holds the objective once) or evaluates
  ALL FOUR candidates in one (B, 4) call (``cand4``); both reduce
  exactly to scipy's decisions, and the default was fixed by on-chip
  A/B (see nm_scheme);
* the rare shrink step evaluates the shrunk simplex under a
  ``lax.cond`` so its cost is paid only on iterations where some
  unconverged instance actually shrinks;
* converged instances are frozen by masking, and the whole loop is a
  ``lax.while_loop`` that exits when all instances converge or the
  iteration cap is reached.  For straggler compaction across microbatch
  tiles, ``make_stepper`` exposes the jitted init/chunk programs so a
  host driver can repack unconverged instances between chunks (see
  fit/batch.py run_neldermead).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


_JIT_CACHE = {}


def nm_scheme():
    """Candidate-evaluation scheme (RVST_NM_SCHEME override).

    Production default is ``scan2`` — fixed by on-chip A/B
    (tools/ab_nm_scheme.py, TPU v5e, 500-fiber bench exposure):
    3.38 s vs cand4's 5.63 s NM wall with statistically identical
    optima (median dchi2 0.0; >1-dchi2 winners 8 vs 4, tie-breaking
    noise).  The objective is compute-bound at production widths, so
    halving the trial FLOPs beats halving the sequential depth.
    """
    return os.environ.get('RVST_NM_SCHEME', 'scan2')


def nm_ncand():
    """Objective trials dispatched per NM iteration per instance."""
    return 2 if nm_scheme() == 'scan2' else 4


def _sorted_simplex(simplex, fvals):
    order = jnp.argsort(fvals, axis=-1)                  # (B, n+1)
    f_sorted = jnp.take_along_axis(fvals, order, axis=-1)
    s_sorted = jnp.take_along_axis(simplex, order[..., None], axis=-2)
    return s_sorted, f_sorted


def minimize_batch(fun, initial_simplex, fatol=1e-3, xatol=1e-2,
                   maxiter=2000, jit=True, fun_args=(), chunk=None):
    """Minimize ``fun`` over a batch of simplexes.

    With ``jit=True`` (default) the entire optimization — including
    the initial simplex evaluation and the while_loop — compiles to a
    single XLA program, which matters on remote-compile backends
    where every distinct dispatched program pays a large latency.

    ``fun_args``: extra (traced) arguments forwarded to
    ``fun(x, *fun_args)`` — per-instance data passed this way keeps
    one compiled program across data tiles instead of a fresh closure
    (and compile) per tile.

    Parameters
    ----------
    fun : callable (B, K, n) -> (B, K) — batched objective.  The
        leading axis is the *instance* axis (each instance may carry
        its own data, e.g. one fiber per instance); K is the number of
        candidate points evaluated per instance in one call.
    initial_simplex : (B, n+1, n)
    fatol, xatol : scipy-compatible absolute tolerances
    maxiter : iteration cap

    ``chunk``: run the optimization as a host-driven sequence of
    jitted ``chunk``-iteration fori_loop programs with a tiny
    converged-flag fetch in between, instead of one while_loop
    program.  Functionally identical; the chunked programs contain
    the objective exactly once each, which keeps fragile remote TPU
    compilers alive.

    Returns
    -------
    dict with x (B, n), fun (B,), converged (B,), nit, final_simplex
    """
    simplex = jnp.asarray(initial_simplex)
    b, np1, n = simplex.shape
    assert np1 == n + 1

    if isinstance(xatol, (tuple, list)) or hasattr(xatol, 'shape'):
        xatol = tuple(float(x) for x in np.asarray(xatol).ravel())

    if chunk is not None:
        init_fn, chunk_fn = make_stepper(fun, fatol=fatol, xatol=xatol,
                                         chunk=chunk)
        simplex, fvals, done, alldone = init_fn(simplex, *fun_args)
        nit = 0
        while nit < maxiter and not bool(alldone):
            simplex, fvals, done, alldone, it = chunk_fn(
                simplex, fvals, done, *fun_args)
            nit += int(it)
        simplex, fvals = _sorted_simplex(simplex, fvals)
        return dict(x=simplex[:, 0, :], fun=fvals[:, 0], converged=done,
                    nit=nit, final_simplex=simplex)

    scheme = nm_scheme()
    if jit:
        key = (fun, fatol, xatol, maxiter, scheme)
        core = _JIT_CACHE.get(key)
        if core is None:
            core = jax.jit(partial(_minimize_core, fun, fatol=fatol,
                                   xatol=xatol, maxiter=maxiter,
                                   scheme=scheme))
            _JIT_CACHE[key] = core
    else:
        core = partial(_minimize_core, fun, fatol=fatol, xatol=xatol,
                       maxiter=maxiter, scheme=scheme)
    simplex, fvals, nit, done = core(simplex, *fun_args)
    return dict(x=simplex[:, 0, :], fun=fvals[:, 0], converged=done,
                nit=nit, final_simplex=simplex)


def make_stepper(fun, fatol=1e-3, xatol=1e-2, chunk=64):
    """Jitted ``(init_fn, chunk_fn)`` pair for host-driven NM.

    ``init_fn(simplex, *fun_args) -> (simplex, fvals, done, alldone)``
    evaluates the starting simplex; ``chunk_fn(simplex, fvals, done,
    *fun_args) -> (simplex, fvals, done, alldone, iters)`` advances up
    to ``chunk`` iterations (early exit once the whole tile
    converges).  A host driver can
    repack unconverged instances into fewer tiles between chunks
    (straggler compaction) — both programs are shape-polymorphic only
    in recompilation, so keep tile shapes fixed.
    """
    if isinstance(xatol, (tuple, list)) or hasattr(xatol, 'shape'):
        xatol = tuple(float(x) for x in np.asarray(xatol).ravel())
    scheme = nm_scheme()
    key = ('stepper', fun, fatol, xatol, chunk, scheme)
    fns = _JIT_CACHE.get(key)
    if fns is None:
        # the init program is scheme-independent (it only evaluates
        # the starting simplex): share one compiled copy across
        # schemes so an in-process A/B flip recompiles only the chunk
        ikey = ('stepper-init', fun, fatol, xatol)
        init_fn = _JIT_CACHE.get(ikey)
        if init_fn is None:
            init_fn = jax.jit(partial(_nm_init, fun, fatol=fatol,
                                      xatol=xatol))
            _JIT_CACHE[ikey] = init_fn
        chunk_fn = jax.jit(partial(_nm_chunk, fun, fatol=fatol,
                                   xatol=xatol, chunk=chunk,
                                   scheme=scheme))
        fns = (init_fn, chunk_fn)
        _JIT_CACHE[key] = fns
    return fns


def _nm_stats(simplex, fvals):
    big = jnp.asarray(jnp.finfo(simplex.dtype).max / 4, simplex.dtype)
    fsafe = jnp.where(jnp.isfinite(fvals), fvals, big)
    np1 = simplex.shape[1]
    iw = jnp.argmax(fsafe, axis=1)
    ohw = jax.nn.one_hot(iw, np1, dtype=simplex.dtype)
    f_worst = jnp.sum(ohw * fvals, axis=1)
    f_second = jnp.max(jnp.where(ohw > 0, -big, fsafe), axis=1)
    ib = jnp.argmin(fsafe, axis=1)
    ohb = jax.nn.one_hot(ib, np1, dtype=simplex.dtype)
    f_best = jnp.sum(ohb * fvals, axis=1)
    return ohw, ohb, f_worst, f_second, f_best


def _pick_row(oh, s):
    # where-based select, NOT an einsum: TPU matmuls default to
    # bfloat16 inputs, which would truncate the picked coordinates
    # (e.g. teff ~ 6000 to ~32 K resolution) every NM iteration
    return jnp.sum(jnp.where(oh[:, :, None] > 0, s, 0.0), axis=1)


def _nm_converged(simplex, fvals, fatol, xatol):
    """scipy-compatible convergence; ``xatol`` may be a scalar (raw
    parameter units, scipy semantics) or a per-dimension tuple/array —
    x-spread is then tested per dimension, so wildly different
    parameter scales (teff ~ 1e3 vs feh ~ 1e-1) each get a physically
    sensible tolerance instead of the tightest one dominating."""
    _, ohb, _, _, f_best = _nm_stats(simplex, fvals)
    best = _pick_row(ohb, simplex)
    fspread = jnp.max(jnp.abs(fvals - f_best[:, None]), axis=1)
    xdev = jnp.max(jnp.abs(simplex - best[:, None, :]), axis=1)  # (B,n)
    xa = jnp.asarray(xatol, simplex.dtype)
    xok = jnp.all(xdev <= xa, axis=1)
    return (fspread <= fatol) & xok


def _nm_body(fun, fun_args, simplex, fvals, done, fatol, xatol,
             scheme=None):
    """One NM iteration on an UNSORTED simplex.

    Best/worst rows are selected with one-hot contractions (no argsort
    / gather / scatter: scatter-based bodies crash remote TPU
    compilers, and einsum picks truncate to bfloat16 on the MXU).
    The shrunk simplex is evaluated only under a ``lax.cond`` when
    some unconverged instance actually needs the shrink step.
    Mathematically identical to scipy's implementation up to
    tie-breaking (verified against scipy in tests/test_neldermead.py).

    Two candidate-evaluation schemes (``RVST_NM_SCHEME`` env; the
    default is ``scan2``, fixed by on-chip A/B — see nm_scheme):

    * ``scan2`` — scipy's literal flow: evaluate the reflection,
      derive ONE second candidate per instance (expansion or a
      contraction, chosen by where-selects on fr), evaluate it.  The
      two sequential (B, 1) evaluations run as a 2-step ``lax.scan``
      whose body contains the objective exactly ONCE, so the compiled
      program stays the same size while each iteration costs 2
      objective trials per instance.
    * ``cand4`` — evaluate all four candidates (reflection, expansion,
      both contractions) in one (B, 4) call.  Fewer sequential device
      steps but twice the trial FLOPs; wins only when the objective is
      dispatch/overhead-bound rather than compute-bound.
    """
    alpha, gamma, rho, sigma = 1.0, 2.0, 0.5, 0.5
    if scheme is None:
        scheme = nm_scheme()
    n = simplex.shape[2]
    ohw, ohb, f_worst, f_second, f_best = _nm_stats(simplex, fvals)
    worst = _pick_row(ohw, simplex)
    best = _pick_row(ohb, simplex)
    centroid = (jnp.sum(simplex, axis=1) - worst) / n

    xr = centroid + alpha * (centroid - worst)
    if scheme == 'cand4':
        xe = centroid + gamma * (xr - centroid)
        xc_out = centroid + rho * (xr - centroid)
        xc_in = centroid - rho * (centroid - worst)
        cand = jnp.stack([xr, xe, xc_out, xc_in], axis=1)  # (B, 4, n)
        fcand = fun(cand, *fun_args)                       # (B, 4)
        fr, fe, fco, fci = (fcand[:, 0], fcand[:, 1], fcand[:, 2],
                            fcand[:, 3])
        take_expansion = (fr < f_best) & (fe < fr)
        x2 = jnp.where(take_expansion[:, None], xe,
                       jnp.where((fr >= f_worst)[:, None], xc_in,
                                 xc_out))
        f2 = jnp.where(take_expansion, fe,
                       jnp.where(fr >= f_worst, fci, fco))
    else:
        # scan2: phase 0 evaluates the reflection and constructs the
        # per-instance second candidate; phase 1 evaluates it.  One
        # objective call site total (the scan body).
        def phase(carry, is_first):
            x_eval, fr_c, x2_c = carry
            f = fun(x_eval[:, None, :], *fun_args)[:, 0]   # (B,)
            # second candidate from the (phase-0) reflection value:
            #   fr < f_best            -> expansion
            #   fr >= f_worst          -> inside contraction
            #   otherwise              -> outside contraction
            # (when fr lands in [f_best, f_second) scipy accepts the
            # reflection without a second evaluation; the extra value
            # computed here is simply never accepted below)
            x2_new = jnp.where(
                (f < f_best)[:, None],
                centroid + gamma * (x_eval - centroid),
                jnp.where((f >= f_worst)[:, None],
                          centroid - rho * (centroid - worst),
                          centroid + rho * (x_eval - centroid)))
            fr_n = jnp.where(is_first, f, fr_c)
            x2_n = jnp.where(is_first, x2_new, x2_c)
            return (jnp.where(is_first, x2_n, x_eval), fr_n, x2_n), f
        (_, fr, x2), fs = jax.lax.scan(
            phase, (xr, jnp.zeros_like(fvals[:, 0]), xr),
            jnp.asarray([True, False]))
        f2 = fs[1]
        take_expansion = (fr < f_best) & (f2 < fr)

    expand = fr < f_best
    contract_out = (fr >= f_second) & (fr < f_worst)
    contract_in = fr >= f_worst

    # accept logic per scipy:
    #  - fr < f_best: take xe if fe < fr else xr
    #  - f_best <= fr < f_second: accept xr
    #  - contract_out: accept xc_out if fco <= fr else shrink
    #  - contract_in: accept xc_in if fci < f_worst else shrink
    accept_r = (~expand & ~contract_out & ~contract_in) | \
        (expand & ~take_expansion)
    accept_2 = take_expansion | (contract_out & (f2 <= fr)) | \
        (contract_in & (f2 < f_worst))
    shrink = ~(accept_r | accept_2)

    new_point = jnp.where(accept_2[:, None], x2, xr)
    new_f = jnp.where(accept_2, f2, fr)
    replace = (~shrink)[:, None] * ohw                   # (B, n+1)
    simplex_upd = simplex * (1 - replace)[:, :, None] \
        + replace[:, :, None] * new_point[:, None, :]
    fvals_upd = fvals * (1 - replace) + replace * new_f[:, None]

    # shrink: rare — evaluate the shrunk simplex only when some live
    # instance needs it (lax.cond skips the whole batched call
    # otherwise); converged instances never trigger it
    shrunk = best[:, None, :] + sigma * (simplex - best[:, None, :])
    need_shrink = jnp.any(shrink & ~done)
    f_shr = jax.lax.cond(
        need_shrink,
        lambda s: fun(s, *fun_args),
        lambda s: jnp.zeros_like(fvals),
        shrunk)
    simplex_upd = jnp.where(shrink[:, None, None], shrunk, simplex_upd)
    fvals_upd = jnp.where(shrink[:, None], f_shr, fvals_upd)

    # freeze converged instances
    simplex_new = jnp.where(done[:, None, None], simplex, simplex_upd)
    fvals_new = jnp.where(done[:, None], fvals, fvals_upd)
    done_new = done | _nm_converged(simplex_new, fvals_new, fatol, xatol)
    return simplex_new, fvals_new, done_new


def _nm_init(fun, simplex, *fun_args, fatol, xatol):
    fvals = fun(simplex, *fun_args)
    done = _nm_converged(simplex, fvals, fatol, xatol)
    return simplex, fvals, done, jnp.all(done)


def _nm_chunk(fun, simplex, fvals, done, *fun_args, fatol, xatol, chunk,
              scheme=None):
    """Advance up to ``chunk`` iterations, exiting EARLY once every
    instance in the tile has converged (bit-identical to running the
    full chunk — converged instances are frozen by the done mask — but
    straggler tiles whose last fibers converge mid-chunk stop paying
    for the rest).  Also returns the iteration count actually
    executed, for exact objective-evaluation accounting."""
    def cond(state):
        it, s, f, d = state
        return (it < chunk) & ~jnp.all(d)

    def body(state):
        it, s, f, d = state
        s, f, d = _nm_body(fun, fun_args, s, f, d, fatol, xatol,
                           scheme=scheme)
        return it + 1, s, f, d

    it, simplex, fvals, done = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), simplex, fvals, done))
    return simplex, fvals, done, jnp.all(done), it


def _minimize_core(fun, simplex, *fun_args, fatol, xatol, maxiter,
                   scheme=None):
    fvals = fun(simplex, *fun_args)
    done0 = _nm_converged(simplex, fvals, fatol, xatol)

    def body(state):
        s, f, it, d = state
        s, f, d = _nm_body(fun, fun_args, s, f, d, fatol, xatol,
                           scheme=scheme)
        return s, f, it + 1, d

    def cond(state):
        _, _, it, d = state
        return (it < maxiter) & ~jnp.all(d)

    simplex, fvals, nit, done = jax.lax.while_loop(
        cond, body, (simplex, fvals, jnp.asarray(0), done0))
    # order the output so row 0 is the best vertex
    simplex, fvals = _sorted_simplex(simplex, fvals)
    return simplex, fvals, nit, done


def build_simplex(x0, scales, seed=20260816):
    """Deterministic randomized starting simplex.

    First vertex is the start point; the others perturb it with
    per-dimension scales (role of the reference's seeded simplex,
    vel_fit.py:272-312).  Batched: x0 (B, n), scales (n,) -> (B, n+1, n).
    """
    x0 = jnp.atleast_2d(x0)
    b, n = x0.shape
    key = jax.random.PRNGKey(seed)
    noise = jax.random.normal(key, (1, n, n), dtype=x0.dtype)
    verts = x0[:, None, :] + jnp.asarray(scales)[None, None, :] * noise
    return jnp.concatenate([x0[:, None, :], verts], axis=1)
