"""FLOP accounting and MFU estimation for the hot fitting programs.

The Nelder-Mead phase dominates the pipeline wall time, and its device
work is (objective evaluations) x (flops per fiber-trial).  The
batched fitter counts the padded fiber-trials it actually dispatches
(``run_neldermead`` returns ``obj_evals``); this module prices one
trial by lowering the bare NM objective through XLA and reading the
compiler's own flop count (``compiled.cost_analysis()``), then converts
the product into an achieved-FLOP/s figure and — when the chip's peak
is known — a model-flops-utilization (MFU) percentage.

Caveats (printed with the estimate):

- Pallas kernels are custom calls, invisible to XLA's cost analysis —
  with the Pallas spline path enabled (TPU default) the per-trial
  count EXCLUDES the spline-evaluation matmuls, so the MFU is a
  lower bound.
- Peaks are dense bf16 MXU numbers; the chi-square/interp contractions
  run at HIGHEST precision (multi-pass emulated f32 on the MXU, see
  ops/prec.py), whose usable peak is several times lower.  The bf16
  reference point is deliberate: it is the number "How to Scale Your
  Model"-style rooflines quote.
"""
from __future__ import annotations

import logging
import os

import numpy as np

# dense bf16 TFLOP/s per chip, by device_kind substring (public specs)
PEAK_BF16_TFLOPS = (
    ('v6', 918.0),   # Trillium / v6e
    ('v5p', 459.0),
    ('v5', 197.0),   # v5e / v5 lite pods
    ('v4', 275.0),
    ('v3', 123.0),
    ('v2', 45.0),
)


def device_peak_tflops(device=None):
    """Dense bf16 peak for ``device`` (defaults to jax.devices()[0]).

    ``RVST_PEAK_TFLOPS`` overrides; returns (tflops, label) or
    (None, kind) when the chip is unknown.
    """
    env = os.environ.get('RVST_PEAK_TFLOPS')
    if env:
        return float(env), 'RVST_PEAK_TFLOPS'
    import jax
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, 'device_kind', '') or ''
    kl = kind.lower()
    for sub, peak in PEAK_BF16_TFLOPS:
        if sub in kl:
            return peak, kind
    return None, kind


def objective_flops_per_trial(bf, mapper, width=None, ncand=4,
                              priors=None):
    """XLA-counted flops for ONE fiber-trial of the NM objective.

    Lowers the bare objective (the body the NM chunk program calls
    ``chunk`` times) at the production tile shape and divides the
    compiler's flop estimate by width x ncand.  Costs one (cached)
    compile; call only when estimating (bench ``RVST_MFU=1``).
    """
    import jax
    import jax.numpy as jnp

    from rvspecfit_tpu.fit.batch import gather_arm_states

    w = int(width or (bf.microbatch or bf.nfibers))
    obj = bf._nm_objective(mapper, priors)
    if w == bf.nfibers:
        arms = bf.arms
    else:
        arms = gather_arm_states(
            bf.arms, jnp.asarray(np.arange(w) % bf.nfibers, jnp.int32))
    nvec = len(mapper.start_vector(0.0))
    x = jnp.zeros((w, ncand, nvec), bf.dtype)
    cost = jax.jit(obj).lower(x, arms, bf.templates).compile(
    ).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float((cost or {}).get('flops', 0.0))
    if flops <= 0:
        logging.warning('XLA cost analysis returned no flops for the '
                        'NM objective (backend %s)',
                        jax.default_backend())
        return None
    return flops / (w * ncand)


def mfu_report(nm_flops, nm_seconds, device=None):
    """Format an achieved-FLOP/s + MFU line for the NM phase."""
    achieved = nm_flops / max(nm_seconds, 1e-9)
    peak, kind = device_peak_tflops(device)
    msg = (f'NM phase: {nm_flops / 1e12:.2f} TFLOP (XLA-counted) in '
           f'{nm_seconds:.2f} s = {achieved / 1e12:.3f} TFLOP/s')
    if peak:
        msg += (f' = {100.0 * achieved / (peak * 1e12):.1f}% MFU vs '
                f'{peak:.0f} TFLOP/s dense-bf16 peak ({kind})')
    else:
        msg += f' (unknown peak for device kind {kind!r})'
    return msg
