"""On-chip A/B of the gradient-polish stage configurations.

The polish (``second_minimizer``) costs ~1.6 s of the 9.7 s steady
exposure; its dominant device cost is the per-step AD Hessian
(forward-over-reverse, ~n tangents x the gradient cost).  This sweep
measures, from one shared NM result:

* steps 3 vs 2 (the step ladder already tries fractional steps, so
  fewer Newton iterations may suffice), and
* RVST_POLISH_FREEZE_H=1 (Hessian evaluated once per tile, gradient
  every step) vs the default re-evaluated Hessian,

against wall time, the post-refine chi-square, and RV recovery.
Quality gate: per-config delta-chi-square vs the elementwise-minimum
chi-square across all configs, and the fraction of fibers worse by >1.
"""
import json
import os
import time

import numpy as np

from _sweep_common import build_setup


def main():
    s = build_setup(skip=('models', 'hessian'))
    bf, mapper, truth = s['bf'], s['mapper'], s['truth']

    cres = s['run_ccf'](ccf_microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)
    nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
    print(f'shared NM done: {int(nmres["converged"].sum())}/{s["nfibers"]} '
          'converged', flush=True)

    def run(steps, freeze_h):
        if freeze_h:
            os.environ['RVST_POLISH_FREEZE_H'] = '1'
        else:
            os.environ.pop('RVST_POLISH_FREEZE_H', None)
        # warm (first call compiles/ingests), then time a steady call
        bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                      steps=steps)
        t0 = time.time()
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=steps)
        t_pol = time.time() - t0
        vel_b, params_b, _ = mapper.unpack_host(pol['x'])
        t0 = time.time()
        ref = bf.refine_velocities(vel_b, params_b)
        t_ref = time.time() - t0
        dv = ref['best_vel'] - truth['vel']
        return dict(t_pol=round(t_pol, 2), t_ref=round(t_ref, 2),
                    fun=np.asarray(pol['fun'], np.float64),
                    nmoved=int(pol['moved'].sum()),
                    med_adv=round(float(np.median(np.abs(dv))), 4),
                    p95_adv=round(float(np.percentile(np.abs(dv), 95)),
                                  3))

    configs = [(3, False), (3, True), (2, False), (2, True)]
    results = []
    try:
        for steps, fh in configs:
            r = run(steps, fh)
            results.append((steps, fh, r))
    finally:
        os.environ.pop('RVST_POLISH_FREEZE_H', None)
    # baseline = per-fiber elementwise best chi-square across configs
    base_fun = np.min(np.stack([r['fun'] for _, _, r in results]),
                      axis=0)
    for steps, fh, r in results:
        dchi = r['fun'] - base_fun
        out = dict(steps=steps, freeze_h=fh, t_pol=r['t_pol'],
                   t_ref=r['t_ref'], nmoved=r['nmoved'],
                   med_adv=r['med_adv'], p95_adv=r['p95_adv'],
                   med_dchi=round(float(np.median(dchi)), 4),
                   p95_dchi=round(float(np.percentile(dchi, 95)), 4),
                   n_dchi_gt1=int((dchi > 1.0).sum()))
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
