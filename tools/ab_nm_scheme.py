"""On-chip A/B of the NM candidate-evaluation scheme (VERDICT r3 #7).

``cand4`` evaluates all four candidates in one (B, 4) objective call;
``scan2`` follows scipy's literal flow — reflection, then ONE derived
second candidate — as a 2-step lax.scan (half the trial FLOPs, two
sequential device phases).  Both are scipy-equivalence-tested
(tests/test_neldermead.py); which is faster on chip depends on
whether the fused objective is dispatch- or compute-bound.

Each scheme runs NM twice from the same CCF start (first = compile/
ingest warm-up, second = timed) and the timed run's optimum quality is
compared via the post-polish chi-square.
"""
import json
import os
import time

import numpy as np

from _sweep_common import build_setup


def main():
    s = build_setup(warm=False)
    bf, mapper, truth = s['bf'], s['mapper'], s['truth']

    # warm only the shared (scheme-independent) programs + polish
    bf.warm(mapper, skip=('models', 'hessian', 'refine'))
    cres = s['run_ccf']()
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    results = {}
    for scheme in ('cand4', 'scan2'):
        os.environ['RVST_NM_SCHEME'] = scheme
        walls = []
        for rep in range(3):
            t0 = time.time()
            nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
            walls.append(time.time() - t0)
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=3)
        results[scheme] = dict(
            wall_warm=round(walls[0], 2),
            wall=round(min(walls[1:]), 2),
            walls=[round(w, 2) for w in walls],
            nconv=int(nmres['converged'].sum()),
            obj_evals=int(nmres.get('obj_evals', 0)),
            fun=np.asarray(pol['fun'], np.float64))
    os.environ.pop('RVST_NM_SCHEME', None)

    dchi = results['scan2']['fun'] - results['cand4']['fun']
    for scheme in ('cand4', 'scan2'):
        r = dict(results[scheme])
        del r['fun']
        r['scheme'] = scheme
        print(json.dumps(r), flush=True)
    print(json.dumps(dict(
        med_dchi_scan2_vs_cand4=round(float(np.median(dchi)), 4),
        p95_dchi=round(float(np.percentile(dchi, 95)), 4),
        n_dchi_gt1=int((dchi > 1.0).sum()),
        n_dchi_lt_m1=int((dchi < -1.0).sum()))), flush=True)


if __name__ == '__main__':
    main()
