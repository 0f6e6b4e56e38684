"""On-chip sweep of the NM initial-simplex scale vs fit quality.

The CCF start is typically within a few km/s / one grid cell of the
optimum, so a smaller-than-natural first simplex may converge in fewer
iterations; too small and it must rebuild its size through expansions
(or converge prematurely to the wrong basin).  The scale is a program
INPUT (run_neldermead reads RVST_NM_SIMPLEX_SCALE per call), so the
whole sweep shares one compiled program set.
"""
import json
import os
import sys
import time

import numpy as np

from _sweep_common import build_setup


def main():
    s = build_setup(warm=False)
    bf, mapper, truth = s['bf'], s['mapper'], s['truth']
    cres = s['run_ccf']()
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    def run(scale):
        os.environ['RVST_NM_SIMPLEX_SCALE'] = str(scale)
        t0 = time.time()
        nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0)
        t_nm = time.time() - t0
        t0 = time.time()
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=3)
        t_pol = time.time() - t0
        xbest, fun = pol['x'], pol['fun']
        vel_b, params_b, _ = mapper.unpack_host(xbest)
        ref = bf.refine_velocities(vel_b, params_b)
        dv = ref['best_vel'] - truth['vel']
        return dict(t_nm=round(t_nm, 2), t_pol=round(t_pol, 2),
                    fun=np.asarray(fun, np.float64),
                    med_adv=round(float(np.median(np.abs(dv))), 4),
                    p95_adv=round(float(np.percentile(np.abs(dv), 95)),
                                  3),
                    evals=int(nmres.get('obj_evals', 0)),
                    nconv=int(nmres['converged'].sum()))

    scales = [float(v) for v in (sys.argv[1:] or
                                 ['1.0', '1.0', '0.7', '0.5', '0.35',
                                  '0.25'])]
    base_fun = None
    try:
        for i, sc in enumerate(scales):
            r = run(sc)
            if i == 0:
                print(f'warm-up pass done ({r["t_nm"]:.1f}s NM)',
                      flush=True)
                continue
            if base_fun is None:
                base_fun = r['fun']
            dchi = r['fun'] - base_fun
            out = dict(scale=sc, t_nm=r['t_nm'], t_pol=r['t_pol'],
                       med_adv=r['med_adv'], p95_adv=r['p95_adv'],
                       nconv=r['nconv'], evals=r['evals'],
                       med_dchi=round(float(np.median(dchi)), 4),
                       p95_dchi=round(float(np.percentile(dchi, 95)), 3),
                       n_dchi_gt1=int((dchi > 1.0).sum()))
            print(json.dumps(out), flush=True)
    finally:
        os.environ.pop('RVST_NM_SIMPLEX_SCALE', None)


if __name__ == '__main__':
    main()
