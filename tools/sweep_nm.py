"""On-chip sweep of the NM iteration budget vs fit quality.

The gradient polish + velocity refinement own the fit endgame, so the
NM stage only needs to deliver the right basin; this sweep measures
how small its iteration budget can go before RV/parameter recovery or
the final chi-square degrade (round-3 throughput work: NM is ~2/3 of
the steady-state wall).

All configs share the same compiled programs (maxiter/maxrestart/steps
are host-loop bounds, not traced constants), so the sweep costs one
warm-up plus one steady pass per config.
"""
import json
import time

import numpy as np

from _sweep_common import build_setup, NFIBERS


def main():
    s = build_setup()  # warms with skip=('models', 'hessian')
    bf, mapper, truth = s['bf'], s['mapper'], s['truth']

    cres = s['run_ccf'](ccf_microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    def run(maxiter, maxrestart, steps):
        t0 = time.time()
        nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0,
                                  maxiter=maxiter, maxrestart=maxrestart)
        t_nm = time.time() - t0
        t0 = time.time()
        pol = bf.run_polish(mapper, nmres['x'], fun0=nmres['fun'],
                            steps=steps)
        t_pol = time.time() - t0
        xbest, fun = pol['x'], pol['fun']
        t0 = time.time()
        vel_b, params_b, _ = mapper.unpack_host(xbest)
        ref = bf.refine_velocities(vel_b, params_b)
        t_ref = time.time() - t0
        dv = ref['best_vel'] - truth['vel']
        return dict(t_nm=round(t_nm, 2), t_pol=round(t_pol, 2),
                    t_ref=round(t_ref, 2),
                    fun=np.asarray(fun, np.float64),
                    med_adv=round(float(np.median(np.abs(dv))), 4),
                    p95_adv=round(float(np.percentile(np.abs(dv), 95)),
                                  3),
                    nconv=int(nmres['converged'].sum()))

    configs = [(384, 2, 3), (384, 2, 3), (192, 2, 3), (128, 2, 3),
               (128, 1, 3), (64, 1, 4), (64, 1, 3)]
    base_fun = None
    for i, (mi, mr, st) in enumerate(configs):
        r = run(mi, mr, st)
        if i == 0:
            print(f'warm-up pass done ({r["t_nm"]:.1f}s NM)', flush=True)
            continue
        if base_fun is None:
            base_fun = r['fun']
        dchi = r['fun'] - base_fun
        out = dict(maxiter=mi, maxrestart=mr, steps=st,
                   t_nm=r['t_nm'], t_pol=r['t_pol'], t_ref=r['t_ref'],
                   med_adv=r['med_adv'], p95_adv=r['p95_adv'],
                   nconv=r['nconv'],
                   med_dchi=round(float(np.median(dchi)), 4),
                   p95_dchi=round(float(np.percentile(dchi, 95)), 3),
                   n_dchi_gt1=int((dchi > 1.0).sum()))
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
