"""On-chip sweep of RVST_NM_CHUNK (NM iterations per host round).

The batched NM runs as host-driven rounds of ``nm_chunk`` on-device
iterations; between rounds the unconverged fibers are compacted into
narrower tiles.  Larger chunks pay fewer host round-trips (the NM
phase is dispatch-latency-bound, 0.6% MFU) but compact less often, so
straggler fibers burn more padded device iterations.  Each chunk value
compiles its own chunk program (chunk is a traced loop bound), so the
sweep pays one compile per config on a cold cache.

Quality gate: identical NM semantics per iteration — only the
compaction boundaries move — so the final optima must agree with the
chunk=64 production default to within the f32 chi-square noise; the
sweep reports max |dchi| and per-config NM wall time.
"""
import json
import time

import numpy as np

from _sweep_common import build_setup, NFIBERS


def main():
    s = build_setup(warm=False)
    bf, mapper, truth = s['bf'], s['mapper'], s['truth']

    cres = s['run_ccf'](ccf_microbatch=125)
    x0 = np.concatenate([cres['best_vel'][:, None],
                         cres['best_params']], axis=1)

    def run(chunk):
        t0 = time.time()
        nmres = bf.run_neldermead(mapper, cres['best_vel'], x0=x0,
                                  nm_chunk=chunk)
        return time.time() - t0, nmres

    results = {}
    base_fun = None
    # first pass per chunk is compile+ingest; second is the steady
    # measurement (all chunks share the init program, only the chunk
    # program recompiles)
    for chunk in (64, 96, 128, 192, 32):
        run(chunk)
        dt_best, nmres = None, None
        for _ in range(2):
            dt, nm = run(chunk)
            if dt_best is None or dt < dt_best:
                dt_best, nmres = dt, nm
        fun = np.asarray(nmres['fun'], np.float64)
        if base_fun is None:
            base_fun = fun
        out = dict(chunk=chunk, t_nm=round(dt_best, 2),
                   nconv=int(nmres['converged'].sum()),
                   med_dchi=round(float(np.median(fun - base_fun)), 4),
                   max_dchi=round(float(np.max(fun - base_fun)), 3),
                   n_worse_1=int(np.sum(fun - base_fun > 1.0)),
                   obj_evals=int(nmres['obj_evals']))
        print(json.dumps(out), flush=True)
        results[chunk] = out
    return results


if __name__ == '__main__':
    main()
