#!/usr/bin/env python
"""A/B the CCF matmul precision on chip: template pick + start velocity.

The CCF stage only seeds the optimizer (template id, start velocity,
vsini flag); the NM/polish/refine stages re-measure everything.  The
safe question is therefore not "are the chi-squares bit-equal" but
"does a cheaper MXU precision change any fiber's *selected* template
or move its start velocity materially".  This tool runs fit_batch on
the bench exposure once per precision and reports exactly that.

Usage:  python tools/ccf_precision_ab.py [default high highest]
"""
import os
import subprocess
import sys
import json
import tempfile

PREC = sys.argv[1:] or ['default', 'highest']

CHILD = r"""
import json, os, sys
import numpy as np
from rvspecfit_tpu.utils import enable_compilation_cache, freeze
enable_compilation_cache()
from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit import ccf as ccf_mod

config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=True, template_lib=''))
arms_data, truth = simulation.make_exposure(500, npix_arm=1024,
                                            snr=50.0, seed=7)
bank = simulation.build_ccf_bank_cached(
    sys.argv[1], nt=6, nl=6, nf=6, na=4, npix=4096,
    lam0=4550.0, lam1=5450.0, every=8)
banks = {n: bank for n in arms_data}
with np.errstate(divide='ignore'):
    res = ccf_mod.fit_batch(
        [(n, lam, fl, 1.0 / np.sqrt(np.maximum(iv, 1e-30)), None)
         for n, (lam, fl, iv) in arms_data.items()], config, banks=banks)
json.dump(dict(best_id=res['best_id'].tolist(),
               best_vel=res['best_vel'].tolist()),
          open(sys.argv[2], 'w'))
"""


def main():
    bank_cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.bench_ccf_bank.npy')
    outs = {}
    for p in PREC:
        with tempfile.NamedTemporaryFile(suffix='.json',
                                         delete=False) as f:
            out = f.name
        env = dict(os.environ, RVST_PRECISION_CCF=p)
        r = subprocess.run([sys.executable, '-c', CHILD, bank_cache, out],
                           env=env)
        if r.returncode:
            print(f'{p}: FAILED (exit {r.returncode})')
            continue
        outs[p] = json.load(open(out))
        os.unlink(out)
    ks = list(outs)
    if len(ks) < 2:
        return
    ref = outs[ks[-1]]
    import numpy as np
    rid = np.asarray(ref['best_id'])
    rv = np.asarray(ref['best_vel'])
    for p in ks[:-1]:
        pid = np.asarray(outs[p]['best_id'])
        pv = np.asarray(outs[p]['best_vel'])
        nd = int((pid != rid).sum())
        dv = np.abs(pv - rv)
        print(f'{p} vs {ks[-1]}: template picks differ {nd}/{len(rid)}; '
              f'|dvel| median {np.median(dv):.4f} '
              f'max {dv.max():.4f} km/s')


if __name__ == '__main__':
    main()
