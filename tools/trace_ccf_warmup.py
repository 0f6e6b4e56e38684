"""Timestamped cold-start trace of the batched CCF stage.

Reproduces bench.py's CCF call in a fresh process with wall-clock
stamps around every host/device stage, to localize warm-up cost
(round-3 investigation of a silent warm-up stall).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()


def stamp(msg):
    print(f'[{time.time() - T0:8.1f}s] {msg}', flush=True)


def main():
    stamp('importing jax')
    import jax  # noqa: F401
    stamp(f'jax ready, devices={jax.devices()}')

    from rvspecfit_tpu import simulation
    from rvspecfit_tpu.fit import ccf as ccf_mod
    from rvspecfit_tpu.ops import continuum as continuum_mod
    from rvspecfit_tpu.utils import freeze
    stamp('imports done')

    config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                         max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                         second_minimizer=True, template_lib=''))
    arms_data, truth = simulation.make_exposure(500, npix_arm=1024,
                                                snr=50.0, seed=7)
    stamp('exposure built')

    bank_cache = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        '.bench_ccf_bank.npy')
    bank = simulation.build_ccf_bank_cached(
        bank_cache, nt=6, nl=6, nf=6, na=4, npix=4096,
        lam0=4550.0, lam1=5450.0, every=8)
    banks = {n: bank for n in arms_data}
    stamp('bank loaded')

    # instrument the continuum internals
    orig_irls = continuum_mod._irls_core

    def timed_irls(*a, **k):
        stamp('  _irls_core dispatch')
        out = orig_irls(*a, **k)
        out[0].block_until_ready()
        stamp('  _irls_core blocked-ready')
        return out
    continuum_mod._irls_core = timed_irls

    orig_pre = continuum_mod.preprocess_batch

    def timed_pre(*a, **k):
        stamp('  preprocess_batch start')
        out = orig_pre(*a, **k)
        stamp('  preprocess_batch done')
        return out
    continuum_mod.preprocess_batch = timed_pre

    orig_prep = ccf_mod.prepare_arm_batch

    def timed_prep(setup, *a, **k):
        stamp(f'prepare_arm_batch[{setup}] start')
        out = orig_prep(setup, *a, **k)
        stamp(f'prepare_arm_batch[{setup}] done')
        return out
    ccf_mod.prepare_arm_batch = timed_prep

    arm_list = [(n, lam, fl, 1.0 / np.sqrt(np.maximum(iv, 1e-30)), None)
                for n, (lam, fl, iv) in arms_data.items()]
    stamp('calling fit_batch (cold)')
    with np.errstate(divide='ignore'):
        res = ccf_mod.fit_batch(arm_list, config, banks=banks,
                                microbatch=125)
    stamp(f'fit_batch done, best_chi[0]={res["best_chi"][0]:.1f}')

    t1 = time.time()
    with np.errstate(divide='ignore'):
        ccf_mod.fit_batch(arm_list, config, banks=banks, microbatch=125)
    stamp(f'fit_batch warm repeat: {time.time() - t1:.2f}s')


if __name__ == '__main__':
    main()
