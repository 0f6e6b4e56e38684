import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
t00 = time.time()


def mark(s):
    print(f'[{time.time()-t00:7.1f}s] {s}', flush=True)


jax.devices()
_ = np.asarray(jnp.ones(4))
mark('first fetch done')

from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.utils import freeze

B = 500
config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=False, template_lib=''))
tm = simulation.build_template_model(6, 6, 6, 4, npix=4096)
arms_data, truth = simulation.make_exposure(B, npix_arm=1024, snr=50.,
                                            seed=7)
arms = [BatchArm(k, lam, fl, iv) for k, (lam, fl, iv) in arms_data.items()]
bf = BatchedFitter(arms, {k: tm for k in arms_data}, config,
                   options={'npoly': 10})
mark('fitter built')

vels1 = jnp.asarray(np.zeros((B, 1)), jnp.float32)
pars1 = jnp.asarray(np.tile([6000., 3., -1., .5], (B, 1, 1)), jnp.float32)
vs1 = jnp.zeros((B, 1), jnp.float32)

# 1. standalone single-trial likelihood
r = bf._chisq_fibers(bf.arms, vels1, pars1, vs1)
jax.block_until_ready(r)
t0 = time.time()
for _ in range(5):
    r = bf._chisq_fibers(bf.arms, vels1, pars1, vs1)
jax.block_until_ready(r)
mark(f'standalone lik (B,1) x5: {time.time()-t0:.2f}s')


# 2. fori_loop around the likelihood
def loop5(vels, pars, vs):
    def body(i, acc):
        return acc + bf._chisq_fibers.__wrapped__(
            bf.arms, vels + i * 0.1, pars, vs)
    return jax.lax.fori_loop(0, 5, body, jnp.zeros_like(vels))


lj = jax.jit(loop5)
r = lj(vels1, pars1, vs1)
jax.block_until_ready(r)
t0 = time.time()
r = lj(vels1, pars1, vs1)
jax.block_until_ready(r)
mark(f'fori_loop(5) lik: {time.time()-t0:.2f}s')


# 3. while_loop around the likelihood
def wloop5(vels, pars, vs):
    def cond(state):
        i, acc = state
        return i < 5

    def body(state):
        i, acc = state
        return i + 1, acc + bf._chisq_fibers.__wrapped__(
            bf.arms, vels + i * 0.1, pars, vs)
    return jax.lax.while_loop(cond, body,
                              (jnp.asarray(0), jnp.zeros_like(vels)))[1]


wj = jax.jit(wloop5)
r = wj(vels1, pars1, vs1)
jax.block_until_ready(r)
t0 = time.time()
r = wj(vels1, pars1, vs1)
jax.block_until_ready(r)
mark(f'while_loop(5) lik: {time.time()-t0:.2f}s')
