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
from rvspecfit_tpu.fit import neldermead as nm

B, n = 500, 5
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.uniform(-2, 2, (B, n)), jnp.float32)


def quad(x):
    a = jnp.arange(1, n + 1, dtype=x.dtype)
    return jnp.sum((x - a)**2, axis=-1) + 0.3 * x[..., 0] * x[..., 1]


simplex = nm.build_simplex(x0, np.full(n, 0.5))
t0 = time.time()
res = nm.minimize_batch(jax.jit(quad), simplex, maxiter=2000)
packed = np.asarray(res['fun'])
mark(f'NM quad B=500 {time.time()-t0:.1f}s '
     f'conv={np.asarray(res["converged"]).sum()}')

from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.utils import freeze

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
par = np.tile([6000., 3., -1., .5], (B, 1))
t0 = time.time()
scan = bf.scan_velocities(np.arange(-1000., 1000., 5.), par)
mark(f'scan c+r {time.time()-t0:.1f}s')
t0 = time.time()
scan = bf.scan_velocities(np.arange(-1000., 1000., 5.), par)
mark(f'scan warm {time.time()-t0:.1f}s')
mapper = vel_fit.ParamMapper(
    tm.parnames, dict(teff=6000., logg=3., feh=-1., alpha=.5), [], None,
    False)
t0 = time.time()
r5 = bf.run_neldermead(mapper, scan['best_vel'], maxiter=5, maxrestart=1)
mark(f'NM lik maxiter=5 {time.time()-t0:.1f}s')
t0 = time.time()
r50 = bf.run_neldermead(mapper, scan['best_vel'], maxiter=50,
                        maxrestart=1)
mark(f'NM lik maxiter=50 {time.time()-t0:.1f}s')
t0 = time.time()
r2k = bf.run_neldermead(mapper, scan['best_vel'], maxiter=2000,
                        maxrestart=1)
mark(f'NM lik maxiter=2000 {time.time()-t0:.1f}s '
     f'conv={r2k["converged"].sum()}')
vel_b, params_b, _ = mapper.unpack_host(r2k['x'])
t0 = time.time()
ref = bf.refine_velocities(vel_b, params_b)
mark(f'refine c+r {time.time()-t0:.1f}s')
t0 = time.time()
ref = bf.refine_velocities(vel_b, params_b)
mark(f'refine warm {time.time()-t0:.1f}s')
t0 = time.time()
errs, _, bad = bf.hessian_errors(ref['best_vel'], params_b,
                                 parnames=tm.parnames)
mark(f'hessian c+r {time.time()-t0:.1f}s')
dv = ref['best_vel'] - truth['vel']
mark(f'median|dv| {np.median(np.abs(dv)):.3f} km/s; '
     f'within10 {(np.abs(dv) < 10).sum()}/{B}')
