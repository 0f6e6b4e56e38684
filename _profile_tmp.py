import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
t00=time.time()
def mark(s): print(f'[{time.time()-t00:7.1f}s] {s}', flush=True)
from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.utils import freeze
config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5, max_vsini=500,
                     min_vsini=1e-2, min_vel_step=0.2, second_minimizer=False, template_lib=''))
mark('imports')
t0=time.time(); tm = simulation.build_template_model(6,6,6,4, npix=4096); mark(f'template model {time.time()-t0:.1f}s')
B=500
t0=time.time(); arms_data, truth = simulation.make_exposure(B, npix_arm=1024, snr=50., seed=7); mark(f'exposure host {time.time()-t0:.1f}s')
t0=time.time()
arms = [BatchArm(n, lam, fl, iv) for n,(lam,fl,iv) in arms_data.items()]
bf = BatchedFitter(arms, {n: tm for n in arms_data}, config, options={'npoly': 10})
mark(f'fitter build {time.time()-t0:.1f}s')
vels = np.tile(np.arange(-1000.,1000.,5.), (B,1))
par = np.tile([6000.,3.,-1.,.5],(B,1))
t0=time.time(); chis = bf.scan_chisq(vels, par, vchunk=128); mark(f'scan c+r {time.time()-t0:.1f}s')
t0=time.time(); chis = bf.scan_chisq(vels, par, vchunk=128); mark(f'scan warm {time.time()-t0:.2f}s')
stats = bf._scan_stats(vels, chis)
mapper = vel_fit.ParamMapper(tm.parnames, dict(teff=6000.,logg=3.,feh=-1.,alpha=.5), [], None, False)
# NM with small maxiter first to bound risk
t0=time.time(); nmres = bf.run_neldermead(mapper, stats['best_vel'], maxiter=50, maxrestart=1); mark(f'NM(50) c+r {time.time()-t0:.1f}s')
t0=time.time(); nmres = bf.run_neldermead(mapper, stats['best_vel'], maxiter=2000, maxrestart=2); mark(f'NM(2000) c+r {time.time()-t0:.1f}s conv={np.asarray(nmres["converged"]).sum()}/{B}')
vel_b, params_b, _, _ = mapper.unpack(jnp.asarray(nmres['x']))
params_b = np.asarray(params_b)
t0=time.time(); ref = bf.refine_velocities(np.asarray(vel_b), params_b); mark(f'refine c+r {time.time()-t0:.1f}s')
t0=time.time(); errs,_,bad = bf.hessian_errors(ref['best_vel'], params_b, parnames=tm.parnames); mark(f'hessian c+r {time.time()-t0:.1f}s')
dv = ref['best_vel']-truth['vel']
mark(f"median |dv| {np.median(np.abs(dv)):.3f} within10: {(np.abs(dv)<10).sum()}")
# timed steady-state pass
t0=time.time()
stats2 = bf._scan_stats(vels, bf.scan_chisq(vels, par, vchunk=128))
nm2 = bf.run_neldermead(mapper, stats2['best_vel'], maxiter=2000, maxrestart=2)
vel_b2, params_b2, _, _ = mapper.unpack(jnp.asarray(nm2['x']))
params_b2 = np.asarray(params_b2)
ref2 = bf.refine_velocities(np.asarray(vel_b2), params_b2)
errs2,_,_ = bf.hessian_errors(ref2['best_vel'], params_b2, parnames=tm.parnames)
el = time.time()-t0
mark(f'steady-state pipeline {el:.1f}s -> {B/el:.1f} fibers/s')
