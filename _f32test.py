import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import time
import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')   # f32 default (no x64)
import jax.numpy as jnp
from rvspecfit_tpu import simulation
from rvspecfit_tpu.fit.batch import BatchArm, BatchedFitter
from rvspecfit_tpu.fit import vel_fit
from rvspecfit_tpu.utils import freeze

B = 50
config = freeze(dict(min_vel=-1000, max_vel=1000, vel_step0=5,
                     max_vsini=500, min_vsini=1e-2, min_vel_step=0.2,
                     second_minimizer=False, template_lib=''))
tm = simulation.build_template_model(6, 6, 6, 4, npix=4096)
arms_data, truth = simulation.make_exposure(B, npix_arm=1024, snr=50.,
                                            seed=7)
arms = [BatchArm(k, lam, fl, iv) for k, (lam, fl, iv) in arms_data.items()]
bf = BatchedFitter(arms, {k: tm for k in arms_data}, config,
                   options={'npoly': 10})
par = np.tile([6000., 3., -1., .5], (B, 1))
scan = bf.scan_velocities(np.arange(-1000., 1000., 5.), par)
print('scan dv med', np.median(np.abs(scan['best_vel'] - truth['vel'])),
      flush=True)
mapper = vel_fit.ParamMapper(
    tm.parnames, dict(teff=6000., logg=3., feh=-1., alpha=.5), [], None,
    False)
nmres = bf.run_neldermead(mapper, scan['best_vel'], nm_chunk=64)
print('NM converged', nmres['converged'].sum(), '/', B, flush=True)
vel_b, params_b, _ = mapper.unpack_host(nmres['x'])
ref = bf.refine_velocities(vel_b, params_b)
dv = ref['best_vel'] - truth['vel']
print('median |dv|', np.median(np.abs(dv)),
      'median sigma', np.median(ref['vel_err']),
      'within max(10,5sig)',
      (np.abs(dv) < np.maximum(10, 5 * ref['vel_err'])).sum(), '/', B,
      flush=True)
print('teff dev med', np.median(np.abs(params_b[:, 0] - truth['teff'])))
print('logg dev med', np.median(np.abs(params_b[:, 1] - truth['logg'])))
EOF_MARKER = None
