import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.devices()
_ = np.asarray(jnp.ones(4))  # pay the one-time first-fetch cost
from rvspecfit_tpu import simulation
from rvspecfit_tpu.interp.grid import interp_batch
from rvspecfit_tpu.ops.spline import SplineGeometry, spline_coeffs, spline_eval
from rvspecfit_tpu.ops import chisq as chimod, basis as bmod

def t(label, f, *a):
    fj = jax.jit(f)
    r = fj(*a); jax.block_until_ready(r)
    t0=time.time(); r = fj(*a); jax.block_until_ready(r)
    print(f'{label}: {time.time()-t0:.3f}s', flush=True)
    return r

tm = simulation.build_template_model(6,6,6,4, npix=4096)
state, geom = tm.state, tm.geom
B, V, npix = 500, 128, 1024
rng = np.random.RandomState(0)
P = jnp.asarray(np.column_stack([np.log10(rng.uniform(4500,9500,B)), rng.uniform(1,4,B),
                                 rng.uniform(-1.5,-.5,B), rng.uniform(.1,.9,B)]), jnp.float32)
spec_t = t('interp 500', lambda p: interp_batch(state, p)[0], P)
coeffs = t('spline_coeffs 500x4096', lambda s: spline_coeffs(geom, s), spec_t)
lam = jnp.asarray(np.linspace(4600,5400,npix), jnp.float32)
dops = jnp.asarray(1 + rng.uniform(-3e-3,3e-3,(B,V)), jnp.float32)
def ev(c, d):
    q = lam[None,None,:]*d[:,:,None]
    return jax.vmap(lambda cc, qq: jax.vmap(lambda q1: spline_eval(geom, cc, q1)[0])(qq))(c, q)
val = t('spline_eval 500x128x1024', ev, coeffs, dops)
polys = jnp.asarray(bmod.continuum_basis(np.linspace(4600,5400,npix), 10), jnp.float32)
espec_inv = jnp.asarray(np.ones(npix)/0.02, jnp.float32)
dvec = jnp.asarray(rng.normal(size=npix), jnp.float32)
def chi(v):
    toe = v * espec_inv
    f = lambda tt: chimod.chisq_continuum_marg(dvec, tt, polys, 0.0)
    return jax.vmap(jax.vmap(f))(toe)
c = t('chisq 500x128 (npoly10,1024px)', chi, val)
# cholesky micro
M = jnp.asarray(rng.normal(size=(64000,10,10)), jnp.float32)
M = jnp.einsum('bij,bkj->bik', M, M) + 10*jnp.eye(10)[None]
v10 = jnp.asarray(rng.normal(size=(64000,10)), jnp.float32)
t('batched chol 64000x10x10', lambda m: jnp.linalg.cholesky(m), M)
t('batched cho_solve', lambda m, vv: jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(m), True), vv), M, v10)
