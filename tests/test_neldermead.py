"""Tests of the batched Nelder-Mead optimizer vs scipy."""
import numpy as np
import pytest
import scipy.optimize
import jax
import jax.numpy as jnp

from rvspecfit_tpu.fit import neldermead as nm


@pytest.fixture(params=['cand4', 'scan2'])
def nm_scheme(request, monkeypatch):
    """Run the scipy-equivalence tests under BOTH candidate-evaluation
    schemes (the one-call 4-candidate program and the sequential
    2-evaluation scan); both must reproduce scipy's decisions."""
    monkeypatch.setenv('RVST_NM_SCHEME', request.param)
    return request.param


def test_rosenbrock_batch_matches_scipy(nm_scheme):
    # 4-D Rosenbrock has a global minimum at 1...1 and a genuine local
    # minimum with f ~ 3.7014; the batched optimizer must land on the
    # same stationary point as scipy when started from the same simplex.
    def rosen_np(x):
        return (100.0 * (x[1:] - x[:-1]**2)**2 + (1 - x[:-1])**2).sum()

    def rosen(x):
        return jnp.sum(100.0 * (x[..., 1:] - x[..., :-1]**2)**2
                       + (1 - x[..., :-1])**2, axis=-1)

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-2, 2, size=(16, 4)))
    simplex = np.asarray(nm.build_simplex(x0, np.full(4, 0.5)))
    res = nm.minimize_batch(jax.jit(rosen), jnp.asarray(simplex),
                            fatol=1e-10, xatol=1e-10, maxiter=5000)
    x = np.asarray(res['x'])
    f = np.asarray(res['fun'])
    assert np.asarray(res['converged']).all()
    for i in range(16):
        ref = scipy.optimize.minimize(
            rosen_np, simplex[i, 0], method='Nelder-Mead',
            options=dict(initial_simplex=simplex[i], fatol=1e-10,
                         xatol=1e-10, maxiter=5000, maxfev=np.inf))
        np.testing.assert_allclose(f[i], ref.fun, atol=1e-8,
                                   err_msg=f'instance {i}')
        np.testing.assert_allclose(x[i], ref.x, atol=1e-4,
                                   err_msg=f'instance {i}')


def test_matches_scipy_on_quadratic(nm_scheme):
    a = np.array([1.0, 3.0, 0.5])

    def f_np(x):
        return ((x - a)**2).sum() + 0.3 * x[0] * x[1]

    def f_jax(x):
        return jnp.sum((x - jnp.asarray(a))**2, axis=-1) \
            + 0.3 * x[..., 0] * x[..., 1]

    x0 = np.array([0.0, 0.0, 0.0])
    simplex0 = np.asarray(nm.build_simplex(jnp.asarray(x0[None]),
                                           np.full(3, 0.7)))[0]
    ref = scipy.optimize.minimize(
        f_np, x0, method='Nelder-Mead',
        options=dict(initial_simplex=simplex0, fatol=1e-8, xatol=1e-8,
                     maxiter=10000))
    got = nm.minimize_batch(jax.jit(f_jax),
                            jnp.asarray(simplex0)[None],
                            fatol=1e-8, xatol=1e-8, maxiter=10000)
    np.testing.assert_allclose(np.asarray(got['x'])[0], ref.x, atol=1e-5)
    np.testing.assert_allclose(float(got['fun'][0]), ref.fun, atol=1e-8)


def test_frozen_instances_do_not_move():
    # one easy and one hard problem: the easy one converges first and
    # must stay put while the hard one keeps iterating
    def f(x):
        easy = jnp.sum(x**2, axis=-1)
        hard = jnp.sum(100.0 * (x[..., 1:] - x[..., :-1]**2)**2
                       + (1 - x[..., :-1])**2, axis=-1)
        sel = jnp.arange(x.shape[0])[:, None] == 0
        return jnp.where(sel, easy, hard)

    x0 = jnp.asarray([[0.01, 0.01], [-1.5, 2.0]])
    simplex = nm.build_simplex(x0, np.full(2, 0.2))
    res = nm.minimize_batch(jax.jit(f), simplex, fatol=1e-9, xatol=1e-9,
                            maxiter=4000)
    np.testing.assert_allclose(np.asarray(res['x'])[0], 0.0, atol=1e-4)


def test_chunked_matches_whileloop(nm_scheme):
    """The host-driven chunked stepper (the production path in
    BatchedFitter.run_neldermead) must land on the same optima as the
    single while_loop program, under either candidate scheme."""
    def rosen(x):
        return jnp.sum(100.0 * (x[..., 1:] - x[..., :-1]**2)**2
                       + (1 - x[..., :-1])**2, axis=-1)

    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.uniform(-2, 2, size=(8, 3)))
    simplex = np.asarray(nm.build_simplex(x0, np.full(3, 0.4)))
    fn = jax.jit(rosen)
    whole = nm.minimize_batch(fn, jnp.asarray(simplex), fatol=1e-9,
                              xatol=1e-9, maxiter=3000)
    chunked = nm.minimize_batch(fn, jnp.asarray(simplex), fatol=1e-9,
                                xatol=1e-9, maxiter=3000, chunk=50)
    assert np.asarray(chunked['converged']).all()
    np.testing.assert_allclose(np.asarray(chunked['fun']),
                               np.asarray(whole['fun']), atol=1e-8)
    np.testing.assert_allclose(np.asarray(chunked['x']),
                               np.asarray(whole['x']), atol=1e-4)
