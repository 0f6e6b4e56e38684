"""rvspecfit_tpu — TPU-native spectroscopic RV + stellar-parameter fitting.

A ground-up JAX/XLA re-design of the capabilities of rvspecfit
(reference: /root/reference): maximum-likelihood fitting of observed
spectra against interpolated synthetic template grids, measuring radial
velocity, Teff, logg, [Fe/H], [alpha/Fe] and vsini.

Unlike the reference (per-object Python loops + C spline + scipy
optimizers), everything here is built around one fused, jit-compiled
likelihood that is vmapped over optimizer trial points and over objects
(fibers), and sharded over TPU meshes for scale-out.
"""

__version__ = '0.1.0'
