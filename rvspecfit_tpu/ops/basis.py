"""Continuum basis construction (polynomial + Gaussian RBF).

Equivalent of the reference's continuum basis
(reference: py/rvspecfit/spec_fit.py:148-200).  The basis depends only
on the wavelength grid and npoly, so it is computed once per dataset
on the host in float64 and closed over as a constant in the jitted
likelihood.
"""
import numpy as np


def continuum_basis(lam, npoly, rbf=True):
    """Build the (npoly, npix) continuum basis.

    If ``rbf`` is True the first three rows are monomials 1, x, x^2 of
    the normalized wavelength x in [-1, 1] and the remaining rows are
    Gaussian radial basis functions with centers on a uniform grid and
    width 1/nrbf (wider RBFs give ill-conditioned normal matrices).
    Otherwise rows are Chebyshev polynomials T_0..T_{npoly-1}.
    """
    lam = np.asarray(lam, dtype=np.float64)
    x = (lam - lam[0]) / (lam[-1] - lam[0]) * 2.0 - 1.0
    out = np.zeros((npoly, lam.shape[0]))
    if not rbf:
        eye = np.eye(npoly)
        for i in range(npoly):
            out[i] = np.polynomial.Chebyshev(eye[i])(x)
        return out
    npoly0 = 3
    for i in range(min(npoly0, npoly)):
        out[i] = x**i
    nrbf = npoly - npoly0
    if nrbf > 0:
        sig = 1.0 / nrbf
        centers = np.linspace(-1.0, 1.0, nrbf)
        out[npoly0:] = np.exp(-0.5 * (x[None, :] - centers[:, None])**2
                              / sig**2)
    return out
