"""Analytic fake stellar-spectrum generator for tests.

Same role as the reference's test fixture (an analytic spectrum whose
line widths/depths depend on the atmospheric parameters, on a smooth
continuum — reference: tests/mktemps.py), independently designed:
four Gaussian absorption lines whose strengths respond to
(teff, logg, feh, alpha) multiplying a T^4 Rayleigh-Jeans-ish
continuum.  Used to build small template grids and to inject known
radial velocities.
"""
import itertools

import numpy as np

LINE_CENTERS = np.array([4980.3, 5035.8, 5061.2, 5108.9])
LINE_AMP = np.array([0.85, 0.55, 0.35, 0.65])
LINE_FEH_SENS = np.array([0.9, 1.7, 0.4, 1.1])
LINE_TEFF_SENS = np.array([0.4, -0.5, -0.8, 0.2])
LINE_ALPHA_SENS = np.array([0.1, 0.0, 0.6, -0.3])
LINE_WIDTH0 = np.array([0.12, 0.10, 0.15, 0.11])

TEFF_MIN, TEFF_MAX = 3000.0, 12000.0


def fake_spectrum(lam, teff, logg, feh, alpha, wresol=0.0):
    """Synthetic flux (energy units) on wavelength grid ``lam``."""
    wline = np.sqrt((0.05 + 1.8 * logg / 5.0)**2 + LINE_WIDTH0**2)
    weff = np.sqrt(wline**2 + wresol**2)
    tnorm = (teff - TEFF_MIN) / (TEFF_MAX - TEFF_MIN)
    depth = (LINE_AMP * np.exp(LINE_FEH_SENS * feh)
             * (1.0 + LINE_TEFF_SENS * tnorm)
             * (1.0 + LINE_ALPHA_SENS * alpha))
    depth = np.clip(depth, 0.0, 0.95) * wline / weff
    prof = 1.0 - depth[None, :] * np.exp(
        -0.5 * (lam[:, None] - LINE_CENTERS[None, :])**2 / weff[None, :]**2)
    cont = (teff / 5000.0)**4 * (5000.0 / lam)
    return np.prod(prof, axis=1) * cont


def make_template_grid(nt=6, nl=6, nf=6, na=4, npix=4096,
                       lam0=4550.0, lam1=5450.0, wresol=2.0):
    """Build a regular 4-d template grid on a log-uniform lambda grid.

    Returns (lam, uvecs, idgrid, vecs, log_specs, parnames) with specs
    continuum-normalized and logged, params in *mapped* space
    (log10 teff first), mirroring the make_interpol+make_nd artifact
    content (reference: py/rvspecfit/make_nd.py:142-160).
    """
    lam = np.exp(np.linspace(np.log(lam0), np.log(lam1), npix))
    teffs = np.linspace(4000.0, 10000.0, nt)
    loggs = np.linspace(0.5, 5.0, nl)
    fehs = np.linspace(-2.0, 0.0, nf)
    alphas = np.linspace(0.0, 1.0, na)
    uvecs = [np.log10(teffs), loggs, fehs, alphas]
    combos = list(itertools.product(range(nt), range(nl), range(nf),
                                    range(na)))
    vecs = np.zeros((4, len(combos)))
    specs = np.zeros((len(combos), npix))
    idgrid = np.zeros((nt, nl, nf, na), dtype=int)
    for sid, (i, j, k, m) in enumerate(combos):
        t, g, f, a = teffs[i], loggs[j], fehs[k], alphas[m]
        sp = fake_spectrum(lam, t, g, f, a, wresol=wresol)
        sp = sp / np.median(sp)
        specs[sid] = np.log(sp)
        vecs[:, sid] = [np.log10(t), g, f, a]
        idgrid[i, j, k, m] = sid
    return lam, uvecs, idgrid, vecs, specs, ('teff', 'logg', 'feh', 'alpha')


def observed_spectrum(v0, teff, logg, feh, alpha, npix=800,
                      lam0=4600.0, lam1=5400.0, wresol=2.0, snr=100.0,
                      seed=0):
    """Make a noisy observed spectrum with an injected radial velocity."""
    c = 299792.458
    lam = np.linspace(lam0, lam1, npix)
    # emit at rest wavelengths lam/(1+v/c): received lam is redshifted
    lam_rest = lam / (1 + v0 / c)
    spec0 = fake_spectrum(lam_rest, teff, logg, feh, alpha, wresol=wresol)
    espec = spec0 / snr
    rng = np.random.RandomState(seed)
    spec = spec0 + rng.normal(size=npix) * espec
    return lam, spec, espec
