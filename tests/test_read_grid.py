"""Tests of the template DB builder and the LSF rebinner."""
import os
import sqlite3

import numpy as np
import pytest

from rvspecfit_tpu.io import fitsio
from rvspecfit_tpu.pipeline import read_grid
from rvspecfit_tpu import simulation


def _write_grid(tmp_path, nspec=5):
    os.makedirs(tmp_path / 'specs', exist_ok=True)
    lam = np.linspace(4500, 5500, 2000)
    rng = np.random.RandomState(0)
    for i in range(nspec):
        t, g, f, a = (rng.uniform(4000, 9000), rng.uniform(0, 5),
                      rng.uniform(-2, 0), rng.uniform(0, 1))
        sp = simulation.fake_spectrum(lam, t, g, f, a)
        fitsio.write(str(tmp_path / 'specs' / f'xx_{i:05d}.fits'),
                     [dict(kind='image', data=sp,
                           header=[('PHXTEFF', t, ''), ('PHXLOGG', g, ''),
                                   ('PHXM_H', f, ''), ('PHXALPHA', a, '')])])
    fitsio.write(str(tmp_path / 'wave.fits'),
                 [dict(kind='image', data=lam)])
    return lam


def test_makedb_and_get_spec(tmp_path):
    lam = _write_grid(tmp_path)
    db = str(tmp_path / 'files.db')
    read_grid.makedb(str(tmp_path), dbfile=db, mask='specs/*fits')
    conn = sqlite3.connect(db)
    n = conn.execute('select count(*) from files').fetchone()[0]
    assert n == 5
    npar = conn.execute('select count(*) from grid_parameters'
                        ).fetchone()[0]
    assert npar == 4
    row = conn.execute('select teff, logg, feh, alpha from files '
                       'where id=0').fetchone()
    lam2, spec = read_grid.get_spec(
        dict(teff=row[0], logg=row[1], feh=row[2], alpha=row[3]),
        dbfile=db, prefix=str(tmp_path), wavefile=str(tmp_path / 'wave.fits'))
    np.testing.assert_allclose(lam2, lam)
    assert spec.shape == lam.shape


def test_makedb_update_appends_only_new(tmp_path):
    _write_grid(tmp_path, nspec=3)
    db = str(tmp_path / 'files.db')
    read_grid.makedb(str(tmp_path), dbfile=db, mask='specs/*fits')
    _write_grid(tmp_path, nspec=5)  # adds 2 more (same first 3 names)
    read_grid.makedb(str(tmp_path), dbfile=db, mask='specs/*fits',
                     update=True)
    conn = sqlite3.connect(db)
    n = conn.execute('select count(*) from files').fetchone()[0]
    assert n == 5
    ids = [r[0] for r in conn.execute('select id from files order by id')]
    assert ids == list(range(5))


def test_rebinner_matches_bruteforce():
    # input: fine grid; output: coarse grid at lower resolution
    lam_in = np.linspace(4800, 5200, 8000)
    spec = 1 + 0.5 * np.sin(lam_in / 3.0) \
        - 0.8 * np.exp(-0.5 * ((lam_in - 5000) / 0.8)**2)
    lam_out = np.linspace(4900, 5100, 300)
    R = 2000.0
    mat = read_grid.make_rebinner(lam_in, lam_out,
                                  lambda x: R + 0 * x,
                                  resolution0=1e5)
    got = read_grid.apply_rebinner(mat, spec)

    # brute force: dense quadrature of the pixel-integrated Gaussian
    fwhm = np.sqrt((lam_out / R)**2 - (lam_out / 1e5)**2)
    sig = fwhm / (2 * np.sqrt(2 * np.log(2)))
    ref = np.zeros(len(lam_out))
    xq = np.linspace(4850, 5150, 60000)
    fq = np.interp(xq, lam_in, spec)
    for i, lc in enumerate(lam_out):
        left = 0.5 * (lam_out[i] - lam_out[i - 1]) if i > 0 else \
            0.5 * (lam_out[1] - lam_out[0])
        right = 0.5 * (lam_out[i + 1] - lam_out[i]) \
            if i < len(lam_out) - 1 else left
        yq = np.linspace(lc - left, lc + right, 25)
        acc = 0.0
        for y in yq:
            g = np.exp(-0.5 * ((xq - y) / sig[i])**2) \
                / (sig[i] * np.sqrt(2 * np.pi))
            acc += np.trapezoid(fq * g, xq)
        ref[i] = acc / len(yq)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_rebinner_preserves_constant():
    lam_in = np.linspace(4000, 6000, 5000)
    lam_out = np.linspace(4500, 5500, 400)
    mat = read_grid.make_rebinner(lam_in, lam_out, lambda x: 1000 + 0 * x,
                                  resolution0=1e5)
    out = read_grid.apply_rebinner(mat, np.ones(5000))
    # 5-sigma kernel truncation leaves ~1e-6 deficit (same as the
    # reference's truncated kernel)
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


def test_resolution_exceeding_input_rejected():
    lam_in = np.linspace(4000, 6000, 100)
    with pytest.raises(ValueError):
        read_grid.make_rebinner(lam_in, lam_in, lambda x: 1e6 + 0 * x,
                                resolution0=1e5)
