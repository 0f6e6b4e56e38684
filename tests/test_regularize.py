"""Test of the grid regularizer: an irregular (holey) grid becomes a
filled regular product usable by the regular-grid interpolator."""
import numpy as np

from rvspecfit_tpu import serializer, simulation
from rvspecfit_tpu.pipeline import regularize_grid


def test_regularize_fills_grid(tmp_path):
    rng = np.random.RandomState(0)
    lam = np.exp(np.linspace(np.log(4800), np.log(5200), 300))
    teffs = np.linspace(4500, 8000, 4)
    loggs = np.linspace(1.0, 4.0, 3)
    fehs = np.linspace(-2.0, 0.0, 4)
    alphas = np.linspace(0.0, 1.0, 3)
    vec, specs = [], []
    for t in teffs:
        for g in loggs:
            for f in fehs:
                for a in alphas:
                    if rng.uniform() < 0.15:
                        continue  # punch holes
                    vec.append([t, g, f, a])
                    specs.append(np.log(simulation.fake_spectrum(
                        lam, t, g, f, a, wresol=2.0)))
    vec = np.array(vec).T
    specs = np.array(specs)
    src = str(tmp_path / 'specs_in.h5')
    dst = str(tmp_path / 'specs_out.h5')
    serializer.save_dict_to_hdf5(src, dict(
        vec=vec, specs=specs, lam=lam,
        parnames=['teff', 'logg', 'feh', 'alpha'], lognorms=np.zeros(
            specs.shape[0]), log_step=True, log_spec=True,
        log_ids=[0], mapper_class='LogMapper', git_rev='t',
        revision='', cmdline='', file_ids=np.arange(specs.shape[0]),
        dbfile=''))

    new_fehs = [-2.0, -1.0, 0.0]
    new_alphas = [0.0, 0.5, 1.0]
    regularize_grid.converter(src, dst, new_fehs, new_alphas, window=4)
    out = serializer.load_dict_from_hdf5(dst)
    ovec = np.asarray(out['vec'])
    ospecs = np.asarray(out['specs'])
    assert ospecs.shape[0] == ovec.shape[1]
    # every (teff, logg) pair present carries the full new feh x alpha
    # product (no holes)
    pairs = {(t, g) for t, g in zip(ovec[0], ovec[1])}
    for (t, g) in pairs:
        sel = (ovec[0] == t) & (ovec[1] == g)
        got = {(f, a) for f, a in zip(ovec[2][sel], ovec[3][sel])}
        assert got == {(f, a) for f in new_fehs for a in new_alphas}
    # predictions should resemble true spectra at the node points
    errs = []
    for i in rng.choice(ospecs.shape[0], 20, replace=False):
        t, g, f, a = ovec[:, i]
        truth = np.log(simulation.fake_spectrum(lam, t, g, f, a,
                                                wresol=2.0))
        errs.append(np.abs(ospecs[i] - truth).mean())
    assert np.median(errs) < 0.25 * np.abs(specs).std() + 0.1
