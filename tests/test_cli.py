"""CLI surface tests: every console script resolves and --help works;
the grid-masking tool flags templates that downstream stages skip."""
import importlib
import re
import sqlite3

import numpy as np
import pytest


def _console_scripts():
    with open('pyproject.toml') as fp:
        txt = fp.read()
    block = txt.split('[project.scripts]')[1].split('[')[0]
    return re.findall(r'(\w+)\s*=\s*"([\w.]+):(\w+)"', block)


def test_console_scripts_resolve():
    """Every pyproject console script points at an existing callable
    (guards against broken entry points)."""
    scripts = _console_scripts()
    assert len(scripts) >= 9
    for name, module, attr in scripts:
        mod = importlib.import_module(module)
        fn = getattr(mod, attr, None)
        assert callable(fn), f'{name} -> {module}:{attr} missing'


@pytest.mark.parametrize('module', [
    'rvspecfit_tpu.pipeline.read_grid',
    'rvspecfit_tpu.pipeline.make_interpol',
    'rvspecfit_tpu.pipeline.make_nd',
    'rvspecfit_tpu.pipeline.make_ccf',
    'rvspecfit_tpu.pipeline.regularize_grid',
    'rvspecfit_tpu.pipeline.mask_grid',
    'rvspecfit_tpu.pipeline.train_nn',
])
def test_cli_help(module, capsys):
    mod = importlib.import_module(module)
    with pytest.raises(SystemExit) as exc:
        mod.main(['--help'])
    assert exc.value.code == 0


def _make_db(path, rows):
    db = sqlite3.connect(str(path))
    db.execute('CREATE TABLE files (filename varchar, teff real, '
               'logg real, feh real, alpha real, id int, bad bool)')
    db.executemany('INSERT INTO files VALUES (?,?,?,?,?,?,0)', rows)
    db.commit()
    db.close()


def test_mask_grid(tmp_path):
    from rvspecfit_tpu.pipeline import mask_grid

    dbf = tmp_path / 'files.db'
    rows = [
        (f'f{i}.fits', t, g, f, a, i)
        for i, (t, g, f, a) in enumerate([
            (4000.0, 3.0, -1.0, -0.4),    # cool alpha=-0.4 -> bad
            (6000.0, 3.0, -1.0, -0.4),    # hot alpha=-0.4 -> keep
            (3100.0, 3.0, -0.5, 1.2),     # explicit bad point
            (5000.0, 4.0, 0.0, 0.2),      # ordinary -> keep
        ])
    ]
    _make_db(dbf, rows)
    out = tmp_path / 'masked.db'
    mask_grid.main(['--templdb', str(dbf), '--output', str(out),
                    '--phoenix'])
    with sqlite3.connect(str(out)) as conn:
        bad = dict(conn.execute('SELECT filename, bad FROM files'))
    assert bad == {'f0.fits': 1, 'f1.fits': 0, 'f2.fits': 1,
                   'f3.fits': 0}
    # original untouched
    with sqlite3.connect(str(dbf)) as conn:
        nbad = conn.execute('SELECT sum(bad) FROM files').fetchone()[0]
    assert not nbad

    # custom predicate + unmask
    mask_grid.main(['--templdb', str(out), '--where', 'teff>5500'])
    mask_grid.main(['--templdb', str(out), '--unmask',
                    '--where', 'teff>5500'])
    with sqlite3.connect(str(out)) as conn:
        bad = dict(conn.execute('SELECT filename, bad FROM files'))
    assert bad['f1.fits'] == 0 and bad['f0.fits'] == 1


def test_weave_coordinator_wiring(monkeypatch, tmp_path):
    """--coordinator maps the world rank/size onto the WEAVE driver's
    threadid/nthreads striping and tears the world down afterwards."""
    from rvspecfit_tpu.parallel import distributed
    from rvspecfit_tpu.survey import weave

    calls = {}
    monkeypatch.setattr(distributed, 'init_distributed',
                        lambda coord=None, n=None, p=None:
                        calls.setdefault('init', coord) and None
                        or (1, 3))
    monkeypatch.setattr(distributed, 'barrier',
                        lambda name=None, timeout_ms=None:
                        calls.setdefault('barrier', name))
    monkeypatch.setattr(distributed, 'shutdown',
                        lambda: calls.setdefault('shutdown', True))
    monkeypatch.setattr(weave, 'proc_many',
                        lambda files, outdir, config, **kw:
                        calls.setdefault('proc', kw))
    flist = tmp_path / 'in.txt'
    flist.write_text('a.fits,b.fits\n')
    weave.main(['--input_file', str(flist),
                '--output_dir', str(tmp_path),
                '--coordinator', 'localhost:1234'])
    assert calls['init'] == 'localhost:1234'
    assert calls['proc']['threadid'] == 1
    assert calls['proc']['nthreads'] == 3
    assert calls['barrier'] == 'rvst_weave_fit_done'
    assert calls['shutdown'] is True

    # explicit threadid/nthreads win over the world indices
    calls.clear()
    weave.main(['--input_file', str(flist),
                '--output_dir', str(tmp_path),
                '--coordinator', 'localhost:1234',
                '--threadid', '2', '--nthreads', '5'])
    assert calls['proc']['threadid'] == 2
    assert calls['proc']['nthreads'] == 5
