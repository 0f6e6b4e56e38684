"""Round-trip tests of the HDF5 dict serializer."""
import numpy as np
import pytest

from rvspecfit_tpu import serializer


def test_roundtrip(tmp_path):
    data = {
        'x': np.int64(2),
        'vv': np.arange(3, dtype=np.float64),
        'nested': {'a': np.arange(5), 'b': {'c': 55, 'd': 66.5}},
        'nothing': None,
        'msg': 'Hello world!',
        'tup': (1, 2, 3),
        'lst': [1.1, 2.2, 3.3],
        'strs': ['test', 'example'],
        'strarr': np.array(['x', 'y', 'z']),
        'empty_list': [],
        'mixed': (1, 'x'),
        'with_none': [None, None, 3],
        'flag': True,
    }
    fn = str(tmp_path / 'data.h5')
    serializer.save_dict_to_hdf5(fn, data)
    loaded = serializer.load_dict_from_hdf5(fn)

    assert loaded['x'] == 2
    np.testing.assert_array_equal(loaded['vv'], data['vv'])
    np.testing.assert_array_equal(loaded['nested']['a'], np.arange(5))
    assert loaded['nested']['b']['d'] == 66.5
    assert loaded['nothing'] is None
    assert loaded['msg'] == 'Hello world!'
    assert loaded['tup'] == (1, 2, 3)
    assert loaded['lst'] == [1.1, 2.2, 3.3]
    assert loaded['strs'] == ['test', 'example']
    assert list(loaded['strarr']) == ['x', 'y', 'z']
    assert list(loaded['empty_list']) == []
    assert loaded['mixed'] == (1, 'x')
    assert loaded['with_none'] == [None, None, 3]
    assert loaded['flag'] is True


def test_verify_data(tmp_path):
    data = {
        'arr': np.arange(6, dtype=np.float64).reshape(2, 3),
        'nested': {'a': [1, 2, 3], 'b': 'text', 'n': None},
        'scalar': 3.5,
        'flag': False,
        'with_nan': np.array([1.0, np.nan]),
    }
    fn = str(tmp_path / 'v.h5')
    serializer.save_dict_to_hdf5(fn, data)
    loaded = serializer.load_dict_from_hdf5(fn)
    assert serializer.verify_data(data, loaded)

    bad = dict(loaded)
    bad['scalar'] = 3.6
    assert not serializer.verify_data(data, bad)
    bad = dict(loaded)
    bad['arr'] = loaded['arr'][:1]
    assert not serializer.verify_data(data, bad)
    bad = dict(loaded)
    del bad['flag']
    assert not serializer.verify_data(data, bad)


def test_file_queue_modes(tmp_path):
    """List / file / shared-lock-queue modes of utils.FileQueue
    (reference CI: tests/scripts/desi_fit.sh:37 queue mode)."""
    from rvspecfit_tpu import utils

    q = utils.FileQueue(file_list=['a', 'b'])
    assert list(q) == ['a', 'b']

    fn = tmp_path / 'files.txt'
    fn.write_text('f1\nf2\nf3\n')
    q = utils.FileQueue(file_from=str(fn))
    assert list(q) == ['f1', 'f2', 'f3']

    # queue mode: two consumers pop disjoint items atomically
    fn.write_text('f1\nf2\nf3\n')
    q1 = utils.FileQueue(file_from=str(fn), queue=True)
    q2 = utils.FileQueue(file_from=str(fn), queue=True)
    got = [next(q1), next(q2), next(q1)]
    assert sorted(got) == ['f1', 'f2', 'f3']
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        next(q2)
    # the queue file still exists (empty) for other consumers
    assert fn.exists() and fn.read_text() == ''


def test_sharded_file_queue():
    from rvspecfit_tpu import utils
    files = [f'f{i}' for i in range(7)]
    seen = []
    for r in range(3):
        seen += list(utils.ShardedFileQueue(files, rank=r, world=3))
    assert sorted(seen) == sorted(files)


def test_pickle_requires_optin(tmp_path):
    class Thing:
        pass

    fn = str(tmp_path / 'p.h5')
    with pytest.raises(ValueError):
        serializer.save_dict_to_hdf5(fn, {'t': Thing()})
    serializer.save_dict_to_hdf5(fn, {'t': (1, 2)}, allow_pickle=True)


def test_missing_file():
    with pytest.raises(RuntimeError):
        serializer.load_dict_from_hdf5('/nonexistent/file.h5')
