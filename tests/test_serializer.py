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
