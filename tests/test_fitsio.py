"""Round-trip tests of the minimal FITS reader/writer."""
import numpy as np
import pytest

from rvspecfit_tpu.io import fitsio


def test_image_roundtrip(tmp_path):
    fn = str(tmp_path / 'im.fits')
    data = np.arange(600, dtype=np.float64).reshape(20, 30) * 1.5
    fitsio.write(fn, [dict(kind='image', data=data,
                           header=[('OBJECT', 'test star', 'target'),
                                   ('EXPTIME', 1200.5, 'seconds'),
                                   ('NCOMBINE', 3, ''),
                                   ('VACUUM', True, '')])])
    f = fitsio.read(fn)
    np.testing.assert_array_equal(f[0].data, data)
    h = f[0].header
    assert h['OBJECT'] == 'test star'
    assert h['EXPTIME'] == 1200.5
    assert h['NCOMBINE'] == 3
    assert h['VACUUM'] is True


def test_multi_extension_and_extname(tmp_path):
    fn = str(tmp_path / 'multi.fits')
    a = np.random.RandomState(0).normal(size=(4, 8)).astype(np.float32)
    b = (np.arange(16) * 7).astype(np.int32)
    fitsio.write(fn, [
        dict(kind='image', data=None),
        dict(kind='image', data=a, name='FLUX'),
        dict(kind='image', data=b, name='IVAR'),
    ])
    f = fitsio.read(fn)
    assert len(f) == 3
    np.testing.assert_allclose(f['FLUX'].data, a)
    np.testing.assert_array_equal(f['IVAR'].data, b)
    assert 'FLUX' in f and 'MISSING' not in f


def test_bintable_roundtrip(tmp_path):
    fn = str(tmp_path / 'tab.fits')
    rng = np.random.RandomState(1)
    cols = [
        ('TARGETID', np.arange(10, dtype=np.int64) + 10**12),
        ('VRAD', rng.normal(size=10)),
        ('VRAD_ERR', rng.uniform(0, 1, 10).astype(np.float32)),
        ('SUCCESS', np.array([True, False] * 5)),
        ('NAME', np.array(['star_%d' % i for i in range(10)])),
        ('CHISQ_ARR', rng.normal(size=(10, 3))),
        ('NEXP', np.arange(10, dtype=np.int16)),
    ]
    fitsio.write(fn, [dict(kind='table', data=cols, name='RVTAB',
                           header=[('SURVEY', 'synthetic', '')])])
    f = fitsio.read(fn)
    t = f['RVTAB'].data
    np.testing.assert_array_equal(t['TARGETID'], cols[0][1])
    np.testing.assert_allclose(t['VRAD'], cols[1][1])
    np.testing.assert_allclose(t['VRAD_ERR'], cols[2][1], rtol=1e-7)
    np.testing.assert_array_equal(t['SUCCESS'], cols[3][1])
    assert list(t['NAME']) == ['star_%d' % i for i in range(10)]
    np.testing.assert_allclose(t['CHISQ_ARR'], cols[5][1])
    np.testing.assert_array_equal(t['NEXP'], cols[6][1])
    assert f['RVTAB'].header['SURVEY'] == 'synthetic'


def test_overwrite_protection(tmp_path):
    fn = str(tmp_path / 'x.fits')
    fitsio.write(fn, [dict(kind='image', data=np.zeros(4))])
    with pytest.raises(IOError):
        fitsio.write(fn, [dict(kind='image', data=np.zeros(4))],
                     overwrite=False)
