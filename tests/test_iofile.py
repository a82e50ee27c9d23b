"""FITS/HDF5 io abstraction: round-trip, converter, format dispatch
(reference: src/iofile_mod.f90:81-143 backend dispatch,
python/lart_io.py:122-506 converter)."""
import numpy as np
import pytest

from lart_tpu.io.iofile import (open_write, open_read, convert,
                                detect_format, default_extension)


def _write_sample(path, fmt='auto'):
    with open_write(path, fmt) as w:
        g = w.create_group('Spectrum')
        g.create_dataset('Xfreq', data=np.linspace(-5, 5, 11))
        g.create_dataset('Jout', data=np.arange(11, dtype=np.float64))
        g.attrs['nphotons'] = 1000.0
        g.attrs['taumax'] = 1e6
        g.attrs['EXTNAME'] = 'Spectrum'
        g.attrs['comment_str'] = 'hello'
        g2 = w.create_group('Jmu')
        g2.create_dataset('data', data=np.ones((4, 3)))
        g2.attrs['nmu'] = 4
        g3 = w.create_group('Jx_1D')
        g3.create_dataset('data', data=np.ones((6, 2)))
        g3.create_dataset('radius', data=np.array([0.25, 0.75]))
        g3.attrs['geom_JPa'] = 1


def _check_sample(path, fmt='auto'):
    r = open_read(path, fmt)
    assert r.keys() == ['Spectrum', 'Jmu', 'Jx_1D']
    g = r['Spectrum']
    np.testing.assert_allclose(g['Xfreq'], np.linspace(-5, 5, 11))
    np.testing.assert_allclose(g['Jout'], np.arange(11))
    assert g.attrs['nphotons'] == 1000.0
    assert g.attrs['taumax'] == 1e6
    assert str(g.attrs['comment_str']).strip() == 'hello'
    np.testing.assert_allclose(r['Jmu']['data'], np.ones((4, 3)))
    assert r['Jmu'].attrs['nmu'] == 4
    np.testing.assert_allclose(r['Jx_1D/data'], np.ones((6, 2)))
    np.testing.assert_allclose(r['Jx_1D/radius'], [0.25, 0.75])
    assert 'Jx_1D/radius' in r
    assert 'Jx_1D/missing' not in r


def test_hdf5_roundtrip(tmp_path):
    p = str(tmp_path / 'out.h5')
    _write_sample(p)
    _check_sample(p)


def test_fits_roundtrip(tmp_path):
    p = str(tmp_path / 'out.fits')
    _write_sample(p)
    _check_sample(p)


def test_explicit_format_overrides_extension(tmp_path):
    p = str(tmp_path / 'out.dat')
    _write_sample(p, fmt='fits')
    _check_sample(p, fmt='fits')


def test_convert_both_ways(tmp_path):
    h5 = str(tmp_path / 'a.h5')
    fits = str(tmp_path / 'a.fits')
    h5b = str(tmp_path / 'b.h5')
    _write_sample(h5)
    convert(h5, fits)
    _check_sample(fits)
    convert(fits, h5b)
    _check_sample(h5b)


def test_unknown_format_raises(tmp_path):
    with pytest.raises(ValueError):
        detect_format('x.h5', 'netcdf')
    from lart_tpu.config import Params
    with pytest.raises(ValueError):
        Params(file_format='netcdf').resolve()


def test_default_extension():
    assert default_extension('fits') == '.fits'
    assert default_extension('hdf5') == '.h5'


def test_output_filename_respects_format():
    from lart_tpu.config import Params
    from lart_tpu.io.writer import output_filename
    assert output_filename(Params(base_name='run1',
                                  file_format='fits')) == 'run1.fits'
    assert output_filename(Params(base_name='run1')) == 'run1.h5'
