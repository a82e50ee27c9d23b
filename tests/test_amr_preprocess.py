"""region/subset/recenter preprocessing over generic AMR files
(reference python/AMR_grid/extract_amr_region.py, extract_amr_subset.py,
recenter_amr.py)."""
import os

import numpy as np
import pytest

from lart_tpu.grid.amr import make_amr_sphere, write_generic_amr
from lart_tpu.tools import amr_preprocess as ap


@pytest.fixture(scope='module')
def sphere_file(tmp_path_factory):
    td = tmp_path_factory.mktemp('amrpre')
    data = make_amr_sphere(n_base=16, levels_extra=1, rmax=1.0, T=1e4)
    path = os.path.join(td, 'sphere.h5')
    write_generic_amr(path, data)
    return path


def test_region_preserves_box(sphere_file, tmp_path):
    out = os.path.join(tmp_path, 'region.h5')
    src = ap.read_amr_table(sphere_file)
    ap.main(['region', sphere_file, '-o', out,
             '--center', '0', '0', '0', '--size', '1.0'])
    got = ap.read_amr_table(out)
    assert got['boxlen'] == pytest.approx(src['boxlen'])
    assert got['origin'] == pytest.approx(src['origin'])
    # only cells inside the cube survive, at unchanged coordinates
    assert got['x'].size < src['x'].size
    assert np.abs(got['x']).max() <= 0.5
    assert np.abs(got['z']).max() <= 0.5
    sel = (np.abs(src['x']) <= 0.5) & (np.abs(src['y']) <= 0.5) \
        & (np.abs(src['z']) <= 0.5)
    assert got['x'].size == int(sel.sum())
    np.testing.assert_array_equal(np.sort(got['nH']),
                                  np.sort(src['nH'][sel]))


def test_subset_recentrs_and_rebases_levels(sphere_file, tmp_path):
    out = os.path.join(tmp_path, 'subset.h5')
    src = ap.read_amr_table(sphere_file)
    # half-boxlen cube in the +x octant corner -> power-of-two rebase
    bl = src['boxlen']
    ap.main(['subset', sphere_file, '-o', out,
             '--center', str(bl / 4), '0', '0', '--size', str(bl / 2)])
    got = ap.read_amr_table(out)
    assert got['boxlen'] == pytest.approx(bl / 2)
    assert got['origin'] == pytest.approx((-bl / 4,) * 3)
    assert np.abs(got['x']).max() <= bl / 4
    # level rebased by log2(2) = 1
    assert got['level'].min() == src['level'].min() - 1

    # the carved file still builds a valid octree end-to-end
    from lart_tpu.config import Params
    from lart_tpu.grid.amr import build_amr
    par = Params(use_amr_grid=True, amr_file=out, taumax=10.0,
                 temperature=1e4, spectral_type='voigt',
                 source_geometry='point')
    res = build_amr(par.resolve())
    assert res.meta.grid_type == 'amr'


def test_recenter_modes(sphere_file, tmp_path):
    # shift the sphere file off-center first
    src = ap.read_amr_table(sphere_file)
    shifted = dict(src)
    shifted['x'] = src['x'] + 3.0
    shifted['y'] = src['y'] + 3.0
    shifted['z'] = src['z'] + 3.0
    bl = src['boxlen']
    shifted['origin'] = (3.0 - bl / 2, 3.0 - bl / 2, 3.0 - bl / 2)
    inp = os.path.join(tmp_path, 'off.h5')
    write_generic_amr(inp, shifted)

    out = os.path.join(tmp_path, 'centered.h5')
    ap.main(['recenter', inp, '-o', out])
    got = ap.read_amr_table(out)
    assert got['origin'] == pytest.approx((-bl / 2,) * 3)
    np.testing.assert_allclose(got['x'], src['x'], atol=1e-12)
    # row order bit-preserved
    np.testing.assert_array_equal(got['nH'], src['nH'])

    out2 = os.path.join(tmp_path, 'centered2.h5')
    ap.main(['recenter', inp, '-o', out2, '--mode', 'data-center'])
    got2 = ap.read_amr_table(out2)
    c = 0.5 * (got2['x'].min() + got2['x'].max())
    assert abs(c) < bl / 8


def test_fits_roundtrip(sphere_file, tmp_path):
    """The FITS flavor of the generic AMR schema round-trips through the
    native codec and interoperates with the HDF5 flavor."""
    src = ap.read_amr_table(sphere_file)
    fits_path = os.path.join(tmp_path, 'sphere.fits.gz')
    ap.write_amr_table(fits_path, dict(src))
    back = ap.read_amr_table(fits_path)
    assert back['boxlen'] == pytest.approx(src['boxlen'])
    for k in ('x', 'nH', 'T', 'level'):
        np.testing.assert_allclose(back[k], src[k], rtol=1e-6)

    # region-extract straight from FITS to HDF5
    out = os.path.join(tmp_path, 'reg.h5')
    ap.main(['region', fits_path, '-o', out,
             '--center', '0', '0', '0', '--size', '1.0'])
    got = ap.read_amr_table(out)
    assert np.abs(got['x']).max() <= 0.5
