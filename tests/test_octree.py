"""Octree build + neighbor-table checks (native C++ with NumPy fallback)."""

import numpy as np
import pytest

from lart_tpu.grid.octree import build_octree


def uniform_leaves(n):
    xs = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing='ij')
    lev = np.full(n ** 3, int(np.log2(n)), np.int32)
    return X.ravel(), Y.ravel(), Z.ravel(), lev


def test_uniform_tree():
    x, y, z, lev = uniform_leaves(4)
    t = build_octree(x, y, z, lev, [0, 1, 0, 1, 0, 1])
    assert t.nleaf == 64
    assert t.ncells == 1 + 8 + 64
    assert t.levelmax == 2
    # every leaf cell has all interior neighbors at the same level
    for il in range(t.nleaf):
        ic = t.icell_of_leaf[il]
        cx, cy, cz, h = t.cx[ic], t.cy[ic], t.cz[ic], t.ch[ic]
        for f, (ddx, ddy, ddz) in enumerate(
                [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                 (0, 0, 1), (0, 0, -1)]):
            qx, qy, qz = cx + 2 * h * ddx, cy + 2 * h * ddy, cz + 2 * h * ddz
            nb = t.neighbor[ic, f]
            if 0 < qx < 1 and 0 < qy < 1 and 0 < qz < 1:
                assert nb >= 0
                assert abs(t.cx[nb] - qx) < 1e-12
            else:
                assert nb == -1


def test_mixed_level_neighbors():
    # one coarse leaf (level 1) + 8 fine leaves filling another octant
    xl = [0.25] + [0.625, 0.875] * 4
    yl = [0.25, 0.25, 0.25, 0.75, 0.75, 0.25, 0.25, 0.75, 0.75]
    zl = [0.25, 0.25, 0.25, 0.25, 0.25, 0.75, 0.75, 0.75, 0.75]
    lev = np.array([1] + [2] * 8, np.int32)
    t = build_octree(np.array(xl), np.array(yl), np.array(zl), lev,
                     [0, 1, 0, 1, 0, 1])
    assert t.nleaf == 9
    # fine leaf at (0.625, 0.25, 0.25): -x neighbor is the coarse leaf
    icf = t.icell_of_leaf[1]
    nb = t.neighbor[icf, 1]
    assert t.level[nb] == 1
    assert abs(t.cx[nb] - 0.25) < 1e-12


def test_python_fallback_matches_native():
    from lart_tpu.grid.octree import _build_octree_numpy, _load_native
    if _load_native() is None:
        return
    x, y, z, lev = uniform_leaves(2)
    t1 = build_octree(x, y, z, lev, [0, 1, 0, 1, 0, 1])
    t2 = _build_octree_numpy(x, y, z, lev, np.array([0., 1, 0, 1, 0, 1]))
    assert t1.ncells == t2.ncells
    np.testing.assert_array_equal(
        np.sort(t1.icell_of_leaf), np.sort(t2.icell_of_leaf))


def test_morton_order_locality_and_invariance(tmp_path):
    """Z-ordering renames leaf ids only: transport results are unchanged,
    and successive ids are spatially closer than in shuffled order."""
    import jax
    import numpy as np
    from lart_tpu.config import Params
    from lart_tpu.grid.amr import (make_amr_sphere, write_generic_amr,
                                   morton_order)
    from lart_tpu import driver

    data = make_amr_sphere(n_base=16, levels_extra=1, rmax=1.0, T=1e4)
    # shuffle to a worst-case input order
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(data['x']))
    for k in ('x', 'y', 'z', 'level', 'nH', 'T', 'vx', 'vy', 'vz'):
        data[k] = np.asarray(data[k])[perm]
    path = str(tmp_path / 'mo.h5')
    write_generic_amr(path, data)

    common = dict(nphotons=300, use_amr_grid=True, amr_file=path,
                  geometry='sphere', rmax=1.0, taumax=3.0,
                  temperature=1e4, xfreq_min=-30.0, xfreq_max=30.0,
                  n_devices=1, batch_size=256, chunk_cycles=8)
    r_on = driver.run(Params(amr_morton_order=True, **common), seed=5)
    r_off = driver.run(Params(amr_morton_order=False, **common), seed=5)
    np.testing.assert_allclose(r_on.Jout, r_off.Jout, rtol=1e-5, atol=1e-7)
    assert r_on.nscatt_tot == pytest.approx(r_off.nscatt_tot, rel=1e-5)

    # locality: mean index-neighbor distance under Z-order is well below
    # the shuffled order's
    x, y, z = (np.asarray(data[k], np.float64) for k in 'xyz')
    mo = morton_order(x, y, z, data['boxlen'], data['origin'])
    def mean_step(ordv):
        xo, yo, zo = x[ordv], y[ordv], z[ordv]
        return np.mean(np.sqrt(np.diff(xo) ** 2 + np.diff(yo) ** 2
                               + np.diff(zo) ** 2))
    assert mean_step(mo) < 0.5 * mean_step(np.arange(len(x)))
