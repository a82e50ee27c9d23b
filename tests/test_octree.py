"""Octree build + neighbor-table checks (native C++ with NumPy fallback)."""

import numpy as np

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
