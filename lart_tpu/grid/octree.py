"""Linear octree for the AMR grid: host build (C++ or NumPy) + device SoA.

The reference stores the octree as flat arrays with a precomputed 6-face
neighbor table for O(1) traversal hops (reference: src/octree_mod.f90:19-138,
:619-697).  That layout is already gather-friendly; here it becomes immutable
device int32/f32 arrays, with the per-leaf physics indexed by leaf id.  The
build runs in native C++ (lart_tpu/native/octree.cpp, auto-compiled on first
use) with a pure-NumPy fallback.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', 'native')
_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, 'liblart_octree.so')
    if not os.path.exists(so):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.lart_octree_build.restype = ctypes.c_int64
    lib.lart_octree_build.argtypes = [
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64)]
    lib.lart_octree_ncells.restype = ctypes.c_int32
    lib.lart_octree_ncells.argtypes = [ctypes.c_int64]
    lib.lart_octree_levelmax.restype = ctypes.c_int32
    lib.lart_octree_levelmax.argtypes = [ctypes.c_int64]
    lib.lart_octree_fill.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32)]
    lib.lart_octree_free.argtypes = [ctypes.c_int64]
    _LIB = lib
    return lib


@dataclasses.dataclass
class HostOctree:
    """Host-side flat octree (0-based indices; -1 = none)."""
    ncells: int
    nleaf: int
    levelmax: int
    box: tuple                      # (xmin, xmax, ymin, ymax, zmin, zmax)
    parent: np.ndarray              # (ncells,) int32
    children: np.ndarray            # (ncells, 8) int32
    level: np.ndarray               # (ncells,)
    cx: np.ndarray
    cy: np.ndarray
    cz: np.ndarray
    ch: np.ndarray
    ileaf: np.ndarray               # (ncells,) leaf id or -1
    icell_of_leaf: np.ndarray       # (nleaf,)
    neighbor: np.ndarray            # (ncells, 6)


def build_octree(xl, yl, zl, lev, box) -> HostOctree:
    """Build the linear octree + neighbor table from a flat leaf list."""
    xl = np.ascontiguousarray(xl, np.float64)
    yl = np.ascontiguousarray(yl, np.float64)
    zl = np.ascontiguousarray(zl, np.float64)
    lev = np.ascontiguousarray(lev, np.int32)
    boxa = np.ascontiguousarray(box, np.float64)
    n = len(xl)
    lib = _load_native()
    if lib is not None:
        h = lib.lart_octree_build(n, xl, yl, zl, lev, boxa)
        ncells = int(lib.lart_octree_ncells(h))
        levelmax = int(lib.lart_octree_levelmax(h))
        parent = np.empty(ncells, np.int32)
        children = np.empty((ncells, 8), np.int32)
        level = np.empty(ncells, np.int32)
        cx = np.empty(ncells)
        cy = np.empty(ncells)
        cz = np.empty(ncells)
        ch = np.empty(ncells)
        ileaf = np.empty(ncells, np.int32)
        icell_of_leaf = np.empty(n, np.int32)
        neighbor = np.empty((ncells, 6), np.int32)
        lib.lart_octree_fill(h, parent, children, level, cx, cy, cz, ch,
                             ileaf, icell_of_leaf, neighbor)
        lib.lart_octree_free(h)
        # convert from 1-based (C++ mirrors the Fortran convention) to 0-based
        return HostOctree(
            ncells=ncells, nleaf=n, levelmax=levelmax, box=tuple(boxa),
            parent=parent - 1, children=children - 1, level=level,
            cx=cx, cy=cy, cz=cz, ch=ch, ileaf=ileaf - 1,
            icell_of_leaf=icell_of_leaf - 1, neighbor=neighbor - 1)
    return _build_octree_numpy(xl, yl, zl, lev, boxa)


def _build_octree_numpy(xl, yl, zl, lev, box) -> HostOctree:
    """Pure-Python fallback builder (slow; used when g++ is unavailable)."""
    xmin, xmax, ymin, ymax, zmin, zmax = box
    n = len(xl)
    parent = [-1]
    children = [[-1] * 8]
    level = [0]
    cx = [0.5 * (xmin + xmax)]
    cy = [0.5 * (ymin + ymax)]
    cz = [0.5 * (zmin + zmax)]
    ch = [0.5 * (xmax - xmin)]
    ileaf = [-1]
    icell_of_leaf = np.full(n, -1, np.int32)
    levelmax = 0
    for i in range(n):
        t = int(lev[i])
        levelmax = max(levelmax, t)
        ic = 0
        while level[ic] < t:
            io = (1 if xl[i] >= cx[ic] else 0) \
                + (2 if yl[i] >= cy[ic] else 0) \
                + (4 if zl[i] >= cz[ic] else 0)
            child = children[ic][io]
            if child < 0:
                h = ch[ic] * 0.5
                child = len(parent)
                parent.append(ic)
                children.append([-1] * 8)
                level.append(level[ic] + 1)
                cx.append(cx[ic] + (h if io & 1 else -h))
                cy.append(cy[ic] + (h if io & 2 else -h))
                cz.append(cz[ic] + (h if io & 4 else -h))
                ch.append(h)
                ileaf.append(-1)
                children[ic][io] = child
            ic = child
        ileaf[ic] = i
        icell_of_leaf[i] = ic
    ncells = len(parent)
    cxa, cya, cza, cha = map(np.asarray, (cx, cy, cz, ch))
    leva = np.asarray(level, np.int32)
    childa = np.asarray(children, np.int32)
    ileafa = np.asarray(ileaf, np.int32)
    parenta = np.asarray(parent, np.int32)

    def find_at_level(x, y, z, t):
        if not (xmin <= x <= xmax and ymin <= y <= ymax and zmin <= z <= zmax):
            return -1
        ic = 0
        while True:
            if leva[ic] >= t or ileafa[ic] >= 0:
                return ic
            io = (1 if x >= cxa[ic] else 0) + (2 if y >= cya[ic] else 0) \
                + (4 if z >= cza[ic] else 0)
            c = childa[ic, io]
            if c < 0:
                return ic
            ic = c

    def is_anc(anc, desc):
        c = desc
        while c >= 0:
            c = parenta[c]
            if c == anc:
                return True
        return False

    neighbor = np.full((ncells, 6), -1, np.int32)
    for ic in range(ncells):
        hp = 2.0 * cha[ic]
        q = [(cxa[ic] + hp, cya[ic], cza[ic]), (cxa[ic] - hp, cya[ic], cza[ic]),
             (cxa[ic], cya[ic] + hp, cza[ic]), (cxa[ic], cya[ic] - hp, cza[ic]),
             (cxa[ic], cya[ic], cza[ic] + hp), (cxa[ic], cya[ic], cza[ic] - hp)]
        for f, (qx, qy, qz) in enumerate(q):
            nb = find_at_level(qx, qy, qz, leva[ic])
            if nb >= 0 and nb != ic and is_anc(nb, ic):
                nb = -1
            neighbor[ic, f] = nb
    return HostOctree(ncells=ncells, nleaf=n, levelmax=levelmax,
                      box=tuple(box), parent=parenta, children=childa,
                      level=leva, cx=cxa, cy=cya, cz=cza, ch=cha,
                      ileaf=ileafa, icell_of_leaf=icell_of_leaf,
                      neighbor=neighbor)


def build_fine_map(tree: HostOctree, limit: int = 34_000_000):
    """Flattened finest-level lookup table: fine_map[i, j, k] = the
    childless cell (leaf or gap) covering fine voxel (i, j, k) of the
    virtual uniform grid at the octree's deepest refinement level.

    With it, "which cell does this point enter" -- the per-step hot
    question of the AMR raytracer -- is ONE gather instead of a
    neighbor-table hop plus a levelmax-deep octant descent (4 gathers per
    level).  Memory is (2^levelmax)^3 * 4 bytes, so the table is built
    only when that stays under `limit` voxels (128^3 AMR = 8 MB;
    RAMSES-depth trees fall back to the descent walk).  The reference has
    no counterpart -- its per-CPU pointer chase is cheap in scalar code
    (octree_mod.f90:772-822) but serializes on a vector machine."""
    nf = 1 << tree.levelmax
    if nf ** 3 > limit:
        return None
    xmin, _, ymin, _, zmin, _ = tree.box
    dxf = 2.0 * tree.ch[0] / nf
    fm = np.full((nf, nf, nf), -1, np.int32)
    # paint EVERY node's extent, coarse level first, so each voxel ends up
    # owned by the DEEPEST node covering it.  That is exactly the octant
    # descent's answer, including gaps: a point in a missing octant of an
    # internal node resolves to that node itself (octree_mod.f90:210,771),
    # and here the internal node's paint simply survives un-overwritten.
    order = np.argsort(tree.level, kind='stable')
    lev_sorted = tree.level[order]
    for L in np.unique(lev_sorted):
        ids = order[lev_sorted == L]
        w = 1 << (tree.levelmax - int(L))
        i0 = np.rint((tree.cx[ids] - tree.ch[ids] - xmin) / dxf) \
            .astype(np.int64)
        j0 = np.rint((tree.cy[ids] - tree.ch[ids] - ymin) / dxf) \
            .astype(np.int64)
        k0 = np.rint((tree.cz[ids] - tree.ch[ids] - zmin) / dxf) \
            .astype(np.int64)
        if w == 1:
            fm[i0, j0, k0] = ids
        else:
            for m, idx in enumerate(ids):
                fm[i0[m]:i0[m] + w, j0[m]:j0[m] + w,
                   k0[m]:k0[m] + w] = idx
    assert (fm >= 0).all()
    return fm


class AmrDevice(NamedTuple):
    """Device-resident AMR arrays: tree topology + per-leaf physics."""
    # topology (ncells)
    children: jnp.ndarray      # (ncells, 8) int32, -1 = none
    node_cx: jnp.ndarray       # (ncells,) f32
    node_cy: jnp.ndarray
    node_cz: jnp.ndarray
    node_ch: jnp.ndarray       # (ncells,) f32 half-width
    ileaf: jnp.ndarray         # (ncells,) int32 leaf id or -1
    neighbor: jnp.ndarray      # (ncells, 6) int32
    # per-leaf geometry (nleaf)
    leaf_cx: jnp.ndarray       # f32
    leaf_cy: jnp.ndarray
    leaf_cz: jnp.ndarray
    leaf_ch: jnp.ndarray
    leaf_cell: jnp.ndarray     # (nleaf,) int32: cell index of leaf
    # per-leaf physics (nleaf)
    rhokap: jnp.ndarray
    rhokapD: Optional[jnp.ndarray]
    Dfreq: Optional[jnp.ndarray]      # None on uniform-T fast path
    voigt_a: Optional[jnp.ndarray]
    vfx: Optional[jnp.ndarray]
    vfy: Optional[jnp.ndarray]
    vfz: Optional[jnp.ndarray]
    # (2^levelmax,)^3 childless-cell lookup (build_fine_map) or None
    fine_map: Optional[jnp.ndarray] = None


def to_device(tree: HostOctree, rhokap, rhokapD=None, Dfreq=None,
              voigt_a=None, vfx=None, vfy=None, vfz=None,
              fine_limit: int = 34_000_000) -> AmrDevice:
    f32 = lambda a: jnp.asarray(a, jnp.float32) if a is not None else None
    i32 = lambda a: jnp.asarray(a, jnp.int32)
    lc = tree.icell_of_leaf
    fm = build_fine_map(tree, fine_limit) if fine_limit > 0 else None
    return AmrDevice(
        children=i32(tree.children),
        node_cx=f32(tree.cx), node_cy=f32(tree.cy), node_cz=f32(tree.cz),
        node_ch=f32(tree.ch),
        ileaf=i32(tree.ileaf), neighbor=i32(tree.neighbor),
        leaf_cx=f32(tree.cx[lc]), leaf_cy=f32(tree.cy[lc]),
        leaf_cz=f32(tree.cz[lc]), leaf_ch=f32(tree.ch[lc]),
        leaf_cell=i32(lc),
        rhokap=f32(rhokap), rhokapD=f32(rhokapD), Dfreq=f32(Dfreq),
        voigt_a=f32(voigt_a), vfx=f32(vfx), vfy=f32(vfy), vfz=f32(vfz),
        fine_map=i32(fm) if fm is not None else None)
