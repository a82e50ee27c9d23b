"""RAMSES snapshot -> generic-AMR leaf-list converter (the reference
convert_ramses_to_generic.x, src/convert_ramses_to_generic.f90:1-353, and
python/AMR_grid/convert_ramses_to_generic.py).

Reads the standard RAMSES v3 output layout (info_XXXXX.txt +
amr_XXXXX.outYYYYY + hydro_XXXXX.outYYYYY Fortran sequential-record files),
extracts leaf cells, converts to physical units, optionally computes the
LaRT physics columns (xHI/ne/ndust/emissivity via the same CIE/Laursen09/
Case-B models the AMR grid builder uses), and writes a generic-AMR HDF5
file (README_HOWTO.md:448-469 schema).

usage: python -m lart_tpu.tools.convert_ramses_to_generic \
           <output_dir or output_00042> [--snapnum 42] [--out generic.h5] \
           [--unit kpc] [--compute-physics] [--zref 0.0134]
"""

from __future__ import annotations

import argparse
import os
import re
import struct
from typing import Dict

import numpy as np

KPC2CM = 3.0856775814913673e21
MP_G = 1.6726219e-24           # proton mass [g]
XH = 0.76                      # hydrogen mass fraction


class FortranFile:
    """Minimal sequential-record reader for Fortran unformatted files
    (4-byte record markers)."""

    def __init__(self, path):
        self.f = open(path, 'rb')

    def close(self):
        self.f.close()

    def record(self) -> bytes:
        head = self.f.read(4)
        if len(head) < 4:
            raise EOFError
        n = struct.unpack('<i', head)[0]
        data = self.f.read(n)
        tail = struct.unpack('<i', self.f.read(4))[0]
        if tail != n:
            raise IOError('corrupt Fortran record')
        return data

    def ints(self) -> np.ndarray:
        return np.frombuffer(self.record(), np.int32)

    def doubles(self) -> np.ndarray:
        return np.frombuffer(self.record(), np.float64)

    def skip(self, n=1):
        for _ in range(n):
            self.record()


def read_info(repo: str, snap: int) -> Dict[str, float]:
    path = os.path.join(repo, f'output_{snap:05d}', f'info_{snap:05d}.txt')
    info: Dict[str, float] = {}
    with open(path) as fh:
        for ln in fh:
            m = re.match(r'\s*(\w+)\s*=\s*([-+0-9.eEdD]+)', ln)
            if m:
                info[m.group(1)] = float(m.group(2).replace('D', 'E')
                                         .replace('d', 'e'))
    return info


def _fname(repo, snap, kind, icpu):
    return os.path.join(repo, f'output_{snap:05d}',
                        f'{kind}_{snap:05d}.out{icpu:05d}')


def read_cpu(repo: str, snap: int, icpu: int, info: Dict[str, float]):
    """Leaf cells of one cpu file pair. Returns dict of arrays in code
    units (positions in [0, boxlen])."""
    ncpu = int(info['ncpu'])
    ndim = int(info['ndim'])
    boxlen = info.get('boxlen', 1.0)
    twotondim = 2 ** ndim

    amr = FortranFile(_fname(repo, snap, 'amr', icpu))
    amr.skip(3)                           # ncpu, ndim, nx/ny/nz
    nlevelmax_f = int(amr.ints()[0])
    amr.skip(1)                           # ngridmax
    nboundary = int(amr.ints()[0])
    amr.skip(1)                           # ngrid_current
    amr.skip(1)                           # boxlen
    # standard v3 bookkeeping block: noutput/iout/ifout, tout, aout, t,
    # dtold, dtnew, nstep, const(stat), cosmo, timing, mass_sph
    amr.skip(11)
    amr.skip(1)                           # headl
    numbl = np.frombuffer(amr.record(), np.int32).reshape(
        nlevelmax_f, ncpu, order='C')
    amr.skip(1)                           # numbtot
    if nboundary > 0:
        amr.skip(3)                       # headb, tailb, numbb
    amr.skip(2)                           # free memory, used memory
    amr.skip(1)                           # ordering string
    amr.skip(1)                           # bound keys
    amr.skip(3)                           # coarse: son, flag1, cpu_map

    hyd = FortranFile(_fname(repo, snap, 'hydro', icpu))
    hyd.skip(1)                           # ncpu
    nvar = int(hyd.ints()[0])
    hyd.skip(4)                           # ndim, nlevelmax, nboundary, gamma

    xs, ys, zs, lvl = [], [], [], []
    rho, vx, vy, vz, pres, met = [], [], [], [], [], []

    for ilevel in range(1, nlevelmax_f + 1):
        dx = 0.5 ** ilevel
        for ibound in range(ncpu + nboundary):
            # hydro per-level header
            hyd.skip(1)                   # ilevel
            ncache_h = int(hyd.ints()[0])
            ng = int(numbl[ilevel - 1, ibound]) if ibound < ncpu else ncache_h
            if ng > 0:
                amr.skip(3)               # grid index, next, prev
                xg = [np.frombuffer(amr.record(), np.float64)
                      for _ in range(ndim)]
                amr.skip(1 + 2 * ndim)    # father + nbor
                son = [np.frombuffer(amr.record(), np.int32)
                       for _ in range(twotondim)]
                amr.skip(2 * twotondim)   # cpu_map, flag1
                uvars = [[np.frombuffer(hyd.record(), np.float64)
                          for _ in range(nvar)] for _ in range(twotondim)]
                if ibound == icpu - 1:    # this cpu's own grids
                    for ind in range(twotondim):
                        leaf = son[ind] == 0
                        if not leaf.any():
                            continue
                        ox = (ind & 1) - 0.5
                        oy = ((ind >> 1) & 1) - 0.5
                        oz = ((ind >> 2) & 1) - 0.5
                        xs.append((xg[0][leaf] + ox * dx) * boxlen)
                        ys.append((xg[1][leaf] + oy * dx) * boxlen)
                        zs.append((xg[2][leaf] + oz * dx) * boxlen)
                        lvl.append(np.full(leaf.sum(), ilevel, np.int32))
                        rho.append(uvars[ind][0][leaf])
                        vx.append(uvars[ind][1][leaf])
                        vy.append(uvars[ind][2][leaf])
                        vz.append(uvars[ind][3][leaf])
                        pres.append(uvars[ind][4][leaf])
                        if nvar > 5:
                            met.append(uvars[ind][5][leaf])
    amr.close()
    hyd.close()
    if not xs:
        return None
    out = {
        'x': np.concatenate(xs), 'y': np.concatenate(ys),
        'z': np.concatenate(zs), 'level': np.concatenate(lvl),
        'rho': np.concatenate(rho), 'vx': np.concatenate(vx),
        'vy': np.concatenate(vy), 'vz': np.concatenate(vz),
        'P': np.concatenate(pres),
    }
    if met:
        out['Z'] = np.concatenate(met)
    return out


def convert(repo: str, snap: int, unit: str = 'kpc',
            compute_physics: bool = False, z_ref: float = 0.0134) -> dict:
    info = read_info(repo, snap)
    ncpu = int(info['ncpu'])
    unit_l = info['unit_l']                  # cm per code length
    unit_d = info['unit_d']                  # g/cm3 per code density
    unit_t = info['unit_t']                  # s per code time
    unit_v = unit_l / unit_t / 1e5           # km/s
    # temperature from P/rho: T/mu = (P/rho) * (unit_v_cgs^2) * mp/kB
    KB = 1.380649e-16
    T_fac = (unit_l / unit_t) ** 2 * MP_G / KB

    parts = []
    for icpu in range(1, ncpu + 1):
        got = read_cpu(repo, snap, icpu, info)
        if got is not None:
            parts.append(got)
    cat = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    scale = unit_l / KPC2CM if unit == 'kpc' else 1.0
    boxlen = info.get('boxlen', 1.0) * scale
    nH = cat['rho'] * unit_d * XH / MP_G
    T_over_mu = cat['P'] / np.maximum(cat['rho'], 1e-300) * T_fac
    data = {
        'x': cat['x'] * scale - boxlen / 2.0,
        'y': cat['y'] * scale - boxlen / 2.0,
        'z': cat['z'] * scale - boxlen / 2.0,
        'level': cat['level'],
        'nH': nH,
        'T': T_over_mu,                      # T/mu; mu ~ 1 for neutral gas
        'vx': cat['vx'] * unit_v,
        'vy': cat['vy'] * unit_v,
        'vz': cat['vz'] * unit_v,
        'boxlen': boxlen,
        'origin': (-boxlen / 2.0,) * 3,
    }
    if 'Z' in cat:
        data['metallicity'] = cat['Z']
    if compute_physics:
        from ..grid.amr import (cie_neutral_fraction_formula,
                                laursen09_ndust, caseB_lya_emissivity)
        xHI = cie_neutral_fraction_formula(data['T'])
        ne = nH * (1.0 - xHI)
        data['xHI'] = xHI
        data['n_e'] = ne
        data['emissivity'] = caseB_lya_emissivity(nH, data['T'], xHI, ne)
        Z = data.get('metallicity', np.full_like(nH, z_ref))
        data['ndust'] = laursen09_ndust(nH, xHI, Z, z_ref, 0.01)
    return data


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('repository',
                    help='RAMSES run dir (or its output_XXXXX subdir)')
    ap.add_argument('--snapnum', type=int, default=-1)
    ap.add_argument('--out', default='generic_amr.h5')
    ap.add_argument('--unit', default='kpc', choices=['kpc', 'code'])
    ap.add_argument('--compute-physics', action='store_true')
    ap.add_argument('--zref', type=float, default=0.0134)
    a = ap.parse_args(argv)

    repo, snap = a.repository, a.snapnum
    m = re.search(r'output_(\d+)/?$', repo)
    if m:
        snap = int(m.group(1))
        repo = os.path.dirname(repo.rstrip('/')) or '.'
    if snap < 0:
        snaps = sorted(int(d.split('_')[1]) for d in os.listdir(repo)
                       if re.match(r'output_\d+$', d))
        if not snaps:
            raise SystemExit(f'no output_XXXXX dirs under {repo}')
        snap = snaps[-1]

    data = convert(repo, snap, unit=a.unit,
                   compute_physics=a.compute_physics, z_ref=a.zref)
    from ..grid.amr import write_generic_amr
    write_generic_amr(a.out, data)
    print(f"wrote {a.out}: {len(data['x'])} leaves, "
          f"boxlen {data['boxlen']:.6g} {a.unit}")
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
