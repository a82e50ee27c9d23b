"""Illustris/TNG gas snapshot -> generic-AMR converter (the reference
python/AMR_grid/convert_illustris_to_generic.py + AMR_grid.py: Voronoi cells
resampled onto an adaptive octree by nearest-neighbor lookup).

Reads the standard TNG snapshot/cutout HDF5 layout (PartType0 with
Coordinates [ckpc/h], Density, InternalEnergy, ElectronAbundance,
NeutralHydrogenAbundance, Velocities, GFM_Metallicity, StarFormationRate),
converts to physical cgs-based LaRT units, builds an octree that refines
wherever a cell contains more than `nmax` gas particles (down to
`max_level`), assigns each leaf the nearest gas cell's properties, and
writes the generic-AMR HDF5 schema (README_HOWTO.md:448-469).

usage: python -m lart_tpu.tools.convert_illustris_to_generic cutout.h5 \
           [--out generic.h5] [--center x y z] [--size L_kpc] \
           [--nmax 8] [--max-level 12] [--sfr-temperature 1000]
"""

from __future__ import annotations

import argparse

import numpy as np

XH = 0.76
MP_G = 1.6726219e-24
KB = 1.380649e-16
GAMMA = 5.0 / 3.0
UNIT_E = 1e10            # (km/s)^2 -> (cm/s)^2 factor applied below


def load_tng_gas(path: str):
    import h5py
    with h5py.File(path, 'r') as f:
        h = f['Header'].attrs
        hub = float(h.get('HubbleParam', 0.6774))
        a = float(h.get('Time', 1.0))
        g = f['PartType0']
        pos = np.asarray(g['Coordinates'], np.float64) * a / hub   # kpc
        dens = np.asarray(g['Density'], np.float64) \
            * 1e10 / hub / (a / hub) ** 3                          # Msun/kpc3
        vel = np.asarray(g['Velocities'], np.float64) * np.sqrt(a)  # km/s
        u = np.asarray(g['InternalEnergy'], np.float64)            # (km/s)^2
        xe = np.asarray(g['ElectronAbundance'], np.float64) \
            if 'ElectronAbundance' in g else np.full(len(u), 1.0)
        xHI = np.asarray(g['NeutralHydrogenAbundance'], np.float64) \
            if 'NeutralHydrogenAbundance' in g else None
        Z = np.asarray(g['GFM_Metallicity'], np.float64) \
            if 'GFM_Metallicity' in g else None
        sfr = np.asarray(g['StarFormationRate'], np.float64) \
            if 'StarFormationRate' in g else None
    # temperature from internal energy (standard TNG recipe)
    mu = 4.0 / (1.0 + 3.0 * XH + 4.0 * XH * xe) * MP_G
    T = (GAMMA - 1.0) * u * 1e10 * mu / KB                        # K
    MSUN_G = 1.98892e33
    KPC_CM = 3.0856775814913673e21
    nH = dens * MSUN_G / KPC_CM ** 3 * XH / MP_G                  # cm^-3
    return dict(pos=pos, nH=nH, T=T, vel=vel, xHI=xHI, Z=Z, sfr=sfr)


def build_adaptive_octree(pos, center, size, nmax=8, max_level=12,
                          min_level=4):
    """Leaf list (x, y, z, level) refining cells with > nmax particles."""
    leaves = []
    stack = [(center[0], center[1], center[2], size, 0,
              np.arange(len(pos)))]
    while stack:
        cx, cy, cz, s, lev, idx = stack.pop()
        if lev >= min_level and (len(idx) <= nmax or lev >= max_level):
            leaves.append((cx, cy, cz, lev, idx))
            continue
        h = s / 4.0
        p = pos[idx]
        for io in range(8):
            ox = cx + (h if io & 1 else -h)
            oy = cy + (h if io & 2 else -h)
            oz = cz + (h if io & 4 else -h)
            sel = ((np.abs(p[:, 0] - ox) <= s / 4.0)
                   & (np.abs(p[:, 1] - oy) <= s / 4.0)
                   & (np.abs(p[:, 2] - oz) <= s / 4.0))
            stack.append((ox, oy, oz, s / 2.0, lev + 1, idx[sel]))
    return leaves


def convert(path: str, center=None, size=None, nmax=8, max_level=12,
            sfr_temperature=1000.0) -> dict:
    gas = load_tng_gas(path)
    pos = gas['pos']
    if center is None:
        center = 0.5 * (pos.min(axis=0) + pos.max(axis=0))
    if size is None:
        size = float((pos.max(axis=0) - pos.min(axis=0)).max()) * 1.001
    leaves = build_adaptive_octree(pos - np.asarray(center), (0.0,) * 3,
                                   size, nmax=nmax, max_level=max_level)
    from scipy.spatial import cKDTree
    tree = cKDTree(pos - np.asarray(center))
    cx = np.array([l[0] for l in leaves])
    cy = np.array([l[1] for l in leaves])
    cz = np.array([l[2] for l in leaves])
    lev = np.array([l[3] for l in leaves], np.int32)
    _, nn = tree.query(np.stack([cx, cy, cz], axis=1), k=1)

    T = gas['T'][nn].copy()
    nH = gas['nH'][nn].copy()
    if gas['sfr'] is not None:
        # star-forming (eEOS) cells: effective-temperature gas is treated
        # as cold neutral clouds (the reference converter's SFR treatment)
        sf = gas['sfr'][nn] > 0
        T[sf] = sfr_temperature
    data = {
        'x': cx, 'y': cy, 'z': cz, 'level': lev,
        'nH': nH, 'T': T,
        'vx': gas['vel'][nn, 0], 'vy': gas['vel'][nn, 1],
        'vz': gas['vel'][nn, 2],
        'boxlen': size, 'origin': (-size / 2,) * 3,
    }
    if gas['xHI'] is not None:
        data['xHI'] = gas['xHI'][nn]
    if gas['Z'] is not None:
        data['metallicity'] = gas['Z'][nn]
    return data


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('snapshot')
    ap.add_argument('--out', default='generic_amr.h5')
    ap.add_argument('--center', type=float, nargs=3, default=None)
    ap.add_argument('--size', type=float, default=None)
    ap.add_argument('--nmax', type=int, default=8)
    ap.add_argument('--max-level', type=int, default=12)
    ap.add_argument('--sfr-temperature', type=float, default=1000.0)
    a = ap.parse_args(argv)
    data = convert(a.snapshot, center=a.center, size=a.size, nmax=a.nmax,
                   max_level=a.max_level, sfr_temperature=a.sfr_temperature)
    from ..grid.amr import write_generic_amr
    write_generic_amr(a.out, data)
    print(f"wrote {a.out}: {len(data['x'])} leaves, "
          f"boxlen {data['boxlen']:.6g} kpc")
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
