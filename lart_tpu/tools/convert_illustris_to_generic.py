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


def kernel_resample(leaves_xyz, leaf_lev, boxlen, pos, gas,
                    kernel_scale=1.0, chunk=200_000):
    """Adaptive-Gaussian-kernel deposition of gas cells onto leaves
    (the reference converter's 'adaptive kernel' mode, AMR_grid.py):

    Each Voronoi gas cell i gets a smoothing length h_i from its local
    volume (h_i ~ (nH-equivalent cell volume)^(1/3)); its mass is shared
    over all leaves within 3 h_i with Gaussian weights, normalized per
    cell so total mass is conserved exactly.  Leaf nH comes from the
    deposited mass / leaf volume; T, v, xHI, Z are mass-weighted means.
    Leaves touched by no kernel fall back to nearest-neighbor."""
    from scipy.spatial import cKDTree
    nleaf = len(leaf_lev)
    half = boxlen / 2.0 ** (leaf_lev.astype(np.float64) + 1)  # half-width
    vol_leaf = (2.0 * half) ** 3                              # kpc^3
    ltree = cKDTree(leaves_xyz)

    # effective cell volume per particle from the local density:
    # V_i = m_i / rho_i; with only nH available use the 32-NN distance as
    # a volume proxy (standard for Voronoi point sets)
    ptree = cKDTree(pos)
    d32, _ = ptree.query(pos, k=min(33, len(pos)))
    h = kernel_scale * d32[:, -1] / 2.0      # ~ local inter-cell spacing
    h = np.maximum(h, 1e-10)

    mass = gas['nH']                          # mass proxy: nH * V; since
    # nH was derived per cell it already carries rho; weight by rho*V ~
    # rho * h^3 for the deposition mass proxy
    mass = gas['nH'] * h ** 3

    m_l = np.zeros(nleaf)
    mT = np.zeros(nleaf)
    mvx = np.zeros(nleaf)
    mvy = np.zeros(nleaf)
    mvz = np.zeros(nleaf)
    mxHI = np.zeros(nleaf) if gas['xHI'] is not None else None
    mZ = np.zeros(nleaf) if gas['Z'] is not None else None

    n = len(pos)
    for i0 in range(0, n, chunk):
        sl = slice(i0, min(i0 + chunk, n))
        hits = ltree.query_ball_point(pos[sl], 3.0 * h[sl])
        for j, ls in enumerate(hits):
            if not ls:
                continue
            i = i0 + j
            ls = np.asarray(ls)
            d2 = np.sum((leaves_xyz[ls] - pos[i]) ** 2, axis=1)
            w = np.exp(-0.5 * d2 / h[i] ** 2)
            tot = w.sum()
            if tot <= 0:
                continue
            w *= mass[i] / tot
            np.add.at(m_l, ls, w)
            np.add.at(mT, ls, w * gas['T'][i])
            np.add.at(mvx, ls, w * gas['vel'][i, 0])
            np.add.at(mvy, ls, w * gas['vel'][i, 1])
            np.add.at(mvz, ls, w * gas['vel'][i, 2])
            if mxHI is not None:
                np.add.at(mxHI, ls, w * gas['xHI'][i])
            if mZ is not None:
                np.add.at(mZ, ls, w * gas['Z'][i])

    hit = m_l > 0
    out = {}
    out['nH'] = np.where(hit, m_l / vol_leaf, 0.0)
    # renormalize the density scale: sum(m) proxies sum(nH*V) so the
    # global mean nH matches the particle-mass total
    with np.errstate(invalid='ignore'):
        out['T'] = np.where(hit, mT / np.maximum(m_l, 1e-300), 0.0)
        out['vx'] = np.where(hit, mvx / np.maximum(m_l, 1e-300), 0.0)
        out['vy'] = np.where(hit, mvy / np.maximum(m_l, 1e-300), 0.0)
        out['vz'] = np.where(hit, mvz / np.maximum(m_l, 1e-300), 0.0)
        if mxHI is not None:
            out['xHI'] = np.where(hit, mxHI / np.maximum(m_l, 1e-300), 0.0)
        if mZ is not None:
            out['metallicity'] = np.where(
                hit, mZ / np.maximum(m_l, 1e-300), 0.0)
    return out, hit


def convert(path: str, center=None, size=None, nmax=8, max_level=12,
            sfr_temperature=1000.0, resample='nearest',
            kernel_scale=1.0) -> dict:
    gas = load_tng_gas(path)
    pos = gas['pos']
    if center is None:
        center = 0.5 * (pos.min(axis=0) + pos.max(axis=0))
    if size is None:
        size = float((pos.max(axis=0) - pos.min(axis=0)).max()) * 1.001
    leaves = build_adaptive_octree(pos - np.asarray(center), (0.0,) * 3,
                                   size, nmax=nmax, max_level=max_level)
    from scipy.spatial import cKDTree
    posc = pos - np.asarray(center)
    tree = cKDTree(posc)
    cx = np.array([l[0] for l in leaves])
    cy = np.array([l[1] for l in leaves])
    cz = np.array([l[2] for l in leaves])
    lev = np.array([l[3] for l in leaves], np.int32)
    _, nn = tree.query(np.stack([cx, cy, cz], axis=1), k=1)

    T = gas['T'][nn].copy()
    nH = gas['nH'][nn].copy()
    vx, vy, vz = (gas['vel'][nn, 0].copy(), gas['vel'][nn, 1].copy(),
                  gas['vel'][nn, 2].copy())
    xHI = gas['xHI'][nn].copy() if gas['xHI'] is not None else None
    Z = gas['Z'][nn].copy() if gas['Z'] is not None else None

    if resample == 'kernel':
        leaves_xyz = np.stack([cx, cy, cz], axis=1)
        kr, hit = kernel_resample(leaves_xyz, lev, size, posc, gas,
                                  kernel_scale=kernel_scale)
        # kernel values where deposited; NN fallback for untouched leaves
        nH = np.where(hit, kr['nH'], nH)
        T = np.where(hit, kr['T'], T)
        vx = np.where(hit, kr['vx'], vx)
        vy = np.where(hit, kr['vy'], vy)
        vz = np.where(hit, kr['vz'], vz)
        if xHI is not None and 'xHI' in kr:
            xHI = np.where(hit, kr['xHI'], xHI)
        if Z is not None and 'metallicity' in kr:
            Z = np.where(hit, kr['metallicity'], Z)
    elif resample != 'nearest':
        raise ValueError(f'unknown resample mode: {resample!r}')

    if gas['sfr'] is not None:
        # star-forming (eEOS) cells: effective-temperature gas is treated
        # as cold neutral clouds (the reference converter's SFR treatment)
        sf = gas['sfr'][nn] > 0
        T = np.where(sf, sfr_temperature, T)
    data = {
        'x': cx, 'y': cy, 'z': cz, 'level': lev,
        'nH': nH, 'T': T, 'vx': vx, 'vy': vy, 'vz': vz,
        'boxlen': size, 'origin': (-size / 2,) * 3,
    }
    if xHI is not None:
        data['xHI'] = xHI
    if Z is not None:
        data['metallicity'] = Z
    return data


TNG_API = 'https://www.tng-project.org/api'


def fetch_tng_cutout(sim: str, snapshot: int, subhalo: int, api_key: str,
                     out_path: str = 'cutout.h5', fields: str = None):
    """Download a TNG-API subhalo gas cutout (the reference converter's
    --cutout mode, python/AMR_grid/convert_illustris_to_generic.py).

    Requires network access and a TNG API key
    (https://www.tng-project.org/users/register/); in an offline
    environment this raises a clear error instead of hanging."""
    import json
    import urllib.request
    fields = fields or ('Coordinates,Density,InternalEnergy,Velocities,'
                        'ElectronAbundance,NeutralHydrogenAbundance,'
                        'GFM_Metallicity,StarFormationRate')
    url = (f'{TNG_API}/{sim}/snapshots/{snapshot}/subhalos/{subhalo}'
           f'/cutout.hdf5?gas={fields}')
    req = urllib.request.Request(url, headers={'api-key': api_key})
    try:
        with urllib.request.urlopen(req, timeout=60) as r, \
                open(out_path, 'wb') as fh:
            fh.write(r.read())
    except OSError as e:
        raise RuntimeError(
            f'TNG-API cutout download failed ({e}); this environment may '
            'have no network access -- download the cutout elsewhere and '
            'pass the local file instead') from e
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('snapshot', nargs='?', default=None,
                    help='local snapshot/cutout HDF5 (omit with --cutout)')
    ap.add_argument('--out', default='generic_amr.h5')
    ap.add_argument('--center', type=float, nargs=3, default=None)
    ap.add_argument('--size', type=float, default=None)
    ap.add_argument('--nmax', type=int, default=8)
    ap.add_argument('--max-level', type=int, default=12)
    ap.add_argument('--sfr-temperature', type=float, default=1000.0)
    ap.add_argument('--resample', choices=('nearest', 'kernel'),
                    default='nearest',
                    help='leaf assignment: nearest gas cell, or adaptive '
                         'Gaussian-kernel deposition (mass-conserving)')
    ap.add_argument('--kernel-scale', type=float, default=1.0)
    ap.add_argument('--cutout', nargs=3, metavar=('SIM', 'SNAP', 'SUBHALO'),
                    default=None,
                    help='fetch a TNG-API cutout (needs --api-key + network)')
    ap.add_argument('--api-key', default=None)
    a = ap.parse_args(argv)
    snap = a.snapshot
    if a.cutout is not None:
        if not a.api_key:
            ap.error('--cutout requires --api-key')
        snap = fetch_tng_cutout(a.cutout[0], int(a.cutout[1]),
                                int(a.cutout[2]), a.api_key)
    if snap is None:
        ap.error('give a local snapshot file or --cutout')
    data = convert(snap, center=a.center, size=a.size, nmax=a.nmax,
                   max_level=a.max_level, sfr_temperature=a.sfr_temperature,
                   resample=a.resample, kernel_scale=a.kernel_scale)
    from ..grid.amr import write_generic_amr
    write_generic_amr(a.out, data)
    print(f"wrote {a.out}: {len(data['x'])} leaves, "
          f"boxlen {data['boxlen']:.6g} kpc")
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
