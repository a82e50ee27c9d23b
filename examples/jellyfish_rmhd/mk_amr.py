"""Synthesize a small jellyfish-galaxy-like generic-AMR file with native
physics columns (reference: examples/jellyfish_rmhd/ reads an RMHD
simulation region converted with --compute-physics; the converter output
carries xHI, n_e, ndust and emissivity columns which
ionization_model='from_file' / emissivity_model='from_file' use directly,
grid_mod_amr.f90:226-240).

Builds a 4 "kpc" box: an exponential gas disk plus a ram-pressure-
stripped tail, refined two levels where the density is high, written as
jellyfish_galaxy.h5 in the generic-AMR schema (x/y/z/level/nH/T/v* +
optional physics columns, README_HOWTO.md:448-469)."""
import math
import os

import numpy as np

from lart_tpu.grid.amr import write_generic_amr

HERE = os.path.dirname(os.path.abspath(__file__))


def density(x, y, z):
    """Disk + stripped tail, arbitrary units."""
    r = np.sqrt(x ** 2 + y ** 2)
    disk = np.exp(-r / 0.8) * np.exp(-np.abs(z) / 0.15)
    tail = (0.15 * np.exp(-((x / 0.5) ** 2 + (z / 0.4) ** 2))
            * np.exp(-np.maximum(-y, 0) / 2.0) * (y < 0.2)
            * (1.0 + 0.5 * np.cos(7.0 * y) * np.cos(5.0 * x)))
    return disk + tail + 1e-4


def main(base=16, levels_extra=2, boxsize=4.0):
    lev0 = int(round(math.log2(base)))
    h0 = boxsize / base
    # (x, y, z, level) leaf list: refine dense cells, level by level
    xs = (np.arange(base) + 0.5) * h0 - boxsize / 2
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing='ij')
    cells = np.stack([X.ravel(), Y.ravel(), Z.ravel(),
                      np.full(base ** 3, lev0, float)], axis=1)
    for lev in range(lev0, lev0 + levels_extra):
        h = boxsize / 2.0 ** lev
        at = cells[:, 3] == lev
        rho = density(cells[:, 0], cells[:, 1], cells[:, 2])
        split = at & (rho > 0.3 * 2.0 ** (lev - lev0))
        keep = cells[~split]
        parents = cells[split]
        kids = []
        for di, dj, dk in np.ndindex(2, 2, 2):
            off = (np.array([di, dj, dk]) - 0.5) * h / 2
            k = parents.copy()
            k[:, :3] += off
            k[:, 3] += 1
            kids.append(k)
        cells = np.concatenate([keep] + kids) if len(parents) else keep

    x, y, z, lev = cells.T
    nH = density(x, y, z)
    T = np.where(nH > 0.3, 8.0e3, 3.0e5)           # warm disk, hot halo
    xHI = np.where(nH > 0.3, 0.9, 1e-4)            # native neutral fraction
    n_e = nH * (1.0 - xHI) * 1.2
    ndust = 6.0e-3 * nH * xHI                      # dust traces neutrals
    emiss = n_e * nH * (1.0 - xHI) * 4.1e-25       # ~ alpha_B n_e n_p
    vy = np.where(y < 0, -80.0 * np.exp(np.minimum(y, 0)), 10.0 * y)

    path = os.path.join(HERE, 'jellyfish_galaxy.h5')
    write_generic_amr(path, {
        'x': x, 'y': y, 'z': z, 'level': lev.astype(np.int32),
        'nH': nH, 'T': T,
        'vx': np.zeros_like(nH), 'vy': vy, 'vz': np.zeros_like(nH),
        'xHI': xHI, 'n_e': n_e, 'ndust': ndust, 'emissivity': emiss,
        'boxlen': boxsize,
        'origin': (-boxsize / 2, -boxsize / 2, -boxsize / 2)})
    print(f'{path}: {len(x)} leaves, levels '
          f'{int(lev.min())}..{int(lev.max())}')


if __name__ == '__main__':
    main()
