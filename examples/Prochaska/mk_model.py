#!/usr/bin/env python
"""Build the Prochaska et al. (2011)-style cool-wind density cubes used by
the FeII/MgII inputs in this directory (reference examples/Prochaska/
mk_model.py): an ion number density n(r) = n0 (r_in/r)^2 between r_in and
r_out, fully ionized (zero) inside r_in, written as a FITS primary HDU in
the (nz, ny, nx) on-disk layout the grid reader expects.
"""
import argparse

import numpy as np


def make_dens(fname, n0=0.1, abund=10.0 ** (-5.47), rinner=1.0,
              router=20.0, n=150):
    # the framework's own FITS codec (astropy is not required anywhere)
    from lart_tpu.io.minifits import HDU, write_hdus
    nion0 = abund * n0
    ax = (np.arange(n) + 0.5) / (n / 2.0) * router - router
    X, Y, Zc = np.meshgrid(ax, ax, ax, indexing='ij')
    r = np.sqrt(X * X + Y * Y + Zc * Zc)
    dens = np.zeros((n, n, n), np.float32)
    shell = (r >= rinner) & (r <= router)
    dens[shell] = nion0 * (rinner / r[shell]) ** 2
    # (nx,ny,nz) -> on-disk (nz,ny,nx)
    write_hdus(fname, [HDU(data=dens.T)])
    print(f'wrote {fname}  (n={n}, n_ion0={nion0:.3e})')


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=150,
                    help='grid cells per axis (reference uses 300)')
    args = ap.parse_args()
    # Mg abundance 10^-5.47 (solar, fully in MgII in the cool wind);
    # Fe slightly lower
    make_dens('MgII_a_dens.fits.gz', abund=10.0 ** (-5.47), n=args.n)
    make_dens('FeII_a_dens.fits.gz', abund=10.0 ** (-5.53), n=args.n)
