"""Analytic AMR sphere generator (the reference make_amr_sphere_radial.x,
src/make_amr_sphere_radial.f90:1-635): uniform base grid, optional extra
refinement inside a radius, radial power-law density profile; writes a
generic-AMR HDF5 file.

usage: python -m lart_tpu.tools.make_amr_sphere_radial out.h5 \
           [--n-base 16] [--levels 1] [--rmax 1.0] [--T 1e4] [--nH 1.0] \
           [--alpha 0] [--refine-r 0.5]
"""

import argparse

import numpy as np

from ..grid.amr import make_amr_sphere, write_generic_amr


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('output')
    ap.add_argument('--n-base', type=int, default=16)
    ap.add_argument('--levels', type=int, default=1)
    ap.add_argument('--rmax', type=float, default=1.0)
    ap.add_argument('--T', type=float, default=1e4)
    ap.add_argument('--nH', type=float, default=1.0)
    ap.add_argument('--alpha', type=float, default=0.0,
                    help='density power-law slope: nH(r) = nH (r/rmax)^-alpha')
    ap.add_argument('--refine-r', type=float, default=0.5)
    a = ap.parse_args(argv)
    data = make_amr_sphere(n_base=a.n_base, levels_extra=a.levels,
                           rmax=a.rmax, T=a.T, nH0=a.nH,
                           refine_r=a.refine_r)
    if a.alpha != 0.0:
        rr = np.sqrt(data['x'] ** 2 + data['y'] ** 2 + data['z'] ** 2)
        with np.errstate(divide='ignore'):
            data['nH'] = data['nH'] * np.where(
                rr > 0, (np.maximum(rr, 1e-300) / a.rmax) ** (-a.alpha), 1.0)
    write_generic_amr(a.output, data)
    print(f"wrote {a.output}: {len(data['x'])} leaves, "
          f"boxlen {data['boxlen']}")
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
