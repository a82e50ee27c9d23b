"""Clump population generator (the reference make_clumps.x,
src/make_clumps.f90:1-1274 and python/make_clumps.py): builds an RSA (or
overlapping) spherical clump population with optional radial profiles and
saves it to a clump file loadable via par%clump_input_file.

usage: python -m lart_tpu.tools.make_clumps out_clumps.h5 \
           [--rmax 1.0] [--rmin 0] [--radius 0.05] [--n 0] [--f-vol 0] \
           [--f-cov 0] [--tau0 1.0] [--sigma-v 0] [--seed 1234] \
           [--allow-overlap] [--radius-profile constant --radius-alpha 0 ...]
"""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('output')
    ap.add_argument('--rmax', type=float, default=1.0)
    ap.add_argument('--rmin', type=float, default=0.0)
    ap.add_argument('--radius', type=float, default=0.05)
    ap.add_argument('--n', type=float, default=0)
    ap.add_argument('--f-vol', type=float, default=0)
    ap.add_argument('--f-cov', type=float, default=0)
    ap.add_argument('--tau0', type=float, default=1.0)
    ap.add_argument('--temperature', type=float, default=1e4)
    ap.add_argument('--sigma-v', type=float, default=0.0)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('--allow-overlap', action='store_true')
    ap.add_argument('--not-fully-inside', action='store_true')
    for what in ('radius', 'density', 'number'):
        ap.add_argument(f'--{what}-profile', default='constant')
        ap.add_argument(f'--{what}-alpha', type=float, default=0.0)
        ap.add_argument(f'--{what}-r0', type=float, default=0.0)
    a = ap.parse_args(argv)

    from ..config import Params
    from ..grid.clump import build_clumps, save_clumps
    par = Params(
        use_clump_medium=True, geometry='sphere',
        rmax=a.rmax, rmin=a.rmin, xmax=a.rmax, ymax=a.rmax, zmax=a.rmax,
        clump_radius=a.radius, clump_N_clumps=a.n, clump_f_vol=a.f_vol,
        clump_f_cov=a.f_cov, clump_tau0=a.tau0,
        clump_temperature=a.temperature, clump_sigma_v=a.sigma_v,
        clump_allow_overlap=a.allow_overlap,
        clump_fully_inside=not a.not_fully_inside,
        clump_radius_profile=a.radius_profile,
        clump_radius_alpha=a.radius_alpha, clump_radius_r0=a.radius_r0,
        clump_density_profile=a.density_profile,
        clump_density_alpha=a.density_alpha, clump_density_r0=a.density_r0,
        clump_number_profile=a.number_profile,
        clump_number_alpha=a.number_alpha, clump_number_r0=a.number_r0)
    cfg = par.resolve()
    meta, cmeta, dev = build_clumps(cfg, seed=a.seed)
    pos = np.stack([np.asarray(dev.x), np.asarray(dev.y),
                    np.asarray(dev.z)], axis=1)
    vel = np.stack([np.asarray(dev.vx), np.asarray(dev.vy),
                    np.asarray(dev.vz)], axis=1)
    save_clumps(a.output, pos, np.asarray(dev.radius),
                rhokap=np.asarray(dev.rhokap), vel=vel,
                T=a.temperature, sphere_R=a.rmax, rmin=a.rmin,
                attrs={'F_VOL': cmeta.f_vol, 'F_COV': cmeta.f_cov,
                       'TAU0': a.tau0})
    print(f"wrote {a.output}: {cmeta.n_clumps} clumps, "
          f"f_vol={cmeta.f_vol:.4g}, f_cov={cmeta.f_cov:.4g}")
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
