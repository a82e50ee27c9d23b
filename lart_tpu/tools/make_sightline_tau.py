"""Standalone sightline tau/N-map calculator (the reference
make_sightline_tau.x, src/make_sightline_tau.f90:1-77): builds the grid and
observers from a namelist and writes only the _tau maps, without running
any transport.

usage: python -m lart_tpu.tools.make_sightline_tau input.in [out_tau.h5]
"""

import dataclasses
import os
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    from ..config import Params
    from ..grid.cartesian import build_cartesian
    from ..instruments.observer import build_observers
    from ..instruments.sightline import make_sightline, write_sightline_tau

    par = Params.from_namelist(argv[0])
    par.save_peeloff = True            # observers are needed for geometry
    par.save_sightline_tau = True
    cfg = par.resolve()
    meta, grid = build_cartesian(cfg)
    obs_meta, odev = build_observers(cfg)
    sl = make_sightline(cfg, meta, obs_meta)

    base = argv[0]
    for ext in ('.in', '.txt'):
        if base.endswith(ext):
            base = base[:-len(ext)]
    out = argv[1] if len(argv) > 1 else base + '_tau.h5'

    for i in range(obs_meta.nobs):
        maps = sl(grid, odev, i)
        suffix = '' if obs_meta.nobs == 1 else f'_{i + 1:03d}'
        root, ext = os.path.splitext(out)
        fn = write_sightline_tau(f'{root}{suffix}{ext}', maps, cfg, meta,
                                 obs_meta)
        print(f"wrote {fn}")
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
