"""Generic-AMR file preprocessing: region / subset / recenter.

The reference preprocesses huge simulation-derived generic-AMR files with
three standalone scripts (reference python/AMR_grid/extract_amr_region.py,
extract_amr_subset.py, recenter_amr.py); this module is the TPU
framework's equivalent, one library with three CLI entry points
(python -m lart_tpu.tools.amr_preprocess {region,subset,recenter} ...).

Semantics mirrored from the reference:

* ``region``   — drop cells outside a box while PRESERVING the input
  BOXLEN/ORIGIN.  The octree builder assumes cell centers sit on the
  dyadic natural grid of the original box (cx = origin +
  (2k+1)*boxlen/2^(L+1)); shrinking the box would move the grid off the
  data and break point->leaf descent.  The emptied space is walked by
  the gap-cell logic.  (extract_amr_region.py:1-35)
* ``subset``   — carve a CUBIC sub-region and re-write it as a new,
  centered box: BOXLEN = cube side, ORIGIN = -boxlen/2, coordinates
  shifted so the cube center lands at the origin (the convention the
  Cartesian grid and the default point source use).
  (extract_amr_subset.py:1-40)
* ``recenter`` — shift coordinates + ORIGIN so the existing box is
  centered on the origin; BOXLEN preserved, row order preserved.
  (recenter_amr.py:1-30)

Both HDF5 (.h5/.hdf5) and FITS (.fits/.fits.gz, via the native codec)
files are supported; all optional physics columns are carried through.
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Iterable, Optional, Tuple

import numpy as np

COLUMNS = ('x', 'y', 'z', 'level', 'nH', 'T', 'vx', 'vy', 'vz',
           'metallicity', 'xHI', 'n_e', 'n_ion', 'emissivity', 'ndust')


# --------------------------------------------------------------------------
# format-agnostic read/write (HDF5 via grid.amr, FITS via io.minifits)
# --------------------------------------------------------------------------

def _is_fits(path: str) -> bool:
    p = path.lower()
    return p.endswith('.fits') or p.endswith('.fits.gz')


def read_amr_table(path: str) -> dict:
    """Columns + boxlen/origin from a generic AMR file of either format."""
    if not _is_fits(path):
        from ..grid.amr import read_generic_amr
        return read_generic_amr(path)
    from ..io.minifits import read_hdus
    hdus = read_hdus(path)
    out = {}
    hdr = dict(hdus[0].header)
    for h in hdus:
        if isinstance(h.data, dict):
            cols = {k.lower(): np.asarray(v) for k, v in h.data.items()}
            for name in COLUMNS:
                if name.lower() in cols:
                    out[name] = cols[name.lower()]
            hdr.update(h.header)
            break
    if 'x' not in out:
        raise ValueError(f'{path}: no AMR leaf table found')
    out['boxlen'] = float(hdr.get('BOXLEN', 0.0))
    if out['boxlen'] <= 0:
        ext = max(out['x'].max() - out['x'].min(),
                  out['y'].max() - out['y'].min(),
                  out['z'].max() - out['z'].min())
        out['boxlen'] = float(ext) * (1 + 1e-9)
    out['origin'] = tuple(float(hdr.get(f'ORIGIN{ax}',
                                        -0.5 * out['boxlen']))
                          for ax in 'XYZ')
    return out


def write_amr_table(path: str, data: dict) -> str:
    if not _is_fits(path):
        from ..grid.amr import write_generic_amr
        return write_generic_amr(path, data)
    from ..io.minifits import HDU, write_hdus
    cols = {name: np.asarray(data[name]) for name in COLUMNS
            if name in data}
    ox, oy, oz = data.get('origin', (-0.5 * data['boxlen'],) * 3)
    hdr = {'EXTNAME': 'AMR', 'BOXLEN': float(data['boxlen']),
           'ORIGINX': float(ox), 'ORIGINY': float(oy),
           'ORIGINZ': float(oz)}
    write_hdus(path, [HDU({}), HDU(hdr, cols)])
    return path


# --------------------------------------------------------------------------
# the three operations
# --------------------------------------------------------------------------

def _bounds_from_args(args) -> Tuple[float, ...]:
    if args.center is not None:
        if args.size is None:
            raise SystemExit('--center requires --size')
        cx, cy, cz = args.center
        h = args.size / 2.0
        return (cx - h, cx + h, cy - h, cy + h, cz - h, cz + h)
    b = (args.xmin, args.xmax, args.ymin, args.ymax, args.zmin, args.zmax)
    if any(v is None for v in b):
        raise SystemExit('give either --center+--size or all six '
                         '--xmin/--xmax/--ymin/--ymax/--zmin/--zmax')
    return b


def _select(data: dict, bounds) -> dict:
    xmn, xmx, ymn, ymx, zmn, zmx = bounds
    keep = ((data['x'] >= xmn) & (data['x'] <= xmx)
            & (data['y'] >= ymn) & (data['y'] <= ymx)
            & (data['z'] >= zmn) & (data['z'] <= zmx))
    out = {k: (np.asarray(v)[keep] if k in COLUMNS else v)
           for k, v in data.items()}
    out['_kept'] = int(keep.sum())
    out['_total'] = int(keep.size)
    return out


def extract_region(input_path: str, output_path: str, bounds,
                   recenter: bool = False) -> dict:
    """Keep cells inside ``bounds`` at their original coordinates;
    BOXLEN/ORIGIN preserved (sparse box, gap cells walk the void)."""
    data = read_amr_table(input_path)
    out = _select(data, bounds)
    if out['_kept'] == 0:
        raise SystemExit('no cells inside the requested region')
    if recenter:
        # only a rigid half-box shift (stays on the natural dyadic grid)
        ox, oy, oz = out['origin']
        bl = out['boxlen']
        shift = (ox + bl / 2.0, oy + bl / 2.0, oz + bl / 2.0)
        for ax, s in zip('xyz', shift):
            out[ax] = out[ax] - s
        out['origin'] = (-bl / 2.0,) * 3
    write_amr_table(output_path, out)
    print(f'region: kept {out["_kept"]}/{out["_total"]} cells -> '
          f'{output_path} (BOXLEN {out["boxlen"]:g} preserved)')
    return out


def extract_subset(input_path: str, output_path: str, bounds) -> dict:
    """Carve a cubic sub-region and re-write as a new centered box."""
    xmn, xmx, ymn, ymx, zmn, zmx = bounds
    sx, sy, sz = xmx - xmn, ymx - ymn, zmx - zmn
    if not (np.isclose(sx, sy) and np.isclose(sy, sz)):
        raise SystemExit(f'subset region must be cubic, got '
                         f'{sx:g} x {sy:g} x {sz:g}')
    data = read_amr_table(input_path)
    out = _select(data, bounds)
    if out['_kept'] == 0:
        raise SystemExit('no cells inside the requested region')
    # shift cube center -> origin; new centered box
    cx, cy, cz = (xmn + xmx) / 2.0, (ymn + ymx) / 2.0, (zmn + zmx) / 2.0
    out['x'] = out['x'] - cx
    out['y'] = out['y'] - cy
    out['z'] = out['z'] - cz
    out['boxlen'] = float(sx)
    out['origin'] = (-sx / 2.0,) * 3
    # levels are relative to the ORIGINAL box; re-express against the new
    # boxlen so dx = boxlen_new / 2^level stays true for the octree build
    old_bl = data['boxlen']
    dlev = np.log2(old_bl / sx)
    if 'level' in out and np.isfinite(dlev):
        lv = out['level'].astype(np.float64) - dlev
        if np.allclose(lv, np.round(lv), atol=1e-6):
            out['level'] = np.round(lv).astype(out['level'].dtype)
        else:
            print(f'warning: new boxlen {sx:g} is not a power-of-two '
                  f'fraction of {old_bl:g}; keeping raw levels '
                  '(cell sizes will be inferred from coordinates)',
                  file=sys.stderr)
    write_amr_table(output_path, out)
    print(f'subset: kept {out["_kept"]}/{out["_total"]} cells -> '
          f'{output_path} (new BOXLEN {sx:g}, centered)')
    return out


def recenter(input_path: str, output_path: str,
             mode: str = 'auto', origin: Optional[Tuple] = None,
             boxlen: Optional[float] = None) -> dict:
    """Shift the box so ORIGIN = -BOXLEN/2; row order preserved."""
    data = read_amr_table(input_path)
    bl = float(boxlen if boxlen else data['boxlen'])
    if mode == 'explicit':
        if origin is None:
            raise SystemExit('--mode explicit requires --origin')
        ox, oy, oz = origin
    elif mode == 'data-center':
        ox = 0.5 * (data['x'].min() + data['x'].max()) - bl / 2.0
        oy = 0.5 * (data['y'].min() + data['y'].max()) - bl / 2.0
        oz = 0.5 * (data['z'].min() + data['z'].max()) - bl / 2.0
    else:                       # auto / from-header
        ox, oy, oz = data['origin']
    shift = (ox + bl / 2.0, oy + bl / 2.0, oz + bl / 2.0)
    data['x'] = data['x'] - shift[0]
    data['y'] = data['y'] - shift[1]
    data['z'] = data['z'] - shift[2]
    data['boxlen'] = bl
    data['origin'] = (-bl / 2.0,) * 3
    write_amr_table(output_path, data)
    print(f'recenter: shifted by ({shift[0]:g}, {shift[1]:g}, '
          f'{shift[2]:g}) -> {output_path}')
    return data


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------

def _add_bounds(ap):
    g1 = ap.add_argument_group('explicit bounds')
    for k in ('xmin', 'xmax', 'ymin', 'ymax', 'zmin', 'zmax'):
        g1.add_argument(f'--{k}', type=float)
    g2 = ap.add_argument_group('center + size')
    g2.add_argument('--center', nargs=3, type=float,
                    metavar=('CX', 'CY', 'CZ'))
    g2.add_argument('--size', type=float)


def main(argv: Optional[Iterable[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog='python -m lart_tpu.tools.amr_preprocess',
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest='cmd', required=True)

    ar = sub.add_parser('region', help='filter to a box, BOXLEN preserved')
    ar.add_argument('input')
    ar.add_argument('-o', '--output', required=True)
    _add_bounds(ar)
    ar.add_argument('--recenter', action='store_true',
                    help='also shift ORIGIN to -BOXLEN/2 (rigid shift)')

    as_ = sub.add_parser('subset', help='carve a cube into a new '
                         'centered box')
    as_.add_argument('input')
    as_.add_argument('-o', '--output', required=True)
    _add_bounds(as_)

    rc = sub.add_parser('recenter', help='center the box on the origin')
    rc.add_argument('input')
    rc.add_argument('-o', '--output', required=True)
    rc.add_argument('--mode', choices=('auto', 'data-center',
                                       'from-header', 'explicit'),
                    default='auto')
    rc.add_argument('--origin', nargs=3, type=float,
                    metavar=('OX', 'OY', 'OZ'))
    rc.add_argument('--boxlen', type=float)

    args = ap.parse_args(list(argv) if argv is not None else None)
    if args.cmd == 'region':
        extract_region(args.input, args.output, _bounds_from_args(args),
                       recenter=args.recenter)
    elif args.cmd == 'subset':
        extract_subset(args.input, args.output, _bounds_from_args(args))
    else:
        recenter(args.input, args.output, mode=args.mode,
                 origin=tuple(args.origin) if args.origin else None,
                 boxlen=args.boxlen)
    return 0


if __name__ == '__main__':
    sys.exit(main())
