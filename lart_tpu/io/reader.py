"""Output reader: the analogue of the reference's python/read_lart.py.

Reads LaRT-schema HDF5 outputs (written by this framework or by the
reference Fortran code) into a simple object with the same field names the
reference reader exposes (reference: python/read_lart.py:54-400).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import h5py


@dataclasses.dataclass
class LartOutput:
    filename: str
    header: Dict
    xfreq: np.ndarray
    velocity: np.ndarray
    wavelength: np.ndarray
    Jout: np.ndarray
    Jin: Optional[np.ndarray] = None
    Jabs: Optional[np.ndarray] = None
    sections: Optional[Dict] = None

    @property
    def nphotons(self):
        return self.header.get('nphotons')

    @property
    def nscatt_tot(self):
        return self.header.get('Nsc_tot')

    def summary(self) -> str:
        h = self.header
        lines = [f"file      : {self.filename}",
                 f"nphotons  : {h.get('nphotons'):.4g}",
                 f"taumax    : {h.get('taumax'):.4g}",
                 f"temp      : {h.get('temp'):.4g} K",
                 f"<N_scatt> : {h.get('Nsc_tot'):.5g}",
                 f"exetime   : {h.get('ExeTime'):.3f} min"]
        return "\n".join(lines)


def read_3d_any(path: str) -> np.ndarray:
    """Read a 3-D array from HDF5 (first dataset) or FITS (primary HDU)
    (read_3D, reference src/read_grid_data.f90:21-140)."""
    ext = path.rsplit('.', 1)[-1].lower()
    if ext in ('h5', 'hdf5'):
        with h5py.File(path, 'r') as f:
            def first_dataset(g):
                for k in g:
                    if isinstance(g[k], h5py.Dataset):
                        return np.asarray(g[k], np.float64)
                    got = first_dataset(g[k])
                    if got is not None:
                        return got
                return None
            arr = first_dataset(f)
            if arr is None:
                raise ValueError(f'no dataset found in {path}')
            # HDF5 is row-major (z,y,x) in the LaRT convention -> (x,y,z)
            return np.ascontiguousarray(arr.T)
    from astropy.io import fits
    with fits.open(path) as hd:
        return np.ascontiguousarray(np.asarray(hd[0].data, np.float64).T)


def read_velocity_any(path: str) -> np.ndarray:
    """Read a 3-component velocity cube -> (nx, ny, nz, 3) [km/s]
    (read_velocity, reference src/read_grid_data.f90:142-244; on-disk
    layout is (nz, ny, nx, 3) for FITS written the reference way)."""
    ext = path.rsplit('.', 1)[-1].lower()
    if ext in ('h5', 'hdf5'):
        with h5py.File(path, 'r') as f:
            for k in f:
                if isinstance(f[k], h5py.Dataset) and f[k].ndim == 4:
                    arr = np.asarray(f[k], np.float64)
                    break
            else:
                raise ValueError(f'no 4-D dataset in {path}')
    else:
        from astropy.io import fits
        with fits.open(path) as hd:
            arr = np.asarray(hd[0].data, np.float64)
    if arr.ndim != 4:
        raise ValueError(f'{path}: expected 4-D velocity, got {arr.shape}')
    # (nz, ny, nx, 3) -> (nx, ny, nz, 3); component axis stays last
    if arr.shape[-1] == 3:
        return np.ascontiguousarray(np.transpose(arr, (2, 1, 0, 3)))
    if arr.shape[0] == 3:          # (3, nz, ny, nx) alternative layout
        return np.ascontiguousarray(np.transpose(arr, (3, 2, 1, 0)))
    raise ValueError(f'{path}: no length-3 component axis in {arr.shape}')


def read_lart(path: str) -> LartOutput:
    from .iofile import open_read
    with open_read(path) as f:
        g = f['Spectrum']
        header = {k: (v.item() if hasattr(v, 'item') else v)
                  for k, v in g.attrs.items()}
        out = LartOutput(
            filename=path, header=header,
            xfreq=np.asarray(g['Xfreq'], np.float64),
            velocity=np.asarray(g['velocity'], np.float64),
            wavelength=np.asarray(g['wavelength'], np.float64),
            Jout=np.asarray(g['Jout'], np.float64),
            Jin=np.asarray(g['Jin'], np.float64) if 'Jin' in g else None,
            Jabs=np.asarray(g['Jabs'], np.float64) if 'Jabs' in g else None,
            sections={name: {k: (v.item() if hasattr(v, 'item') else v)
                             for k, v in f[name].attrs.items()}
                      for name in f.keys()},
        )
    return out
