"""Tally normalization and result container.

Reproduces output_normalize (reference: src/output_sum_rect.f90:151-290):
per-photon, per-bin, per-steradian, per-area normalizations for slab vs
sphere/box geometries, continuum normalization, and the nscatt averages that
become output header keywords.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .config import ResolvedConfig
from .constants import FOURPI, SPEEDC, TWOPI
from .grid.cartesian import GridMeta


@dataclasses.dataclass
class RunResult:
    cfg: ResolvedConfig
    meta: GridMeta
    nphotons: int
    xfreq: np.ndarray
    velocity: np.ndarray
    wavelength: np.ndarray
    Jin: Optional[np.ndarray]
    Jout: np.ndarray
    Jabs: Optional[np.ndarray]
    nscatt_gas: float          # mean scatterings per photon
    nscatt_dust: float
    nscatt_tot: float
    exetime_s: float = 0.0
    nrejected: float = 0.0
    # peel cubes: dict name -> (nobs, nxfreq, nxim, nyim) arrays, normalized
    peel: Optional[dict] = None
    obs_meta: object = None

    @property
    def line(self):
        return self.cfg.line


def spectral_axes(cfg: ResolvedConfig, meta: GridMeta):
    """Bin-center axes (car_setup_freq_grid, grid_mod_car.f90:1505-1512)."""
    i = np.arange(meta.nxfreq)
    xfreq = (i + 0.5) * meta.dxfreq + meta.xfreq_min
    velocity = -cfg.vtherm * xfreq
    wavelength = (velocity / SPEEDC + 1.0) * (cfg.line.wavelength0 * 1e4)
    return xfreq, velocity, wavelength


def normalize(cfg: ResolvedConfig, meta: GridMeta, raw: dict,
              nphotons: int, exetime_s: float = 0.0,
              obs_meta=None) -> RunResult:
    """raw: dict with f64 arrays Jin/Jout/Jabs and scalars nscatt_*."""
    par = cfg.par
    xfreq, velocity, wavelength = spectral_axes(cfg, meta)

    bin_unit = meta.dwave if par.intensity_unit == 1 else meta.dxfreq
    distance2cm = par.distance2cm if par.distance2cm > 0.0 else 1.0

    if par.xy_periodic:
        # slab: unit luminosity spread over 2 faces x 2pi sr
        denom = nphotons * bin_unit * TWOPI * 2.0
    else:
        if par.geometry.strip().lower() == 'sphere':
            area = FOURPI * par.rmax ** 2 * distance2cm ** 2
        else:
            area = (meta.xmax * meta.ymax + meta.ymax * meta.zmax
                    + meta.zmax * meta.xmax) * 8.0 * distance2cm ** 2
        denom = nphotons * bin_unit * TWOPI * area

    Jout = raw['Jout'] / denom
    Jin = raw.get('Jin')
    Jin = Jin / denom if Jin is not None else None
    Jabs = raw.get('Jabs')
    Jabs = Jabs / denom if (Jabs is not None and par.DGR > 0.0
                            and par.save_Jabs) else None

    if (par.spectral_type.strip() in ('continuum', 'continuum+gaussian')
            and par.continuum_normalize and Jin is not None):
        if 0.0 < par.f_line < 1.0:
            scale = Jin.mean() * (1.0 - par.f_line)
        else:
            scale = Jin.mean()
        if scale > 0:
            Jout = Jout / scale
            Jin = Jin / scale
            if Jabs is not None:
                Jabs = Jabs / scale

    # peel-off cube normalization (output_sum_rect.f90:427-450):
    # scale = nphotons * steradian_pix * bin_unit * distance2cm^2
    peel = None
    if obs_meta is not None and 'peel_scatt' in raw:
        shape = (obs_meta.nobs, meta.nxfreq, obs_meta.nxim, obs_meta.nyim)
        scale = (nphotons * obs_meta.steradian_pix * bin_unit
                 * distance2cm ** 2)
        peel = {k[5:]: raw[k].reshape(shape) / scale
                for k in raw if k.startswith('peel_')}

    return RunResult(
        cfg=cfg, meta=meta, nphotons=nphotons,
        xfreq=xfreq, velocity=velocity, wavelength=wavelength,
        Jin=Jin, Jout=Jout, Jabs=Jabs,
        nscatt_gas=raw['nscatt_gas'] / nphotons,
        nscatt_dust=raw['nscatt_dust'] / nphotons,
        nscatt_tot=(raw['nscatt_gas'] + raw['nscatt_dust']) / nphotons,
        exetime_s=exetime_s, peel=peel, obs_meta=obs_meta)
