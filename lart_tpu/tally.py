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
    # unweighted resonance-scatter events per photon (the counting the
    # reference's 2022-2024 committed example logs used; the modern code
    # counts weight -- see Tallies.nscatt_events in transport/engine.py)
    nscatt_events: float = 0.0
    # escape weight per photon whose lab-frame frequency fell outside the
    # xfreq grid (dropped from Jout, exactly as in the reference
    # raytrace_car.f90:1613-1637): W_escape + W_absorb + W_oor closes the
    # conservation budget under strong velocity fields
    W_oor: float = 0.0
    # peel cubes: dict name -> (nobs, nxfreq, nxim, nyim) arrays, normalized
    peel: Optional[dict] = None
    obs_meta: object = None
    Jmu: Optional[np.ndarray] = None       # (nxfreq, nmu)
    W_H2abs: float = 0.0                   # per photon
    W_H2scat: float = 0.0
    W_H2pump: Optional[np.ndarray] = None
    Jout_Ha: Optional[np.ndarray] = None   # band-2 escaped spectrum
    Jabs_Ha: Optional[np.ndarray] = None
    J2gam: Optional[np.ndarray] = None     # analytic two-photon spectrum
    y_2gam: Optional[np.ndarray] = None
    W_conv: float = 0.0
    W_esc1: float = 0.0
    W_abs1: float = 0.0
    W_esc2: float = 0.0
    W_abs2: float = 0.0
    J1: Optional[np.ndarray] = None        # (nxfreq, nbin) mean intensity
    Pa: Optional[np.ndarray] = None        # (nbin,) scattering rate per atom
    Pnew: Optional[np.ndarray] = None      # (nbin,)
    r_JPa: Optional[np.ndarray] = None     # bin-center coordinate
    Jabs2: object = None                   # exoplanet molecular-zone losses
    flux_factor: float = 0.0               # transit flux factor
    allph: Optional[dict] = None           # per-photon table (save_all_photons)
    # sight-line tau/column maps: list per observer of dicts
    # {'tau_gas','N_gas','tau_dust'} (make_sightline_tau)
    sightline: Optional[list] = None
    # raw (pre-normalization) weight fractions: escaped / dust-absorbed
    # photon weight per launched photon.  The normalized Jout carries a
    # geometry-dependent luminosity/area denominator (slab 2 faces x 2pi,
    # sphere 2pi x 4pi r^2 ...; output_sum_rect.f90), so conservation
    # checks must use THESE, not integrate the normalized spectrum.
    W_escape: float = 0.0
    W_absorb: float = 0.0

    @property
    def line(self):
        return self.cfg.line


def twophoton_dAdy(y):
    """Nussbaumer & Schmutz (1984) two-photon decay spectrum fit
    (twophoton_dAdy, line_mod.f90:1274-1294)."""
    y = np.asarray(y, np.float64)
    w = y * (1.0 - y)
    out = np.zeros_like(w)
    pos = w > 0
    w4 = (4.0 * w[pos]) ** 0.8
    out[pos] = 202.0 * (w[pos] * (1.0 - w4)
                        + 0.88 * w[pos] ** 1.53 * w4)
    return out


def _jpa_counts(cfg: ResolvedConfig, meta: GridMeta):
    """Cells per CALCJ/P bin + bin-center coordinates (ncount_sph/
    ncount_plane, grid_mod_car.f90:1300-1440)."""
    par = cfg.par
    g = meta.geometry_JPa
    if g == -1:
        z = meta.zmin + (np.arange(meta.nz) + 0.5) * meta.dz
        return np.full(meta.nz, meta.nx * meta.ny, np.float64), z
    if g == 1:
        xs = meta.xmin + (np.arange(meta.nx) + 0.5) * meta.dx
        ys = meta.ymin + (np.arange(meta.ny) + 0.5) * meta.dy
        zs = meta.zmin + (np.arange(meta.nz) + 0.5) * meta.dz
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing='ij')
        rr = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
        ib = np.floor((rr - meta.roff_JPa) / meta.dr_JPa).astype(int)
        sel = (ib >= 0) & (ib < meta.nbin_JPa)
        ncount = np.bincount(ib[sel], minlength=meta.nbin_JPa
                             ).astype(np.float64)[:meta.nbin_JPa]
        r = meta.roff_JPa + (np.arange(meta.nbin_JPa) + 0.5) * meta.dr_JPa
        return ncount, r
    if g == 3:
        return np.ones(meta.nbin_JPa, np.float64), \
            np.arange(meta.nbin_JPa, dtype=np.float64)
    return np.ones(max(meta.nbin_JPa, 1), np.float64), \
        np.arange(max(meta.nbin_JPa, 1), dtype=np.float64)


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
    Jabs2 = raw.get('Jabs2')
    Jabs2 = Jabs2 / denom if Jabs2 is not None else None
    flux_factor = 0.0
    if 'flux_factor' in raw:
        # transit flux factor = sum(flux_factor)/(nphotons + nrejected)
        # (output_sum_rect.f90:17-18)
        flux_factor = raw['flux_factor'] / (nphotons
                                            + raw.get('nrejected', 0.0))

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

    # Jmu: each mu bin normalized to equal Jout for a homogeneous isotropic
    # field (output_sum_rect.f90:188-190)
    Jmu = None
    if 'Jmu' in raw:
        Jmu = raw['Jmu'].reshape(meta.nxfreq, par.nmu) * par.nmu / denom
        if (par.spectral_type.strip() in ('continuum', 'continuum+gaussian')
                and par.continuum_normalize and Jin is not None):
            pass  # scale folded into Jin-based scale above when applicable

    # ly_beta analytic two-photon spectrum (write_output_rect.f90:84-111):
    # J2gam(y) = 2 * W_conv_per_photon * P(y), Nussbaumer & Schmutz fit
    J2gam = y_2gam = None
    if 'W_conv' in raw and par.ny_2gam > 0:
        y_2gam = (np.arange(par.ny_2gam) + 0.5) / par.ny_2gam
        yy = np.linspace(0.0, 1.0, 10001)
        A = np.trapezoid(twophoton_dAdy(yy), yy)
        J2gam = 2.0 * (raw['W_conv'] / nphotons) \
            * twophoton_dAdy(y_2gam) / A

    # CALCJ/P normalization (output_sum_rect.f90:300-345): dVol = cell
    # volume; per-bin cell counts; slab uses the area factor
    J1 = Pa = Pnew = r_JPa = None
    if meta.nbin_JPa and any(k in raw for k in ('J1', 'Pa', 'Pnew')):
        dVol = meta.dx * meta.dy * meta.dz * distance2cm ** 2
        ncount, r_JPa = _jpa_counts(cfg, meta)
        if par.xy_periodic:
            areaJ = meta.xrange * meta.yrange * distance2cm ** 2
            facJ = areaJ / (FOURPI * dVol * nphotons * bin_unit)
            facP = areaJ / (dVol * nphotons)
        else:
            facJ = 1.0 / (FOURPI * dVol * nphotons * bin_unit)
            facP = 1.0 / (dVol * nphotons)
        nc = np.maximum(ncount, 1)
        if 'J1' in raw:
            J1 = raw['J1'].reshape(meta.nxfreq, meta.nbin_JPa) / nc * facJ
        if 'Pa' in raw:
            Pa = raw['Pa'] / nc * facP
        if 'Pnew' in raw:
            Pnew = raw['Pnew'] / nc * facP

    return RunResult(
        cfg=cfg, meta=meta, nphotons=nphotons,
        xfreq=xfreq, velocity=velocity, wavelength=wavelength,
        Jin=Jin, Jout=Jout, Jabs=Jabs,
        nscatt_gas=raw['nscatt_gas'] / nphotons,
        nscatt_dust=raw['nscatt_dust'] / nphotons,
        nscatt_tot=(raw['nscatt_gas'] + raw['nscatt_dust']) / nphotons,
        nscatt_events=raw.get('nscatt_events', 0.0) / nphotons,
        W_oor=raw.get('W_oor', 0.0) / nphotons,
        exetime_s=exetime_s, peel=peel, obs_meta=obs_meta, Jmu=Jmu,
        Jabs2=Jabs2, flux_factor=flux_factor,
        nrejected=raw.get('nrejected', 0.0),
        allph=raw.get('allph'),
        J1=J1, Pa=Pa, Pnew=Pnew, r_JPa=r_JPa,
        Jout_Ha=(raw['Jout_Ha'] / denom if 'Jout_Ha' in raw else None),
        Jabs_Ha=(raw['Jabs_Ha'] / denom if 'Jabs_Ha' in raw else None),
        J2gam=J2gam, y_2gam=y_2gam,
        W_conv=raw.get('W_conv', 0.0) / nphotons,
        W_esc1=raw.get('W_esc1', 0.0) / nphotons,
        W_abs1=raw.get('W_abs1', 0.0) / nphotons,
        W_esc2=raw.get('W_esc2', 0.0) / nphotons,
        W_abs2=raw.get('W_abs2', 0.0) / nphotons,
        W_H2abs=raw.get('W_H2abs', 0.0) / nphotons,
        W_H2scat=raw.get('W_H2scat', 0.0) / nphotons,
        W_H2pump=(raw['W_H2pump'] / nphotons
                  if 'W_H2pump' in raw else None),
        W_escape=float(np.sum(raw['Jout'])) / nphotons,
        W_absorb=float(np.sum(raw.get('Jabs', 0.0))) / nphotons)
