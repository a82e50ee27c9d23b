"""HDF5 output writer with the reference section schema.

Layout matches lart_io.py's description of what the Fortran iofile_mod
produces (reference: python/lart_io.py:10-30, src/write_output_rect.f90:
424-520): each section is a group in insertion order; table sections store
one dataset per column; keywords are group attributes.  Files written here
are readable by the reference's python/read_lart.py and python/lart_io.py.

Merge mode ("resume"): when out_merge is set and the file exists, spectra
are photon-count-weighted averaged with the previous contents
(reference: src/write_output_rect.f90:74-241).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np
import h5py

from ..tally import RunResult


def _put_attrs(g, kv):
    for k, v in kv.items():
        if v is None:
            continue
        if isinstance(v, bool):
            g.attrs[k] = np.int32(1 if v else 0)
        elif isinstance(v, str):
            g.attrs[k] = v
        elif isinstance(v, int):
            g.attrs[k] = np.int64(v)
        else:
            g.attrs[k] = np.float64(v)


def write_output(filename: str, res: RunResult, nproc: int = 1) -> str:
    """Write (or merge into) the main output; also writes per-observer
    _peel3D files when peeling was enabled (write_output_outside,
    write_output_rect.f90:24-46)."""
    out = _write_basic(filename, res, nproc)
    if res.sightline is not None:
        from ..instruments.sightline import write_sightline_tau
        base, ext = os.path.splitext(filename)
        for k, maps in enumerate(res.sightline):
            suffix = '' if len(res.sightline) == 1 else f'_{k + 1:03d}'
            write_sightline_tau(f'{base}{suffix}_tau{ext}', maps,
                                res.cfg, res.meta, res.obs_meta)
    if res.peel is not None:
        base, ext = os.path.splitext(filename)
        nobs = res.obs_meta.nobs
        for k in range(nobs):
            suffix = '' if nobs == 1 else f'_{k+1:03d}'
            if res.cfg.par.save_peeloff_3D:
                write_output_peeling_3D(f'{base}{suffix}_peel3D{ext}',
                                        res, k)
            if res.cfg.par.save_peeloff_2D:
                write_output_peeling_2D(f'{base}{suffix}_peel2D{ext}',
                                        res, k)
    return out


def write_output_peeling_2D(filename: str, res: RunResult, iobs: int) -> str:
    """Frequency-integrated peel images (write_output_peeling_2D,
    write_output_rect.f90:742-1000; HEALPix 2D maps,
    observer_heal.f90:46-52)."""
    par = res.cfg.par
    meta = res.meta
    obs = res.obs_meta
    bin_unit = meta.dwave if par.intensity_unit == 1 else meta.dxfreq
    bp = np.float32 if par.out_bitpix == -32 else np.float64
    hk = {'nphotons': float(res.nphotons), 'I_unit': par.intensity_unit}
    if getattr(obs, 'inside', False):
        hk.update(PIXTYPE='HEALPIX', ORDERING='RING', NSIDE=obs.nside,
                  NPIX=obs.npix)
    with h5py.File(filename, 'w') as f:
        for name, key in (('Scattered', 'scatt'), ('Direct', 'direc')):
            img = res.peel[key][iobs].sum(axis=0) * bin_unit
            g = f.create_group(name)
            g.create_dataset('data', data=np.asarray(img, bp))
            _put_attrs(g, dict(hk, EXTNAME=name))
        if par.use_stokes and 'I' in res.peel:
            for nm in ('I', 'Q', 'U', 'V'):
                img = res.peel[nm][iobs].sum(axis=0) * bin_unit
                g = f.create_group(f'Stokes_{nm}')
                g.create_dataset('data', data=np.asarray(img, bp))
                _put_attrs(g, dict(hk, EXTNAME=f'Stokes_{nm}'))
    return filename


def _write_basic(filename: str, res: RunResult, nproc: int = 1) -> str:
    par = res.cfg.par
    meta = res.meta

    merged = None
    if par.out_merge and os.path.exists(filename):
        merged = _read_for_merge(filename)
        if par.save_backup:
            shutil.copy2(filename, _backup_name(filename))

    nph = float(res.nphotons)
    exetime_min = res.exetime_s / 60.0
    Jout, Jin, Jabs = res.Jout, res.Jin, res.Jabs
    nsc_gas, nsc_dust = res.nscatt_gas, res.nscatt_dust
    if merged is not None:
        nph1 = merged['nphotons']
        tot = nph1 + nph
        w1, w2 = nph1 / tot, nph / tot
        Jout = merged['Jout'] * w1 + Jout * w2
        if Jin is not None and merged.get('Jin') is not None:
            Jin = merged['Jin'] * w1 + Jin * w2
        if Jabs is not None and merged.get('Jabs') is not None:
            Jabs = merged['Jabs'] * w1 + Jabs * w2
        nsc_gas = merged['Nsc_gas'] * w1 + nsc_gas * w2
        nsc_dust = merged['Nsc_dust'] * w1 + nsc_dust * w2
        exetime_min = exetime_min + merged['ExeTime']
        nph = tot

    with h5py.File(filename, 'w') as f:
        g = f.create_group('Spectrum')
        bp = np.float32 if par.out_bitpix == -32 else np.float64
        g.create_dataset('Xfreq', data=res.xfreq.astype(bp))
        g.create_dataset('velocity', data=res.velocity.astype(bp))
        g.create_dataset('wavelength', data=res.wavelength.astype(np.float64))
        g.create_dataset('Jout', data=np.asarray(Jout, bp))
        if par.save_Jabs and Jabs is not None:
            g.create_dataset('Jabs', data=np.asarray(Jabs, bp))
        if par.save_Jin and Jin is not None:
            g.create_dataset('Jin', data=np.asarray(Jin, bp))
        if res.Jabs2 is not None:
            g.create_dataset('Jabs2', data=np.asarray(res.Jabs2, bp))

        _put_attrs(g, {
            'ExeTime': exetime_min,
            'Nprocs': nproc,
            'recoil': par.recoil,
            'coreskip': par.core_skip,
            'xyz_sym': par.xyz_symmetry,
            'xy_per': par.xy_periodic,
            'save_all': par.save_all,
            'save_Jin': par.save_Jin,
            'save_Jab': par.save_Jabs,
            'nphotons': nph,
            'taumax': meta.taumax,
            'tauhomo': meta.tauhomo,
            'Ngasmax': meta.N_gasmax,
            'Ngashomo': meta.N_gashomo,
            'temp': par.temperature,
            'Vexp': par.Vexp,
            'DGR': par.DGR,
            'atau3': meta.atau3,
            'voigta': res.cfg.voigt_a_ref,
            'Xfreq1': meta.xfreq_min,
            'Xfreq2': meta.xfreq_max,
            'Dxfreq': meta.dxfreq,
            'Dwave': meta.dwave,
            'I_unit': par.intensity_unit,
            'Dfreq': meta.Dfreq_ref,
            'Nsc_dust': nsc_dust,
            'Nsc_gas': nsc_gas,
            'Nsc_tot': nsc_gas + nsc_dust,
            'nx': meta.nx, 'ny': meta.ny, 'nz': meta.nz,
            'xmax': par.xmax, 'ymax': par.ymax, 'zmax': par.zmax,
            'EXTNAME': 'Spectrum',
            'calc_P': par.calcP, 'calc_Pnew': par.calcPnew,
            'calc_J': par.calcJ,
        })
        if res.flux_factor:
            _put_attrs(g, {'flux_factor': res.flux_factor,
                           'nrejected': res.nrejected})
        if par.h2_model.strip().lower() not in ('', 'none'):
            _put_attrs(g, {
                'H2MODEL': par.h2_model, 'H2FH2': par.f_H2,
                'H2TEMP': par.h2_temperature, 'H2NLINE': 2,
                'H2ABS': res.W_H2abs, 'H2SCAT': res.W_H2scat,
                'H2PUMP1': float(res.W_H2pump[0])
                if res.W_H2pump is not None else 0.0,
                'H2PUMP2': float(res.W_H2pump[1])
                if res.W_H2pump is not None else 0.0,
            })
        if res.Jout_Ha is not None:
            gh = f.create_group('Jout_Ha')
            gh.create_dataset('data', data=np.asarray(res.Jout_Ha, bp))
            _put_attrs(gh, {'EXTNAME': 'Jout_Ha'})
            gh = f.create_group('Jabs_Ha')
            gh.create_dataset('data', data=np.asarray(res.Jabs_Ha, bp))
            _put_attrs(gh, {'EXTNAME': 'Jabs_Ha'})
            _put_attrs(g, {'W_conv': res.W_conv, 'W_esc1': res.W_esc1,
                           'W_abs1': res.W_abs1, 'W_esc2': res.W_esc2,
                           'W_abs2': res.W_abs2})
        if res.J2gam is not None:
            g2 = f.create_group('J2gam')
            g2.create_dataset('y', data=res.y_2gam)
            g2.create_dataset('data', data=np.asarray(res.J2gam, bp))
            _put_attrs(g2, {'EXTNAME': 'J2gam'})
        for nm, arr, ext in (('J1', res.J1, 'Jx_1D'), ('Pa', res.Pa,
                             'Pa_1D' if res.meta.geometry_JPa != 3
                             else 'Pa_3D'),
                             ('Pnew', res.Pnew, 'Pa_1D_new')):
            if arr is None:
                continue
            gp = f.create_group(ext)
            data = arr
            if ext == 'Pa_3D':
                data = arr.reshape(res.meta.nx, res.meta.ny, res.meta.nz)
            gp.create_dataset('data', data=np.asarray(data, bp))
            if res.r_JPa is not None and ext != 'Pa_3D':
                gp.create_dataset('radius', data=res.r_JPa)
            _put_attrs(gp, {'EXTNAME': ext,
                            'geom_JPa': res.meta.geometry_JPa})
        if res.allph:
            # all-photons table (write_output_rect.f90:1353-1483)
            ga = f.create_group('AllPhotons')
            for nm, arr in res.allph.items():
                ga.create_dataset(nm, data=np.asarray(arr, np.float32))
            _put_attrs(ga, {'EXTNAME': 'AllPhotons'})
        if res.Jmu is not None:
            gm = f.create_group('Jmu')
            gm.create_dataset('data', data=res.Jmu.astype(bp))
            mu_min = 0.0 if par.xyz_symmetry else -1.0
            dmu = (1.0 - mu_min) / par.nmu
            _put_attrs(gm, {
                'EXTNAME': 'Jmu', 'CTYPE1': 'XFREQ', 'CRPIX1': 1.0,
                'CRVAL1': meta.xfreq_min + 0.5 * meta.dxfreq,
                'CDELT1': meta.dxfreq, 'CTYPE2': 'MU', 'CRPIX2': 1.0,
                'CRVAL2': mu_min + 0.5 * dmu, 'CDELT2': dmu,
                'nmu': par.nmu, 'mu_min': mu_min, 'dmu': dmu})
    return filename


def write_output_peeling_3D(filename: str, res: RunResult, iobs: int) -> str:
    """Per-observer spectral image cube file (write_output_peeling_3D,
    write_output_rect.f90:1003-1352): Scattered/Direct cubes with spectral +
    TAN WCS keywords, Stokes I/Q/U/V cubes, RadialI and Stokes_radial
    profiles."""
    from ..instruments.profiles import (radial_axes, radial_intensity,
                                        radial_stokes)
    par = res.cfg.par
    meta = res.meta
    obs = res.obs_meta
    bin_unit = meta.dwave if par.intensity_unit == 1 else meta.dxfreq
    sc = res.peel['scatt'][iobs]
    dr = res.peel['direc'][iobs]
    bp_ = np.float32 if par.out_bitpix == -32 else np.float64

    if getattr(obs, 'inside', False):
        # interior observer: all-sky HEALPix RING maps (nxfreq, npix)
        # (write_output_heal.f90 peel sections)
        hk = {
            'PIXTYPE': 'HEALPIX', 'ORDERING': 'RING',
            'NSIDE': obs.nside, 'NPIX': obs.npix,
            'Xfreq1': meta.xfreq_min, 'Xfreq2': meta.xfreq_max,
            'Dxfreq': meta.dxfreq, 'I_unit': par.intensity_unit,
            'nphotons': float(res.nphotons),
        }
        with h5py.File(filename, 'w') as f:
            g = f.create_group('Scattered')
            g.create_dataset('data',
                             data=sc.reshape(meta.nxfreq,
                                             obs.npix).astype(bp_))
            _put_attrs(g, dict(hk, EXTNAME='Scattered'))
            g = f.create_group('Direct')
            g.create_dataset('data',
                             data=dr.reshape(meta.nxfreq,
                                             obs.npix).astype(bp_))
            _put_attrs(g, dict(hk, EXTNAME='Direct'))
        return filename

    lam0A = res.cfg.line.wavelength0 * 1e4
    wcs = {
        'CTYPE1': 'WAVE', 'CUNIT1': 'Angstrom',
        'CRPIX1': 1.0, 'CRVAL1': float(res.wavelength[0]),
        'CD1_1': float(res.wavelength[1] - res.wavelength[0])
        if len(res.wavelength) > 1 else 0.0,
        'CTYPE2': 'RA--TAN', 'CUNIT2': 'deg',
        'CRPIX2': (obs.nxim + 1) / 2.0, 'CRVAL2': 0.0, 'CD2_2': obs.dxim,
        'CTYPE3': 'DEC-TAN', 'CUNIT3': 'deg',
        'CRPIX3': (obs.nyim + 1) / 2.0, 'CRVAL3': 0.0, 'CD3_3': obs.dyim,
        'DISTANCE': obs.distance,
        'Xfreq1': meta.xfreq_min, 'Xfreq2': meta.xfreq_max,
        'Dxfreq': meta.dxfreq, 'Dwave': meta.dwave,
        'I_unit': par.intensity_unit, 'Dfreq': meta.Dfreq_ref,
        'nphotons': float(res.nphotons),
    }
    bp = np.float32 if par.out_bitpix == -32 else np.float64

    with h5py.File(filename, 'w') as f:
        g = f.create_group('Scattered')
        g.create_dataset('data', data=sc.astype(bp))
        _put_attrs(g, dict(wcs, EXTNAME='Scattered'))
        g = f.create_group('Direct')
        g.create_dataset('data', data=dr.astype(bp))
        _put_attrs(g, dict(wcs, EXTNAME='Direct'))

        r, rI = radial_intensity(sc, dr, bin_unit)
        g = f.create_group('RadialI')
        g.create_dataset('radius', data=r)
        g.create_dataset('I', data=rI)
        _put_attrs(g, {'EXTNAME': 'RadialI'})

        if par.use_stokes and 'I' in res.peel:
            for name in ('I', 'Q', 'U', 'V'):
                g = f.create_group(f'Stokes_{name}')
                g.create_dataset('data',
                                 data=res.peel[name][iobs].astype(bp))
                _put_attrs(g, dict(wcs, EXTNAME=f'Stokes_{name}'))
            r, rI, rQ, rU, rV, pol = radial_stokes(
                res.peel['I'][iobs], res.peel['Q'][iobs],
                res.peel['U'][iobs], res.peel['V'][iobs], bin_unit)
            g = f.create_group('Stokes_radial')
            for nm, arr in (('radius', r), ('I', rI), ('Q', rQ), ('U', rU),
                            ('V', rV), ('pol', pol)):
                g.create_dataset(nm, data=arr)
            _put_attrs(g, {'EXTNAME': 'Stokes_radial'})
    return filename


def _read_for_merge(filename: str) -> dict:
    with h5py.File(filename, 'r') as f:
        g = f['Spectrum']
        out = {
            'nphotons': float(g.attrs['nphotons']),
            'Nsc_gas': float(g.attrs['Nsc_gas']),
            'Nsc_dust': float(g.attrs['Nsc_dust']),
            'ExeTime': float(g.attrs['ExeTime']),
            'Jout': np.asarray(g['Jout'], np.float64),
        }
        out['Jin'] = np.asarray(g['Jin'], np.float64) if 'Jin' in g else None
        out['Jabs'] = np.asarray(g['Jabs'], np.float64) if 'Jabs' in g else None
    return out


def _backup_name(filename: str) -> str:
    base, ext = os.path.splitext(filename)
    i = 1
    while os.path.exists(f'{base}_backup{i}{ext}'):
        i += 1
    return f'{base}_backup{i}{ext}'


def output_filename(par) -> str:
    if par.out_file.strip():
        return par.out_file
    base = par.base_name.strip() or 'lart_output'
    return base + '.h5'
