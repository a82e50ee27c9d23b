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

from ..tally import RunResult
from .iofile import open_write, open_read, default_extension


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
    names = ['Scattered', 'Direct']
    pairs = [('Scattered', 'scatt'), ('Direct', 'direc')]
    if par.use_stokes and 'I' in res.peel:
        pairs += [(f'Stokes_{nm}', nm) for nm in 'IQUV']
        names += [f'Stokes_{nm}' for nm in 'IQUV']
    imgs = {name: res.peel[key][iobs].sum(axis=0) * bin_unit
            for name, key in pairs}
    nph = float(res.nphotons)
    if par.out_merge:
        prev = _read_peel_for_merge(filename, names)
        if prev is not None:
            tot = prev['nphotons'] + nph
            w1, w2 = prev['nphotons'] / tot, nph / tot
            imgs = {nm: prev[nm] * w1 + imgs[nm] * w2 for nm in imgs}
            nph = tot
    hk = {'nphotons': nph, 'I_unit': par.intensity_unit}
    if getattr(obs, 'inside', False):
        hk.update(PIXTYPE='HEALPIX', ORDERING='RING', NSIDE=obs.nside,
                  NPIX=obs.npix)
    with open_write(filename, par.file_format) as f:
        for name in names:
            g = f.create_group(name)
            g.create_dataset('data', data=np.asarray(imgs[name], bp))
            _put_attrs(g, dict(hk, EXTNAME=name))
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
    Jabs2, Jmu = res.Jabs2, res.Jmu
    J1, Pa, Pnew = res.J1, res.Pa, res.Pnew
    Jout_Ha, Jabs_Ha, J2gam = res.Jout_Ha, res.Jabs_Ha, res.J2gam
    nsc_gas, nsc_dust = res.nscatt_gas, res.nscatt_dust
    scal = {k: getattr(res, k) for k in
            ('W_conv', 'W_esc1', 'W_abs1', 'W_esc2', 'W_abs2',
             'W_H2abs', 'W_H2scat', 'flux_factor', 'nrejected',
             'W_escape', 'W_absorb', 'W_oor')}
    scal['W_H2pump'] = res.W_H2pump
    allph = res.allph
    if merged is not None:
        # photon-count-weighted accumulation of ALL per-photon-normalized
        # arrays and scalars (write_output_rect.f90:130-420 merges spectra,
        # Jmu, Pa/P1/P2(+new), J/J1/J2, Jout_Ha/Jabs_Ha, J2gam, flux
        # factors identically)
        nph1 = merged['nphotons']
        tot = nph1 + nph
        w1, w2 = nph1 / tot, nph / tot

        def mavg(old, new):
            if new is None:
                return None
            if old is None:
                return new
            return np.asarray(old, np.float64) * w1 \
                + np.asarray(new, np.float64) * w2

        Jout = mavg(merged.get('Jout'), Jout)
        Jin = mavg(merged.get('Jin'), Jin)
        Jabs = mavg(merged.get('Jabs'), Jabs)
        Jabs2 = mavg(merged.get('Jabs2'), Jabs2)
        Jmu = mavg(merged.get('Jmu'), Jmu)
        J1 = mavg(merged.get('J1'), J1)
        Pa = mavg(merged.get('Pa'), Pa)
        Pnew = mavg(merged.get('Pnew'), Pnew)
        Jout_Ha = mavg(merged.get('Jout_Ha'), Jout_Ha)
        Jabs_Ha = mavg(merged.get('Jabs_Ha'), Jabs_Ha)
        J2gam = mavg(merged.get('J2gam'), J2gam)
        nsc_gas = merged['Nsc_gas'] * w1 + nsc_gas * w2
        nsc_dust = merged['Nsc_dust'] * w1 + nsc_dust * w2
        for k in list(scal):
            if scal[k] is not None and merged.get(k) is not None:
                scal[k] = mavg(merged[k], scal[k]) \
                    if k == 'W_H2pump' else \
                    float(merged[k]) * w1 + float(scal[k]) * w2
        if allph and merged.get('allph'):
            # per-photon rows: merge = concatenation of independent runs
            old = merged['allph']
            if set(old.keys()) == set(allph.keys()):
                allph = {k: np.concatenate([np.asarray(old[k]),
                                            np.asarray(allph[k])])
                         for k in allph}
        exetime_min = exetime_min + merged['ExeTime']
        nph = tot

    with open_write(filename, par.file_format) as f:
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
        if Jabs2 is not None:
            g.create_dataset('Jabs2', data=np.asarray(Jabs2, bp))

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
            # raw escaped/absorbed weight per photon: the conservation
            # check that the geometry-normalized spectra cannot provide
            'W_esc': scal['W_escape'],
            'W_abs': scal['W_absorb'],
            'nx': meta.nx, 'ny': meta.ny, 'nz': meta.nz,
            'xmax': par.xmax, 'ymax': par.ymax, 'zmax': par.zmax,
            'EXTNAME': 'Spectrum',
            'calc_P': par.calcP, 'calc_Pnew': par.calcPnew,
            'calc_J': par.calcJ,
        })
        if scal['flux_factor']:
            _put_attrs(g, {'flux_factor': scal['flux_factor'],
                           'nrejected': scal['nrejected']})
        if par.h2_model.strip().lower() not in ('', 'none'):
            _put_attrs(g, {
                'H2MODEL': par.h2_model, 'H2FH2': par.f_H2,
                'H2TEMP': par.h2_temperature, 'H2NLINE': 2,
                'H2ABS': scal['W_H2abs'], 'H2SCAT': scal['W_H2scat'],
                'H2PUMP1': float(scal['W_H2pump'][0])
                if scal['W_H2pump'] is not None else 0.0,
                'H2PUMP2': float(scal['W_H2pump'][1])
                if scal['W_H2pump'] is not None else 0.0,
            })
        if Jout_Ha is not None:
            gh = f.create_group('Jout_Ha')
            gh.create_dataset('data', data=np.asarray(Jout_Ha, bp))
            _put_attrs(gh, {'EXTNAME': 'Jout_Ha'})
            gh = f.create_group('Jabs_Ha')
            gh.create_dataset('data', data=np.asarray(Jabs_Ha, bp))
            _put_attrs(gh, {'EXTNAME': 'Jabs_Ha'})
            _put_attrs(g, {'W_conv': scal['W_conv'],
                           'W_esc1': scal['W_esc1'],
                           'W_abs1': scal['W_abs1'],
                           'W_esc2': scal['W_esc2'],
                           'W_abs2': scal['W_abs2']})
        if J2gam is not None:
            g2 = f.create_group('J2gam')
            g2.create_dataset('y', data=res.y_2gam)
            g2.create_dataset('data', data=np.asarray(J2gam, bp))
            _put_attrs(g2, {'EXTNAME': 'J2gam'})
        for nm, arr, ext in (('J1', J1, 'Jx_1D'), ('Pa', Pa,
                             'Pa_1D' if res.meta.geometry_JPa != 3
                             else 'Pa_3D'),
                             ('Pnew', Pnew, 'Pa_1D_new')):
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
        if allph:
            # all-photons table (write_output_rect.f90:1353-1483)
            ga = f.create_group('AllPhotons')
            for nm, arr in allph.items():
                ga.create_dataset(nm, data=np.asarray(arr, np.float32))
            _put_attrs(ga, {'EXTNAME': 'AllPhotons'})
        if Jmu is not None:
            gm = f.create_group('Jmu')
            gm.create_dataset('data', data=np.asarray(Jmu, bp))
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
    cubes = {'Scattered': res.peel['scatt'][iobs],
             'Direct': res.peel['direc'][iobs]}
    has_stokes = par.use_stokes and 'I' in res.peel
    if has_stokes:
        for nm in 'IQUV':
            cubes[f'Stokes_{nm}'] = res.peel[nm][iobs]
    if 'Ha' in res.peel:
        # ly_beta band-2 H-alpha peel cube (write_output_rect.f90:1180-1185)
        cubes['peel_Ha'] = res.peel['Ha'][iobs]
    if 'direc0' in res.peel:
        # unattenuated stellar direct cube (write_output_rect.f90:1170-1173)
        cubes['Direct0'] = res.peel['direc0'][iobs]
    bp_ = np.float32 if par.out_bitpix == -32 else np.float64

    if getattr(obs, 'inside', False):
        cubes = {k: v.reshape(meta.nxfreq, obs.npix)
                 for k, v in cubes.items() if k in ('Scattered', 'Direct')}
    nph = float(res.nphotons)
    if par.out_merge:
        # photon-count-weighted merge of previous peel cubes
        # (write_output_rect.f90:780-960)
        prev = _read_peel_for_merge(filename, list(cubes))
        if prev is not None:
            tot = prev['nphotons'] + nph
            w1, w2 = prev['nphotons'] / tot, nph / tot
            cubes = {nm: prev[nm] * w1 + cubes[nm] * w2 for nm in cubes}
            nph = tot
    sc, dr = cubes['Scattered'], cubes['Direct']

    if getattr(obs, 'inside', False):
        # interior observer: all-sky HEALPix RING maps (nxfreq, npix)
        # (write_output_heal.f90 peel sections)
        hk = {
            'PIXTYPE': 'HEALPIX', 'ORDERING': 'RING',
            'NSIDE': obs.nside, 'NPIX': obs.npix,
            'Xfreq1': meta.xfreq_min, 'Xfreq2': meta.xfreq_max,
            'Dxfreq': meta.dxfreq, 'I_unit': par.intensity_unit,
            'nphotons': nph,
        }
        with open_write(filename, par.file_format) as f:
            g = f.create_group('Scattered')
            g.create_dataset('data', data=np.asarray(sc, bp_))
            _put_attrs(g, dict(hk, EXTNAME='Scattered'))
            g = f.create_group('Direct')
            g.create_dataset('data', data=np.asarray(dr, bp_))
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
        'nphotons': nph,
    }
    if getattr(obs, 'pos_host', None) is not None:
        # observer position -> viewing mu (PeelObservation.mu, reference
        # python/read_lart.py:103-111 reads these keywords)
        px, py, pz = (float(v) for v in obs.pos_host[iobs])
        wcs.update(OBSX=px, OBSY=py, OBSZ=pz)
    bp = np.float32 if par.out_bitpix == -32 else np.float64

    with open_write(filename, par.file_format) as f:
        g = f.create_group('Scattered')
        g.create_dataset('data', data=np.asarray(sc, bp))
        _put_attrs(g, dict(wcs, EXTNAME='Scattered'))
        g = f.create_group('Direct')
        g.create_dataset('data', data=np.asarray(dr, bp))
        _put_attrs(g, dict(wcs, EXTNAME='Direct'))

        if 'peel_Ha' in cubes:
            g = f.create_group('peel_Ha')
            g.create_dataset('data', data=np.asarray(cubes['peel_Ha'], bp))
            _put_attrs(g, dict(wcs, EXTNAME='peel_Ha'))
        if 'Direct0' in cubes:
            g = f.create_group('Direct0')
            g.create_dataset('data', data=np.asarray(cubes['Direct0'], bp))
            _put_attrs(g, dict(wcs, EXTNAME='Direct0'))

        r, rI = radial_intensity(sc, dr, bin_unit)
        g = f.create_group('RadialI')
        g.create_dataset('radius', data=r)
        g.create_dataset('I', data=rI)
        _put_attrs(g, {'EXTNAME': 'RadialI'})

        if has_stokes:
            for name in ('I', 'Q', 'U', 'V'):
                g = f.create_group(f'Stokes_{name}')
                g.create_dataset(
                    'data', data=np.asarray(cubes[f'Stokes_{name}'], bp))
                _put_attrs(g, dict(wcs, EXTNAME=f'Stokes_{name}'))
            r, rI, rQ, rU, rV, pol = radial_stokes(
                cubes['Stokes_I'], cubes['Stokes_Q'],
                cubes['Stokes_U'], cubes['Stokes_V'], bin_unit)
            g = f.create_group('Stokes_radial')
            for nm, arr in (('radius', r), ('I', rI), ('Q', rQ), ('U', rU),
                            ('V', rV), ('pol', pol)):
                g.create_dataset(nm, data=arr)
            _put_attrs(g, {'EXTNAME': 'Stokes_radial'})
    return filename


def _read_for_merge(filename: str) -> dict:
    """Read every mergeable section of a previous output
    (write_output_rect.f90:120-420)."""
    f = open_read(filename)
    g = f['Spectrum']
    out = {
        'nphotons': float(g.attrs['nphotons']),
        'Nsc_gas': float(g.attrs['Nsc_gas']),
        'Nsc_dust': float(g.attrs['Nsc_dust']),
        'ExeTime': float(g.attrs['ExeTime']),
        'Jout': np.asarray(g['Jout'], np.float64),
    }
    for ds in ('Jin', 'Jabs', 'Jabs2'):
        out[ds] = np.asarray(g[ds], np.float64) if ds in g else None
    for key, attr in (('flux_factor', 'flux_factor'),
                      ('nrejected', 'nrejected'),
                      ('W_conv', 'W_conv'), ('W_esc1', 'W_esc1'),
                      ('W_abs1', 'W_abs1'), ('W_esc2', 'W_esc2'),
                      ('W_abs2', 'W_abs2'),
                      ('W_H2abs', 'H2ABS'), ('W_H2scat', 'H2SCAT'),
                      ('W_escape', 'W_esc'), ('W_absorb', 'W_abs')):
        out[key] = float(g.attrs[attr]) if attr in g.attrs else None
    if 'H2PUMP1' in g.attrs:
        out['W_H2pump'] = np.array([float(g.attrs['H2PUMP1']),
                                    float(g.attrs.get('H2PUMP2', 0.0))])
    else:
        out['W_H2pump'] = None
    for sec, key in (('Jmu', 'Jmu'), ('Jout_Ha', 'Jout_Ha'),
                     ('Jabs_Ha', 'Jabs_Ha'), ('J2gam', 'J2gam'),
                     ('Jx_1D', 'J1'), ('Pa_1D', 'Pa'), ('Pa_3D', 'Pa'),
                     ('Pa_1D_new', 'Pnew')):
        if sec in f and 'data' in f[sec]:
            arr = np.asarray(f[sec]['data'], np.float64)
            out[key] = arr.reshape(-1) if sec == 'Pa_3D' else arr
        else:
            out.setdefault(key, None)
    if 'AllPhotons' in f:
        s = f['AllPhotons']
        out['allph'] = {k: np.asarray(s[k]) for k in s.keys()}
    else:
        out['allph'] = None
    return out


def _read_peel_for_merge(filename: str, names) -> Optional[dict]:
    """Previous per-observer peel file -> {name: cube, 'nphotons': N}
    (merge of obs%scatt/direc/I/Q/U/V, write_output_rect.f90:780-960)."""
    if not os.path.exists(filename):
        return None
    f = open_read(filename)
    out = {}
    for nm in names:
        if nm not in f or 'data' not in f[nm]:
            return None
        sec = f[nm]
        out[nm] = np.asarray(sec['data'], np.float64)
        if 'nphotons' not in out and 'nphotons' in sec.attrs:
            out['nphotons'] = float(sec.attrs['nphotons'])
    return out if 'nphotons' in out else None


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
    return base + default_extension(par.file_format)
