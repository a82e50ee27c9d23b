"""Reconcile every committed reference run log against this framework.

The reference commits quantitative logs for ~10 example directories (the
closest thing to golden outputs it has).  For each runnable case this
harness executes the *reference's own namelist* (scaled photon budget --
<N_scatt> is a per-photon statistic, so scaled runs are honest, just
noisier), and records BOTH scattering counters next to the committed
value:

  * ``N_w``  -- weight-weighted mean scatterings/photon, the semantics of
    the CURRENT reference source (nscatt_gas = nscatt_gas + wgt,
    src/scattering_car.f90:164, after the forced-first-scattering
    down-weighting wgt *= 1-exp(-tau0), src/run_simulation_mod.f90:90-95).
  * ``N_ev`` -- unweighted scatter events/photon.  The committed 2022-2024
    logs report <N_scatt> ~= 1 + eps on optically-thin lines, which is the
    EVENT counting of the older builds (the since-commented-out
    ``nscatt==0`` first-flight test at run_simulation_mod.f90:84 marks the
    refactor): the forced first scattering is one guaranteed event per
    photon, hence the +1.

A case "agrees" when the committed value matches either counter within
tol (default 5%, covering MC noise at the scaled budgets plus the small
semantic drift between the two counters' tails).

Committed anchors (all under /root/reference/examples):
  FeII_test/out.txt        1.0053 / 1.0091 / 1.0113  (1e8 ph, 4.15 min, 288 ranks)
  SiII_1193/out.txt        1.0155 (V000) ... (1e8 ph, 1.07 min)
  SiII_1527/out.txt        1.0570 (V000) (1e7 ph)
  emiss_1D_AlII/out.txt    55.003 (1e7 ph, 2.73 min, 88 ranks)
  sphere_peel/out.txt      1789.8 (t1tau3, 1e7 ph, 5.68 min, 288 ranks)
  rotating_galaxy_halo/log_amr  4.2638e4 / 2.8050e4 (1e6 ph; AMR input file
                           not committed -> compared against the example's
                           own Cartesian twin namelist, the pairing the
                           example's plot_compare_nx.py exists to validate)
  clump_sphere/log_back    4345.4 (fcov1) / 42399 (fcov5) (1e6 ph)
  amr_sphere_generic/log_{amr,car}_1M.txt  2.8225e4 (reconciled to 1.7% in
                           examples/RUNLOG.md since round 3)

Usage:
    python tools/reconcile_logs.py               # all cases (TPU)
    python tools/reconcile_logs.py feii_uv1 sii1193_v000   # subset, merged
    LART_RECON_SCALE=0.1 python tools/reconcile_logs.py    # cheaper
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/examples'
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'results', 'reconcile_logs.json')

CASES = [
    # name, namelist, ref <N>, ref nphotons, ref wall min, ref ranks,
    # repo photon budget, extra Params overrides, note
    dict(name='feii_uv1', nml=f'{REF}/FeII_test/FeII_UV1.in',
         ref_N=1.0053, ref_nph=1e8, ref_wall_min=4.149, ref_ranks=288,
         nph=2_000_000, over=dict(),
         note='the committed log itself prints voigt_a = 2.226e-3 while '
              'the CURRENT reference source gives 1.02e-3 for FeII_UV1 '
              '(line_mod.f90:1037-1058, damping = sum A21 of branch 1 = '
              '2.70e8; this framework matches the current source to '
              '0.3%, and matches the log\'s N_pole = 1.176e14 to 0.2%) '
              '-- the FeII atomic data changed upstream after the 2024 '
              'log was made, so its <N>=1.0053 reflects ~2.2x larger '
              'damping wings than today\'s source produces'),
    dict(name='feii_uv1_v050', nml=f'{REF}/FeII_test/FeII_UV1_V050.in',
         ref_N=1.0091, ref_nph=1e8, ref_wall_min=4.150, ref_ranks=288,
         nph=2_000_000, over=dict(),
         note='see feii_uv1'),
    dict(name='feii_uv1_v100', nml=f'{REF}/FeII_test/FeII_UV1_V100.in',
         ref_N=1.0113, ref_nph=1e8, ref_wall_min=4.145, ref_ranks=288,
         nph=2_000_000, over=dict(),
         note='see feii_uv1'),
    dict(name='sii1193_v000', nml=f'{REF}/SiII_1193/tau1e+0_V000.in',
         ref_N=1.0155, ref_nph=1e8, ref_wall_min=1.069, ref_ranks=None,
         nph=2_000_000, over=dict(fly_substeps=32, scatter_rounds=2,
                                  use_stokes=False, save_peeloff=False)),
    dict(name='sii1527_v000', nml=f'{REF}/SiII_1527/t1e5tau1e0.in',
         ref_N=1.0570, ref_nph=1e7, ref_wall_min=0.378, ref_ranks=None,
         nph=2_000_000, over=dict(fly_substeps=32, scatter_rounds=2)),
    dict(name='alii_emiss1d', nml=f'{REF}/emiss_1D_AlII/AlII_ex.in',
         ref_N=55.003, ref_nph=1e7, ref_wall_min=2.727, ref_ranks=88,
         nph=200_000, over=dict(fly_substeps=8, scatter_rounds=4)),
    dict(name='sphere_peel_t1tau3', nml=f'{REF}/sphere_peel/t1tau3.in',
         ref_N=1789.8, ref_nph=1e7, ref_wall_min=5.675, ref_ranks=288,
         nph=100_000, over=dict(save_peeloff=False, use_stokes=False,
                                save_sightline_tau=False, out_merge=False,
                                core_skip=True),
         note='peel/stokes off: reconciling <N_scatt> and throughput of '
              'the transport; the peel instrument is benchmarked '
              'separately in results/bench_matrix_r2.json'),
    dict(name='rot_halo_vrot100', nml=f'{REF}/rotating_galaxy_halo/'
         'rin0.1_Vrot100_NHI18.in',
         ref_N=4.2638e4, ref_nph=1e6, ref_wall_min=31.312, ref_ranks=144,
         nph=10_000, over=dict(save_peeloff=False, save_Jmu=False,
                               core_skip=True),
         note='committed log is the AMR twin (amr input file not '
              'committed); Cartesian 801^3 namelist scaled to nx=201 '
              'like nx201/ variant.  Recorded from the 8-device CPU '
              'mesh: this config reproducibly trips an axon-TPU kernel '
              'fault (3x; other 201^3 velocity-field cases run fine '
              'there) -- tracked as an open item',
         over2=dict(nx=201, ny=201, nz=201)),
    dict(name='clump_fcov1', nml=f'{REF}/clump_sphere/clump_NHI18_fcov1.in',
         ref_N=4345.4, ref_nph=1e6, ref_wall_min=21.114, ref_ranks=216,
         nph=4_000, over=dict(save_Jmu=False)),
]


def run_case(c, scale):
    import numpy as np
    import jax
    from lart_tpu.config import Params
    from lart_tpu import driver

    par = Params.from_namelist(c['nml'])
    nph = max(2000, int(c['nph'] * scale))
    over = dict(c.get('over', {}))
    over.update(c.get('over2', {}))
    over['nphotons'] = nph
    over['save_all_photons'] = False
    import dataclasses
    par = dataclasses.replace(par, **over)
    cwd = os.getcwd()
    os.chdir(os.path.dirname(c['nml']))
    try:
        t0 = time.time()
        res = driver.run(par, seed=4242)
        wall = time.time() - t0
    finally:
        os.chdir(cwd)
    ratio_w = res.nscatt_gas / c['ref_N']
    ratio_ev = res.nscatt_events / c['ref_N']
    agree = min(abs(ratio_w - 1.0), abs(ratio_ev - 1.0)) < 0.05
    ref_rate = (c['ref_nph'] / (c['ref_wall_min'] * 60.0)
                / c['ref_ranks']) if c['ref_ranks'] else None
    row = {
        'case': c['name'], 'namelist': c['nml'].replace(REF + '/', ''),
        'ref_N_scatt': c['ref_N'],
        'repo_N_weighted': res.nscatt_gas,
        'repo_N_events': res.nscatt_events,
        'ratio_weighted': ratio_w, 'ratio_events': ratio_ev,
        'agrees': bool(agree),
        'nphotons_run': nph, 'wall_s': wall,
        'photons_per_s_chip': nph / wall,
        'scatt_per_s_chip': res.nscatt_gas * nph / wall,
        'ref_nphotons': c['ref_nph'], 'ref_wall_min': c['ref_wall_min'],
        'ref_ranks': c['ref_ranks'],
        'ref_photons_per_s_rank': ref_rate,
    }
    if ref_rate:
        row['vs_ref_rank_photons'] = row['photons_per_s_chip'] / ref_rate
    if 'note' in c:
        row['note'] = c['note']
    print(json.dumps(row), flush=True)
    return row


def write_markdown(rows):
    """results/RECONCILE.md: the committed-log reconciliation table."""
    lines = [
        '# Reconciliation against the reference\'s committed run logs',
        '',
        'Every runnable example with a committed reference log, rerun '
        'from the *reference\'s own namelist* (scaled photon budget; '
        '`tools/reconcile_logs.py`).  `N_ev` counts unweighted '
        'scatter events -- the semantics of the 2022-2024 builds that '
        'wrote the logs (one forced first scattering per photon, '
        'run_simulation_mod.f90:84 commented-out nscatt==0 test); '
        '`N_w` is the weight-counting of the current reference source '
        '(scattering_car.f90:164).  A case agrees when either counter '
        'matches the committed value within 5%.',
        '',
        '| case | committed <N> | N_ev (this) | N_ev/ref | N_w (this) | '
        'agrees | note |',
        '|---|---|---|---|---|---|---|',
    ]
    for r in rows:
        if 'error' in r:
            lines.append(f"| {r['case']} | - | - | - | - | ERROR | "
                         f"{r['error'][:80]} |")
            continue
        lines.append(
            f"| {r['case']} | {r['ref_N_scatt']:.5g} | "
            f"{r['repo_N_events']:.5g} | {r['ratio_events']:.4f} | "
            f"{r['repo_N_weighted']:.4g} | "
            f"{'yes' if r['agrees'] else 'NO'} | {r.get('note', '')[:160]} |")
    lines += [
        '',
        'The amr_sphere_generic logs (<N>=2.8225e4, AMR == Cartesian) are '
        'reconciled separately in examples/RUNLOG.md (1.7% at 2k photons '
        'since round 3).',
    ]
    path = os.path.join(os.path.dirname(OUT), 'RECONCILE.md')
    with open(path, 'w') as fh:
        fh.write('\n'.join(lines) + '\n')


def main():
    scale = float(os.environ.get('LART_RECON_SCALE', '1.0'))
    want = [a for a in sys.argv[1:] if not a.startswith('-')]
    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            existing = {r['case']: r for r in json.load(fh).get('rows', [])}
    for c in CASES:
        if want and c['name'] not in want:
            continue
        try:
            existing[c['name']] = run_case(c, scale)
        except Exception as e:              # keep going; record the failure
            import traceback
            traceback.print_exc()
            existing[c['name']] = {'case': c['name'], 'error': str(e)}
        rows = [existing[c2['name']] for c2 in CASES
                if c2['name'] in existing]
        with open(OUT, 'w') as fh:
            json.dump({'doc': __doc__.split('Usage')[0], 'rows': rows},
                      fh, indent=1)
        write_markdown(rows)
    n_ok = sum(1 for r in existing.values() if r.get('agrees'))
    print(f'{n_ok}/{len(existing)} cases agree; wrote {OUT}', flush=True)


if __name__ == '__main__':
    main()
