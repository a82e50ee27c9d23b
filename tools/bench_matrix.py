"""Throughput bench matrix over every BASELINE.json config class.

BENCH_r01 covered only the Neufeld slab; BASELINE.json lists five workload
classes (slab, sphere+peel+Stokes, overlapping clumps, metal
resonance+fluorescence lines, octree AMR).  This measures steady-state
gas-scattering throughput per chip on each, via the exact production path
(driver.prepare -> jitted sharded chunk), and reports the peel-off kernel
share by differencing sphere runs with and without peeling (the peel is the
dominant cost when enabled -- SURVEY.md section 3.2).

Writes results/bench_matrix_r2.json.  Reference aggregate anchor: 5.3e7
scatterings/s over a 4-node cluster (~288 ranks => ~1.84e5/s/rank),
examples/sphere_peel/out.txt.
"""
import json
import os
import sys
import time


def _flush(payload):
    with open('results/bench_matrix_r2.json', 'w') as fh:
        json.dump(payload, fh, indent=1)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lart_tpu.utils.transfer import to_host_scalar

REFERENCE_RANK_RATE = 1.84e5   # gas scatterings/s per MPI rank (BASELINE.md)


def bench_config(name, par, *, warm_chunks=3, timed_chunks=6, seed=12345,
                 ref_photon_rate=None):
    """ref_photon_rate: photons/s per MPI rank from a committed reference
    log, for generation-bound workloads where scatterings/s is meaningless
    (e.g. FeII tau=20: <N_scatt> ~ 1e-3 per launched photon, so the wall
    time is set by generation + FFS + escape flights, not scattering)."""
    import jax
    from lart_tpu import driver

    t_setup = time.time()
    p = driver.prepare(par)
    key0 = jax.random.PRNGKey(seed)
    for i in range(warm_chunks):
        tl, alive, launched = p.run_chunk(jax.random.fold_in(key0, i))
        jax.block_until_ready(tl)
    compile_s = time.time() - t_setup
    launched0 = float(to_host_scalar(launched))

    t0 = time.time()
    ns = 0.0
    for i in range(warm_chunks, warm_chunks + timed_chunks):
        tl, alive, launched = p.run_chunk(jax.random.fold_in(key0, i))
        ns += float(to_host_scalar(tl.nscatt_gas))
    jax.block_until_ready(tl)
    dt = time.time() - t0
    nph = float(to_host_scalar(launched)) - launched0

    rate = ns / dt / p.n_dev
    out = {'config': name, 'scatt_per_s_chip': rate,
           'vs_reference_rank': rate / REFERENCE_RANK_RATE,
           'nscatt_timed': ns, 'wall_s': dt, 'setup_compile_s': compile_s,
           'n_dev': p.n_dev, 'batch_size': par.batch_size,
           'fly_substeps': par.fly_substeps,
           'scatter_rounds': par.scatter_rounds,
           'photons_per_s_chip': nph / dt / p.n_dev,
           'grid_type': p.meta.grid_type}
    if ref_photon_rate is not None:
        out['ref_photons_per_s_rank'] = ref_photon_rate
        out['vs_reference_rank_photons'] = \
            out['photons_per_s_chip'] / ref_photon_rate
    print(json.dumps(out), flush=True)
    return out


def main():
    from lart_tpu.config import Params

    os.makedirs('results', exist_ok=True)
    engine_kw = dict(nphotons=1_000_000_000, batch_size=1 << 17,
                     fly_substeps=8, scatter_rounds=4, chunk_cycles=32,
                     refill_every=4)
    rows = []
    payload = {'reference_rank_rate': REFERENCE_RANK_RATE, 'rows': rows}

    # 1a. north star: Neufeld slab tau0=1e6 (examples/slab/t1tau6.in) --
    # the analytic-flight fast path
    slab_kw = dict(temperature=1e4, taumax=1e6, xy_periodic=True,
                   nx=1, ny=1, nz=201, spectral_type='voigt',
                   source_geometry='point', **engine_kw)
    rows.append(bench_config('slab_tau1e6', Params(**slab_kw)))
    _flush(payload)
    # 1b. the same medium through the GENERIC DDA kernel (the path every
    # velocity-field/dust/file-grid run takes); the optimization target.
    # Cycle shape f1/s4 from the committed sweep (results/bench_sweep.json):
    # at tau0=1e6 the flight is sub-cell, so extra DDA substeps are pure
    # masked waste while wing lanes keep the while_loop alive.
    rows.append(bench_config('slab_tau1e6_generic', Params(
        force_generic_kernel=True,
        **{**slab_kw, 'fly_substeps': 1, 'scatter_rounds': 4})))
    _flush(payload)

    # 2a/2b. uniform sphere tau0=1e4 with and without 129x129 Stokes
    # peel-off (examples/sphere_peel/t4tau4_peel.in); the difference is the
    # peel-kernel share.
    sphere_kw = dict(temperature=1e4, taumax=1e4, geometry='sphere',
                     rmax=1.0, nx=129, ny=129, nz=129,
                     spectral_type='voigt', source_geometry='point',
                     core_skip=True, **engine_kw)
    rows.append(bench_config('sphere_tau1e4_nopeel', Params(**sphere_kw)))
    _flush(payload)
    rows.append(bench_config('sphere_tau1e4_peel_stokes', Params(
        save_peeloff=True, use_stokes=True, nxim=129, nyim=129,
        alpha=(0.0,), beta=(0.0,), gamma=(0.0,), distance=100.0,
        **sphere_kw)))
    _flush(payload)
    r_no, r_pe = rows[-2], rows[-1]
    peel_share = 1.0 - (r_pe['scatt_per_s_chip'] / r_no['scatt_per_s_chip'])
    print(json.dumps({'peel_kernel_share': peel_share}), flush=True)

    # 3. overlapping clumpy sphere (examples/clump_sphere)
    rows.append(bench_config('clump_overlap', Params(
        use_clump_medium=True, clump_allow_overlap=True,
        clump_fully_inside=False, geometry='sphere', rmax=1.0,
        clump_radius=0.08, clump_f_vol=0.1, clump_tau0=10.0,
        temperature=1e4, xfreq_min=-40.0, xfreq_max=40.0,
        spectral_type='voigt', source_geometry='point', **engine_kw)))
    _flush(payload)

    # 4. metal resonance+fluorescence: FeII UV1 multiplet with dust
    # (BASELINE config "SiII/FeII metal lines with Mueller-matrix dust").
    # Generation-bound (<N_scatt> ~ 1e-3/photon): the honest metric is
    # photons/s.  Reference anchor: examples/FeII_test/out.txt, 1e8 photons
    # in 4.149 min on 4 nodes x 72 ranks (run.sh) => 1395 photons/s/rank.
    rows.append(bench_config('feii_uv1_dust', Params(
        line_id='FeII_2600', temperature=1e4, taumax=10.0, DGR=3e-4,
        geometry='sphere', rmax=1.0, nx=65, ny=65, nz=65,
        velocity_type='hubble', Vexp=300.0,
        spectral_type='voigt', source_geometry='point', **engine_kw),
        ref_photon_rate=1.0e8 / (4.149 * 60.0) / 288.0))
    _flush(payload)

    # 5. octree-AMR sphere (examples/amr_sphere); measures the
    # flattened finest-level lookup traversal (grid/octree.build_fine_map;
    # one gather per hop vs neighbor + octant descent -- 14.5x measured,
    # logs/bench_amr_fine.log).  fly_substeps=1: at tau0=1e4 most flights
    # are sub-cell, so extra DDA substeps are masked waste (same result as
    # the generic-slab sweep, results/bench_sweep.json).
    import tempfile
    from lart_tpu.grid.amr import make_amr_sphere, write_generic_amr
    data = make_amr_sphere(n_base=32, levels_extra=2, rmax=1.0, T=1e4)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, 'bench_amr_sphere.h5')
        write_generic_amr(path, data)
        rows.append(bench_config('amr_sphere_tau1e4', Params(
            use_amr_grid=True, amr_file=path, geometry='sphere',
            taumax=1e4, temperature=1e4, rmax=1.0, core_skip=True,
            spectral_type='voigt', source_geometry='point',
            **{**engine_kw, 'fly_substeps': 1})))
    _flush(payload)

    payload['peel_kernel_share'] = peel_share
    _flush(payload)
    print('wrote results/bench_matrix_r2.json', flush=True)


if __name__ == '__main__':
    main()
