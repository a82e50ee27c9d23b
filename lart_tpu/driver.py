"""Top-level simulation driver: the `main` of the framework.

Mirrors the reference call sequence main -> read_input -> grid_create ->
run_simulation -> output_reduce -> output_normalize -> write_output
(reference: src/main.f90:19-68), restructured as: resolve config -> build
grid (host) -> jitted sharded chunk loop -> host f64 accumulation ->
normalize -> RunResult.

The chunk loop is the only host<->device synchronization point: each chunk
runs `chunk_cycles` full transport cycles on-device across the mesh, then
returns psum-med tallies and liveness scalars.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import Params, ResolvedConfig
from .utils.cache import enable_compilation_cache
from .utils.transfer import to_host, to_host_scalar, tree_to_host
from .grid.cartesian import build_cartesian
from .instruments.observer import build_observers
from .parallel import mesh as pmesh
from .tally import RunResult, normalize
from .transport import engine


class Prepared:
    """Everything driver.run builds before the chunk loop: resolved config,
    grid device arrays, observers, sources, mesh sharding and the jitted
    sharded chunk.  Exposed so benchmarks (tools/bench_matrix.py, bench.py)
    measure the exact production path without duplicating setup logic."""

    __slots__ = ('cfg', 'meta', 'grid', 'cmeta', 'obs_meta', 'odev', 'src',
                 'mesh', 'n_dev', 'budgets', 'state', 'n_shard', 'chunk',
                 'amr')

    def run_chunk(self, key):
        """Advance the persistent batch by one jitted sharded chunk."""
        self.state, tallies, alive, launched = self.chunk(
            self.state, self.grid, key, self.n_shard, self.odev, self.src)
        return tallies, alive, launched


def prepare(par: Params, *, seed: Optional[int] = None) -> Prepared:
    """Resolve config, build the grid/observers/sources on host, place
    arrays on the mesh, and jit the sharded transport chunk."""
    enable_compilation_cache()
    cfg = par.resolve()
    par = cfg.par     # resolve() normalizes aliases (grid_type,
    cmeta = None      # distance_unit -> distance2cm, ...)
    if par.use_clump_medium:
        from .grid.clump import build_clumps
        meta, cmeta, grid = build_clumps(cfg, seed=(seed or par.iseed) + 77)
        if par.save_clump_info:
            # write_clumps_info (clump_mod.f90:1779-1990)
            import os
            from .grid.clump import save_clumps
            from .io.writer import output_filename
            base, _ = os.path.splitext(output_filename(par))
            pos = np.stack([to_host(grid.x), to_host(grid.y),
                            to_host(grid.z)], axis=1)
            from .config import vtherm_total as _vt
            T_cl = par.clump_temperature if par.clump_temperature > 0 \
                else par.temperature
            vel = np.stack([to_host(grid.vx), to_host(grid.vy),
                            to_host(grid.vz)], axis=1) \
                * _vt(par, cfg.line, T_cl)
            save_clumps(base + '_clumps.h5', pos, to_host(grid.radius),
                        rhokap=to_host(grid.rhokap), vel=vel,
                        sphere_R=par.rmax, rmin=max(par.rmin, 0.0),
                        attrs={'F_VOL': cmeta.f_vol, 'F_COV': cmeta.f_cov})
    elif par.use_amr_grid:
        from .grid.amr import build_amr
        amr_res = build_amr(cfg)
        meta, grid = amr_res.meta, amr_res.dev
    else:
        host_data = {}
        meta, grid = build_cartesian(cfg, host_out=host_data)
    if par.save_input_grid and meta.grid_type == 'cartesian':
        _dump_input_grid(cfg, meta, grid)

    obs = build_observers(cfg)
    obs_meta, odev = obs if obs is not None else (None, None)

    # table-driven sources (sersic/star_file/diffuse_emissivity/...)
    from .physics.sources import build_sources
    if par.use_amr_grid or par.use_clump_medium:
        host_data = {}
    if par.use_amr_grid and getattr(amr_res, 'emissivity', None) is not None:
        host_data['emissivity'] = amr_res.emissivity
    src = build_sources(cfg, meta, host_data)

    m = pmesh.make_mesh(par.n_devices)
    n_dev = len(m.devices.ravel())
    budgets = pmesh.shard_budget(par.nphotons, n_dev)

    B = par.batch_size
    state = engine.init_state(B * n_dev)
    # n_launched leaf must be (n_dev,) so each shard sees (1,)
    state = state._replace(n_launched=jnp.zeros((n_dev,), jnp.int32))
    state = pmesh.device_put_sharded_state(state, m)
    grid = pmesh.device_put_replicated(grid, m)
    # per-device [photon budget, global pid offset]: contiguous id ranges
    # per device (reference stripes ids across ranks,
    # run_simulation_mod.f90:150); the offset keeps save_all_photons rows
    # globally unique so the psum-merge of the allph table is exact
    offsets = np.concatenate([[0], np.cumsum(budgets)[:-1]])
    n_shard = jax.device_put(
        jnp.stack([jnp.asarray(budgets, jnp.int32),
                   jnp.asarray(offsets, jnp.int32)], axis=1),
        jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec('data')))

    odev = pmesh.device_put_replicated(odev, m) if odev is not None else None
    src = pmesh.device_put_replicated(src, m) if src is not None else None
    chunk = pmesh.sharded_chunk(
        engine.make_chunk(cfg, meta, obs_meta, cmeta=cmeta), m)

    p = Prepared()
    p.cfg, p.meta, p.grid, p.cmeta = cfg, meta, grid, cmeta
    p.obs_meta, p.odev, p.src = obs_meta, odev, src
    p.mesh, p.n_dev, p.budgets = m, n_dev, budgets
    p.state, p.n_shard, p.chunk = state, n_shard, chunk
    p.amr = amr_res if par.use_amr_grid else None
    return p


def run(par: Params, *, seed: Optional[int] = None,
        progress: Optional[Callable[[int, int, int], None]] = None,
        max_chunks: int = 1_000_000) -> RunResult:
    """Run a full Monte Carlo transport simulation.

    par      : input parameters (e.g. Params.from_namelist('t1tau6.in'))
    seed     : RNG seed (defaults to par.iseed)
    progress : optional callback(launched, nphotons, alive)
    """
    p = prepare(par, seed=seed)
    cfg, meta, cmeta = p.cfg, p.meta, p.cmeta
    par = cfg.par     # normalized aliases (grid_type, distance_unit)
    grid, obs_meta, odev, src = p.grid, p.obs_meta, p.odev, p.src
    m, n_dev, budgets = p.mesh, p.n_dev, p.budgets
    state, n_shard, chunk = p.state, p.n_shard, p.chunk
    B = par.batch_size

    key0 = jax.random.PRNGKey(seed if seed is not None else par.iseed)

    acc = {
        'Jin': np.zeros(meta.nxfreq, np.float64),
        'Jout': np.zeros(meta.nxfreq, np.float64),
        'Jabs': np.zeros(meta.nxfreq, np.float64),
        'nscatt_gas': 0.0,
        'nscatt_dust': 0.0,
        'nscatt_events': 0.0,
        'W_oor': 0.0,
    }
    if par.save_Jmu:
        acc['Jmu'] = np.zeros(meta.nxfreq * par.nmu, np.float64)
    if meta.atmosphere:
        acc['Jabs2'] = np.zeros(meta.nxfreq, np.float64)
    if par.source_geometry.strip().lower() in ('stellar_illumination',
                                               'point_illumination'):
        acc['flux_factor'] = 0.0
        acc['nrejected'] = 0.0
    if par.save_all_photons:
        acc['allph'] = {}
    if cfg.line.line_type == 8:
        acc['Jout_Ha'] = np.zeros(meta.nxfreq, np.float64)
        acc['Jabs_Ha'] = np.zeros(meta.nxfreq, np.float64)
        for k in ('W_conv', 'W_esc1', 'W_abs1', 'W_esc2', 'W_abs2'):
            acc[k] = 0.0
    if par.calcJ and meta.nbin_JPa:
        acc['J1'] = np.zeros(meta.nxfreq * meta.nbin_JPa, np.float64)
    if par.calcP and meta.nbin_JPa:
        acc['Pa'] = np.zeros(meta.nbin_JPa, np.float64)
    if par.calcPnew and meta.nbin_JPa:
        acc['Pnew'] = np.zeros(meta.nbin_JPa, np.float64)
    if obs_meta is not None:
        cube_n = obs_meta.nobs * meta.nxfreq * obs_meta.nxim * obs_meta.nyim
        acc['peel_scatt'] = np.zeros(cube_n, np.float64)
        acc['peel_direc'] = np.zeros(cube_n, np.float64)
        if par.use_stokes:
            for k in ('peel_I', 'peel_Q', 'peel_U', 'peel_V'):
                acc[k] = np.zeros(cube_n, np.float64)
        if cfg.line.line_type == 8:
            # band-2 (H-alpha) peel cube (peeling_conversion_Ha /
            # peeling_dust_Ha, peelingoff_rect.f90:692-871)
            acc['peel_Ha'] = np.zeros(cube_n, np.float64)
        if par.save_direc0 and par.source_geometry.strip().lower() \
                == 'stellar_illumination':
            acc['peel_direc0'] = np.zeros(cube_n, np.float64)

    t0 = time.time()
    nphotons = int(np.sum(budgets))
    cur_B = B

    # --- mid-run checkpoint resume: restore batch state + f64
    # accumulators + chunk index; the fold_in(key0, ci) stream continues
    # exactly where the checkpointed run stopped
    ci0 = 0
    if par.resume_checkpoint and par.checkpoint_file:
        import os as _os
        if _os.path.exists(par.checkpoint_file):
            state, acc, ci0 = _load_checkpoint(
                par.checkpoint_file, state, acc, m, n_dev)
            cur_B = state.x.shape[0] // n_dev

    metrics_fh = open(par.metrics_file, 'a') if par.metrics_file else None
    prof_active = False
    if par.profile_dir:
        jax.profiler.start_trace(par.profile_dir)
        prof_active = True

    # adaptive chunk length: the straggler tail advances ~1 scatter per
    # cycle per lane, so once the batch is nearly drained the fixed
    # host<->device sync latency per chunk dominates wall time; lengthen
    # chunks to keep (lanes x cycles) per chunk roughly constant.  One
    # compile serves every length (dynamic fori_loop bound).
    boost = 1

    def tail_control(alive, launched):
        """Boost + batch-shrink decisions, a pure function of the current
        batch state so checkpoint-resume replays them identically (the
        checkpoint is written BEFORE this runs each iteration).

        Boost: after the budget is exhausted no new photons launch, so
        longer chunks cannot overshoot -- scale cycles by the drain
        factor (cap 256x => worst case one extra chunk of
        over-integration for already-dead lanes, which is free; the cap
        only bounds the host-sync interval).

        Shrink: once the budget is exhausted the batch only drains;
        compact the survivors (cross-device, alive-first) into a smaller
        batch so the tail does not run at full-batch cost (the
        longest-lived photon takes ~ln(B) * <N_scatt> cycles).  Two-stage
        ladder 4096 -> 512: each stage costs one extra compile but
        removes an 8x compute waste in the deep tail (round-4
        postmortem: DL2008's last 2% held a full batch >20 min).
        Multi-process runs skip shrinking (the shard pull-back would
        need a cross-process gather)."""
        nonlocal state, cur_B, boost
        if launched >= nphotons and alive > 0:
            # scale from the ORIGINAL batch size: after a tail shrink the
            # per-cycle cost drops by B/cur_B, so the chunk should hold
            # proportionally MORE cycles to keep (lanes x cycles) per
            # chunk -- and thus the sync-to-compute ratio -- constant.
            # (Computing this from cur_B collapsed chunks back to ~1x
            # boost right after the shrink and the deep tail went
            # sync-bound again.)  Bound the TOTAL cycles of one device
            # call: a lone straggler otherwise yields a ~1e6-cycle
            # execution that trips the tunneled runtime's execution
            # watchdog ("TPU device error", observed at alive=1).
            cap = min(256 * max(B // cur_B, 1),
                      max(32768 // max(par.chunk_cycles, 1), 1))
            boost = int(np.clip((B * n_dev) // max(alive, 1), 1, cap))
        else:
            boost = 1
        if launched >= nphotons and jax.process_count() == 1:
            for Bt in (4096, 512):
                if cur_B > Bt and alive <= Bt * n_dev:
                    shrunk = _compact_shrink(state, n_dev, Bt, m)
                    if shrunk is not None:
                        state = shrunk
                        cur_B = Bt

    if ci0 > 0:
        # resumed mid-run: re-derive the control decisions the
        # uninterrupted run made at the end of the checkpointed iteration
        host_phase = np.asarray(tree_to_host(state.phase))
        host_launched = int(np.sum(np.asarray(tree_to_host(
            state.n_launched))))
        tail_control(int((host_phase != engine.DEAD).sum()), host_launched)

    for ci in range(ci0, max_chunks):
        t_chunk = time.time()
        key = jax.random.fold_in(key0, ci)
        state, tallies, alive, launched = chunk(
            state, grid, key, n_shard, odev, src,
            par.chunk_cycles * boost)
        # finish the chunk before ANY transfer: see utils/transfer.py;
        # one batched transfer for tallies + loop-control scalars
        jax.block_until_ready(tallies)
        tl, alive, launched = tree_to_host((tallies, alive, launched))
        acc['Jin'] += tl.Jin
        acc['Jout'] += tl.Jout
        acc['Jabs'] += tl.Jabs
        acc['nscatt_gas'] += float(tl.nscatt_gas)
        acc['nscatt_dust'] += float(tl.nscatt_dust)
        acc['nscatt_events'] += float(tl.nscatt_events)
        acc['W_oor'] += float(tl.W_oor)
        acc['W_H2abs'] = acc.get('W_H2abs', 0.0) + float(tl.W_H2abs)
        acc['W_H2scat'] = acc.get('W_H2scat', 0.0) + float(tl.W_H2scat)
        acc['W_H2pump'] = acc.get('W_H2pump', np.zeros(2)) \
            + np.asarray(tl.W_H2pump, np.float64)
        if par.save_Jmu:
            acc['Jmu'] += np.asarray(tl.Jmu, np.float64)
        if 'Jabs2' in acc:
            acc['Jabs2'] += np.asarray(tl.Jabs2, np.float64)
        if 'flux_factor' in acc:
            acc['flux_factor'] += float(tl.flux_factor)
            acc['nrejected'] += float(tl.nrejected)
        if 'allph' in acc and tl.allph is not None:
            for k in tl.allph._fields:
                v = getattr(tl.allph, k)
                if v is None:
                    continue
                acc['allph'][k] = acc['allph'].get(k, 0.0) \
                    + np.asarray(v, np.float64)
        if cfg.line.line_type == 8:
            acc['Jout_Ha'] += np.asarray(tl.Jout_Ha, np.float64)
            acc['Jabs_Ha'] += np.asarray(tl.Jabs_Ha, np.float64)
            for k in ('W_conv', 'W_esc1', 'W_abs1', 'W_esc2', 'W_abs2'):
                acc[k] += float(getattr(tl, k))
        if 'J1' in acc:
            acc['J1'] += np.asarray(tl.J1, np.float64)
        if 'Pa' in acc:
            acc['Pa'] += np.asarray(tl.Pa, np.float64)
        if 'Pnew' in acc:
            acc['Pnew'] += np.asarray(tl.Pnew, np.float64)
        if obs_meta is not None:
            acc['peel_scatt'] += tl.peel.scatt
            acc['peel_direc'] += tl.peel.direc
            if par.use_stokes:
                acc['peel_I'] += tl.peel.I
                acc['peel_Q'] += tl.peel.Q
                acc['peel_U'] += tl.peel.U
                acc['peel_V'] += tl.peel.V
            if 'peel_Ha' in acc:
                acc['peel_Ha'] += tl.peel.Ha
            if 'peel_direc0' in acc:
                acc['peel_direc0'] += tl.peel.direc0
        alive = int(np.asarray(alive).reshape(()))
        launched = int(np.asarray(launched).reshape(()))
        if prof_active and ci - ci0 + 1 >= max(par.profile_chunks, 1):
            jax.profiler.stop_trace()
            prof_active = False
        if metrics_fh is not None:
            # per-phase step metrics (SURVEY.md section 5: the reference
            # prints progress via time_stamp; here one JSONL row/chunk
            # with the north-star rate)
            import json as _json
            dt_c = time.time() - t_chunk
            metrics_fh.write(_json.dumps({
                'chunk': ci, 'wall_s': dt_c,
                'nscatt_gas': float(tl.nscatt_gas),
                'scatt_per_s': float(tl.nscatt_gas) / max(dt_c, 1e-12),
                'alive': alive, 'launched': launched,
                'batch': cur_B * n_dev}) + '\n')
            metrics_fh.flush()
        if progress is not None:
            progress(launched, nphotons, alive)
        if par.checkpoint_file and par.checkpoint_every > 0 \
                and (ci + 1) % par.checkpoint_every == 0:
            _save_checkpoint(par.checkpoint_file, state, acc, ci + 1)
        if launched >= nphotons and alive == 0:
            break
        tail_control(alive, launched)
    if prof_active:
        jax.profiler.stop_trace()
    if metrics_fh is not None:
        metrics_fh.close()
    exetime = time.time() - t0

    res = normalize(cfg, meta, acc, nphotons, exetime_s=exetime,
                    obs_meta=obs_meta)
    # sight-line tau / column maps (make_sightline_tau,
    # sightline_tau_rect.f90:11-340 / sightline_tau_heal.f90:12-146)
    if par.save_sightline_tau and obs_meta is not None \
            and meta.grid_type in ('cartesian', 'clump', 'amr'):
        from .instruments.sightline import make_sightline
        sl = make_sightline(cfg, meta, obs_meta, cmeta=cmeta)
        res.sightline = [sl(grid, odev, i) for i in range(obs_meta.nobs)]
    return res


def _dump_input_grid(cfg, meta, grid):
    """Dump the constructed grid arrays (save_input_grid,
    grid_mod_car.f90:1064-1125): <base>_temp/_opac/_dens/_vfx/_vfy/_vfz
    files in physical units."""
    import h5py
    from .io.writer import output_filename
    import os
    par, line = cfg.par, cfg.line
    base, _ = os.path.splitext(output_filename(par))
    rk = to_host(grid.rhokap, np.float64)
    Df = to_host(grid.Dfreq, np.float64) if grid.Dfreq is not None \
        else np.full_like(rk, meta.Dfreq_ref)
    d2cm = par.distance2cm if par.distance2cm > 0 else 1.0
    T = (Df * (line.wavelength0 * 1e-9)) ** 2 / line.vtherm1 ** 2 \
        if grid.Dfreq is not None else np.full_like(rk, par.temperature)
    vth = line.vtherm1 * np.sqrt(np.maximum(T, 1.0))
    out = {'temp': T, 'opac': rk,
           'dens': rk * Df / line.cross0 / d2cm}
    for nm, arr in (('vfx', grid.vfx), ('vfy', grid.vfy),
                    ('vfz', grid.vfz)):
        if arr is not None:
            out[nm] = to_host(arr, np.float64) * vth
    for nm, arr in out.items():
        with h5py.File(f'{base}_{nm}.h5', 'w') as f:
            f.create_dataset('data', data=np.asarray(arr, np.float32))


def _compact_shrink(state, n_dev, B_new, mesh):
    """Compact alive lanes ACROSS ALL device shards and truncate to B_new
    lanes/device: the surviving photons are pulled to host, ordered
    alive-first, and dealt round-robin over the devices, so the tail is
    balanced even when the stragglers cluster on one shard (the reference
    has no analogue -- its master/worker scheduler load-balances whole
    photons instead, run_simulation_mod.f90:30-64).  Returns None if more
    than B_new * n_dev lanes are still alive (caller keeps the size).
    Safe only after the photon budget is exhausted: per-device n_launched
    bookkeeping stays put, which blocks further launches regardless of
    where the lanes now live."""
    host = tree_to_host(state)
    phase = np.asarray(host.phase)
    dead = (phase == engine.DEAD)
    if (~dead).sum() > B_new * n_dev:
        return None
    # global alive-first order, dealt round-robin across shards
    order = np.argsort(dead, kind='stable')[:B_new * n_dev]
    order = order.reshape(B_new, n_dev).T.reshape(-1)

    def pick(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim == 1 and leaf.shape[0] == phase.size:
            return leaf[order]
        return leaf   # (n_dev,) bookkeeping arrays

    new_state = jax.tree_util.tree_map(pick, host)
    return pmesh.device_put_sharded_state(
        jax.tree_util.tree_map(jnp.asarray, new_state), mesh)


def _save_checkpoint(path, state, acc, next_chunk):
    """Mid-run device-state checkpoint (SURVEY.md section 5 'cheap win'):
    the full SoA batch state + the host f64 accumulators + the chunk
    index.  Resume continues the identical fold_in RNG stream, so
    checkpoint+resume equals the uninterrupted run apart from the f32
    accumulation grouping (bounded by tests/test_precision.py)."""
    import h5py
    host = tree_to_host(state)
    tmp = path + '.tmp'
    with h5py.File(tmp, 'w') as f:
        f.attrs['next_chunk'] = next_chunk
        gs = f.create_group('state')
        for k in host._fields:
            v = getattr(host, k)
            if v is not None:
                gs.create_dataset(k, data=np.asarray(v))
        ga = f.create_group('acc')
        for k, v in acc.items():
            if k == 'allph':
                gp = f.create_group('acc_allph')
                for kk, vv in v.items():
                    gp.create_dataset(kk, data=np.asarray(vv))
            else:
                ga.create_dataset(k, data=np.asarray(v))
    import os
    os.replace(tmp, path)


def _load_checkpoint(path, state, acc, mesh, n_dev):
    import h5py
    with h5py.File(path, 'r') as f:
        next_chunk = int(f.attrs['next_chunk'])
        gs = f['state']
        fields = {}
        for k in state._fields:
            cur = getattr(state, k)
            if k in gs:
                fields[k] = jnp.asarray(np.asarray(gs[k]))
            else:
                fields[k] = cur
        new_state = type(state)(**fields)
        for k in list(acc.keys()):
            if k == 'allph':
                if 'acc_allph' in f:
                    acc['allph'] = {kk: np.asarray(vv, np.float64)
                                    for kk, vv in f['acc_allph'].items()}
            elif k in f['acc']:
                v = np.asarray(f['acc'][k])
                acc[k] = float(v) if v.ndim == 0 else v.astype(np.float64)
    new_state = pmesh.device_put_sharded_state(new_state, mesh)
    return new_state, acc, next_chunk


def run_namelist(path: str, **kw) -> RunResult:
    return run(Params.from_namelist(path), **kw)
