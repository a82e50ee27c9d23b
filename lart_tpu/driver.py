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
from .grid.cartesian import build_cartesian
from .parallel import mesh as pmesh
from .tally import RunResult, normalize
from .transport import engine


def run(par: Params, *, seed: Optional[int] = None,
        progress: Optional[Callable[[int, int, int], None]] = None,
        max_chunks: int = 1_000_000) -> RunResult:
    """Run a full Monte Carlo transport simulation.

    par      : input parameters (e.g. Params.from_namelist('t1tau6.in'))
    seed     : RNG seed (defaults to par.iseed)
    progress : optional callback(launched, nphotons, alive)
    """
    enable_compilation_cache()
    cfg = par.resolve()
    meta, grid = build_cartesian(cfg)

    m = pmesh.make_mesh(par.n_devices)
    n_dev = len(m.devices.ravel())
    budgets = pmesh.shard_budget(par.nphotons, n_dev)

    B = par.batch_size
    state = engine.init_state(B * n_dev)
    # n_launched leaf must be (n_dev,) so each shard sees (1,)
    state = state._replace(n_launched=jnp.zeros((n_dev,), jnp.int32))
    state = pmesh.device_put_sharded_state(state, m)
    grid = pmesh.device_put_replicated(grid, m)
    n_shard = jax.device_put(
        jnp.asarray(budgets, jnp.int32),
        jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec('data')))

    chunk = pmesh.sharded_chunk(engine.make_chunk(cfg, meta), m)

    key0 = jax.random.PRNGKey(seed if seed is not None else par.iseed)

    acc = {
        'Jin': np.zeros(meta.nxfreq, np.float64),
        'Jout': np.zeros(meta.nxfreq, np.float64),
        'Jabs': np.zeros(meta.nxfreq, np.float64),
        'nscatt_gas': 0.0,
        'nscatt_dust': 0.0,
    }

    t0 = time.time()
    nphotons = int(np.sum(budgets))
    for ci in range(max_chunks):
        key = jax.random.fold_in(key0, ci)
        state, tallies, alive, launched = chunk(state, grid, key, n_shard)
        tl = jax.tree_util.tree_map(np.asarray, tallies)
        acc['Jin'] += tl.Jin
        acc['Jout'] += tl.Jout
        acc['Jabs'] += tl.Jabs
        acc['nscatt_gas'] += float(tl.nscatt_gas)
        acc['nscatt_dust'] += float(tl.nscatt_dust)
        alive = int(alive)
        launched = int(launched)
        if progress is not None:
            progress(launched, nphotons, alive)
        if launched >= nphotons and alive == 0:
            break
    exetime = time.time() - t0

    return normalize(cfg, meta, acc, nphotons, exetime_s=exetime)


def run_namelist(path: str, **kw) -> RunResult:
    return run(Params.from_namelist(path), **kw)
