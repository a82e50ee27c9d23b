"""North-star benchmark: photon scatterings/s/chip on the Neufeld slab
tau0=1e6 (BASELINE.json; examples/slab configuration of the reference).

Measures steady-state gas-scattering throughput of the transport engine on
the flagship config.  Baseline for vs_baseline: one reference MPI rank
achieves ~1.84e5 gas-scatterings/s (examples/sphere_peel/out.txt: 5.3e7
aggregate over ~288 ranks; see BASELINE.md).  The build target is >=5x that
per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scatterings/s/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

REFERENCE_RANK_RATE = 1.84e5   # gas scatterings/s per MPI rank (BASELINE.md)


def main():
    import jax
    from lart_tpu.config import Params
    from lart_tpu.grid.cartesian import build_cartesian
    from lart_tpu.parallel import mesh as pmesh
    from lart_tpu.transport import engine
    from lart_tpu.utils.cache import enable_compilation_cache
    from lart_tpu.utils.transfer import to_host_scalar

    enable_compilation_cache()
    n_dev = len(jax.devices())

    def measure(force_generic):
        # generic path runs at fly_substeps=1: at tau0=1e6 flights are
        # sub-cell, so extra masked DDA substeps are pure waste (swept on
        # the TPU: results/bench_sweep.json, f1_s4 = 2.5x f8_s4); the
        # analytic fast path resolves whole flights per step and is
        # insensitive to the knob.
        par = Params(
            nphotons=1_000_000_000, temperature=1e4, taumax=1e6,
            xy_periodic=True, nx=1, ny=1, nz=201,
            spectral_type='voigt', source_geometry='point',
            force_generic_kernel=force_generic,
            batch_size=1 << 17,
            fly_substeps=1 if force_generic else 8, scatter_rounds=4,
            chunk_cycles=32, refill_every=4)
        cfg = par.resolve()
        meta, grid = build_cartesian(cfg)

        m = pmesh.make_mesh(0)
        budgets = pmesh.shard_budget(par.nphotons, n_dev)
        state = engine.init_state(par.batch_size * n_dev)
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        state = state._replace(n_launched=jnp.zeros((n_dev,), jnp.int32))
        state = pmesh.device_put_sharded_state(state, m)
        grid = pmesh.device_put_replicated(grid, m)
        n_shard = jax.device_put(jnp.asarray(budgets, jnp.int32),
                                 NamedSharding(m, P('data')))
        chunk = pmesh.sharded_chunk(engine.make_chunk(cfg, meta), m)

        key0 = jax.random.PRNGKey(12345)

        # warmup: compile + reach steady state (batch fully populated)
        for i in range(3):
            state, tallies, alive, launched = chunk(
                state, grid, jax.random.fold_in(key0, i),
                n_shard, None, None)
            jax.block_until_ready(tallies)

        # timed region
        t0 = time.time()
        nscatt = 0.0
        n_chunks = 8
        for i in range(3, 3 + n_chunks):
            state, tallies, alive, launched = chunk(
                state, grid, jax.random.fold_in(key0, i),
                n_shard, None, None)
            nscatt += to_host_scalar(tallies.nscatt_gas)
        jax.block_until_ready(tallies)
        return nscatt / (time.time() - t0) / n_dev

    rate_per_chip = measure(False)       # analytic-flight fast path
    rate_generic = measure(True)         # generic DDA kernel (the path
    # every velocity-field/dust/file-grid run takes)
    print(json.dumps({
        "metric": "gas scatterings/s/chip, Neufeld slab tau0=1e6 T=1e4",
        "value": rate_per_chip,
        "unit": "scatterings/s/chip",
        "vs_baseline": rate_per_chip / REFERENCE_RANK_RATE,
        "generic_dda_value": rate_generic,
        "generic_dda_vs_baseline": rate_generic / REFERENCE_RANK_RATE,
    }))


if __name__ == '__main__':
    main()
