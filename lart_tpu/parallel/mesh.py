"""Device mesh and photon-parallel sharding.

The reference parallelizes by striping photon ids across MPI ranks with a
master-worker scheduler and reduces tallies hierarchically over node-shared
memory (reference: src/run_simulation_mod.f90:11-133,
src/memory_mod_mpi.f90:366-394).  On TPU the same photon parallelism is a
1-D `('data',)` mesh: each device owns a contiguous photon budget and a
private lane batch; the grid is replicated; per-chunk tallies are psum-med
over ICI inside the jitted chunk.  Dynamic load balancing is unnecessary --
lane compaction/refill keeps every device's batch dense, so work per chunk is
uniform by construction.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ('data',))


def shard_budget(nphotons: int, n_dev: int) -> np.ndarray:
    """Contiguous photon budget per device; sums exactly to nphotons."""
    base = nphotons // n_dev
    extra = nphotons % n_dev
    return np.array([base + (1 if d < extra else 0) for d in range(n_dev)],
                    np.int32)


def sharded_chunk(chunk_fn, mesh: Mesh):
    """Wrap a per-device chunk into a psum-reducing sharded function.

    chunk_fn(state, grid, key, n_shard) -> (state, tallies, alive, launched)
    Batch arrays are sharded along 'data'; grid is replicated; returned
    tallies/alive/launched are psum-med over ICI and replicated.

    Single-device meshes skip shard_map/psum entirely: collectives are
    pointless there and some experimental TPU transports compile collective
    programs orders of magnitude slower than plain programs.
    """
    if len(mesh.devices.ravel()) == 1:
        jitted = jax.jit(
            lambda state, grid, key, n_shard, odev, src, n_cycles:
            chunk_fn(state, grid, key, n_shard, odev, src, n_cycles))

        def single(state, grid, key, n_shard, odev=None, src=None,
                   n_cycles=None):
            if n_cycles is None:
                n_cycles = -1    # sentinel: chunk uses its static count
            return jitted(state, grid, key, n_shard, odev, src,
                          jnp.asarray(n_cycles, jnp.int32))
        return single

    def wrapped(state, grid, key, n_shard, odev, src, n_cycles):
        # decorrelate device RNG streams
        key = jax.random.fold_in(key, jax.lax.axis_index('data'))
        state, tallies, alive, launched = chunk_fn(
            state, grid, key, n_shard, odev, src, n_cycles)
        tallies = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, 'data'), tallies)
        alive = jax.lax.psum(alive, 'data')
        launched = jax.lax.psum(launched, 'data')
        return state, tallies, alive, launched

    spec_state = P('data')
    inner = jax.jit(shard_map(
        wrapped, mesh=mesh,
        in_specs=(spec_state, P(), P(), P('data'), P(), P(), P()),
        out_specs=(spec_state, P(), P(), P()),
        check_vma=False))

    def call(state, grid, key, n_shard, odev=None, src=None,
             n_cycles=None):
        if n_cycles is None:
            n_cycles = jnp.int32(-1)   # sentinel: never passed (driver
        # always supplies a value); kept so positional call sites with 6
        # args keep working
        return inner(state, grid, key, n_shard, odev, src,
                     jnp.asarray(n_cycles, jnp.int32))
    return call


def device_put_sharded_state(state, mesh: Mesh):
    """Place a host-constructed global state with batch axis sharded.

    ONE pytree-batched device_put (not per-leaf): on the tunneled TPU
    each transfer RPC carries multi-second latency, so per-leaf puts
    turn setup into minutes."""
    sh = NamedSharding(mesh, P('data'))
    return jax.device_put(state, sh)


def device_put_replicated(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
