"""Per-stage timing of the transport engine on the current default backend."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from lart_tpu.config import Params
from lart_tpu.grid.cartesian import build_cartesian
from lart_tpu.transport import engine

B = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1 << 17
SUB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
RND = int(sys.argv[3]) if len(sys.argv) > 3 else 4

par = Params(nphotons=10**9, temperature=1e4, taumax=1e4, xy_periodic=True,
             nx=1, ny=1, nz=201, spectral_type='voigt',
             batch_size=B, fly_substeps=SUB, scatter_rounds=RND,
             chunk_cycles=16)
cfg = par.resolve()
meta, grid = build_cartesian(cfg)

fly = engine.make_fly(cfg, meta)
scatter = engine.make_scatter(cfg, meta)
refill = engine.make_refill(cfg, meta)
chunk = engine.make_chunk(cfg, meta)

state = engine.init_state(B)
tall = engine.zero_tallies(meta.nxfreq)
n_shard = jnp.asarray([10**9], jnp.int32)
key = jax.random.PRNGKey(0)

j_refill = jax.jit(lambda s, t, k: refill(s, grid, t, k, n_shard))
j_fly = jax.jit(lambda s, t: fly(s, grid, t, SUB))
j_scatter = jax.jit(lambda s, t, k: scatter(s, grid, t, k))
j_chunk = jax.jit(lambda s, k: chunk(s, grid, k, n_shard))

def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:12s} {dt*1e3:9.3f} ms  ({dt/B*1e9:7.2f} ns/lane)", flush=True)
    return out

# warm the batch into a realistic mixed-phase population
state, tall = j_refill(state, tall, key)
state, tall = j_fly(state, tall)
for i in range(10):
    state, tall = j_refill(state, tall, jax.random.fold_in(key, i))
    state, tall = j_fly(state, tall)
    state, tall = j_scatter(state, tall, jax.random.fold_in(key, 1000 + i))
ph = np.bincount(np.asarray(state.phase), minlength=4)
print(f"B={B} sub={SUB} rnd={RND}  phases after warmup: {ph}", flush=True)

timeit("refill", j_refill, state, tall, key)
timeit("fly", j_fly, state, tall)
timeit("scatter", j_scatter, state, tall, key)
timeit("chunk16", j_chunk, state, key, reps=3)
