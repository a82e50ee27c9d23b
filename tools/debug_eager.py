"""Step the engine eagerly at tiny scale to find logic errors."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lart_tpu.utils.platform import force_cpu
force_cpu(8)

import numpy as np
import jax
import jax.numpy as jnp
from lart_tpu.config import Params
from lart_tpu.grid.cartesian import build_cartesian
from lart_tpu.transport import engine

par = Params(
    nphotons=16, temperature=10.0, taumax=10.0, xy_periodic=True,
    nx=1, ny=1, nz=9, spectral_type='voigt', source_geometry='point',
    batch_size=8, fly_substeps=8, scatter_rounds=4, chunk_cycles=4,
)
cfg = par.resolve()
meta, grid = build_cartesian(cfg)
print("meta:", {k: getattr(meta, k) for k in
                ('nx', 'ny', 'nz', 'dz', 'zmin', 'bc_x', 'bc_y', 'bc_z',
                 'xfreq_min', 'xfreq_max', 'nxfreq', 'taumax', 'tauhomo',
                 'uniform_temperature', 'static_medium')})
print("rhokap[0,0,:3] =", np.asarray(grid.rhokap[0, 0, :3]))

cycle = engine.make_cycle(cfg, meta)
state = engine.init_state(8)
tall = engine.zero_tallies(meta.nxfreq)
n_shard = jnp.asarray([16], jnp.int32)
key = jax.random.PRNGKey(0)

for i in range(40):
    state, tall = cycle(state, grid, tall, jax.random.fold_in(key, i), n_shard)
    ph = np.asarray(state.phase)
    print(f"cyc {i}: phases {np.bincount(ph, minlength=4)} "
          f"launched {int(state.n_launched[0])} "
          f"nsc {float(tall.nscatt_gas):.1f} "
          f"Jout {float(tall.Jout.sum()):.3f} Jin {float(tall.Jin.sum()):.1f}")
    if int(state.n_launched[0]) >= 16 and np.all(ph == 0):
        print("DONE")
        break
