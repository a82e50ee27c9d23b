"""TPU smoke test: run the slab engine on the real chip, measure throughput."""
import sys
import time
import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from lart_tpu.config import Params
from lart_tpu import driver

tau0 = float(sys.argv[1]) if len(sys.argv) > 1 else 1e4
nph = int(float(sys.argv[2])) if len(sys.argv) > 2 else 100_000
T = float(sys.argv[3]) if len(sys.argv) > 3 else 1e4
B = int(float(sys.argv[4])) if len(sys.argv) > 4 else 1 << 17

par = Params(
    nphotons=nph, temperature=T, taumax=tau0, xy_periodic=True,
    nx=1, ny=1, nz=201, spectral_type='voigt', source_geometry='point',
    batch_size=B, fly_substeps=24, scatter_rounds=8, chunk_cycles=32,
)

last = [time.time(), 0]
def prog(l, n, a):
    now = time.time()
    if now - last[0] > 5:
        print(f"  launched {l}/{n} alive {a} t={now-last[0]:.1f}", flush=True)
        last[0] = now

t0 = time.time()
res = driver.run(par, seed=7, progress=prog)
wall = time.time() - t0
total_scatt = res.nscatt_tot * nph
print(f"tau0={tau0} T={T} nph={nph}: <N_scatt>={res.nscatt_tot:.1f} "
      f"wall={wall:.1f}s -> {total_scatt/wall:.3e} scatt/s", flush=True)
print("escaped weight:", res.Jout.sum() * res.meta.dxfreq * 4 * np.pi * nph / nph)
