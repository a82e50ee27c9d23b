"""Interactive debug: small Neufeld slab run on CPU devices."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lart_tpu.utils.platform import force_cpu
force_cpu(8)
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import time
import numpy as np
from lart_tpu.config import Params
from lart_tpu import driver

par = Params(
    nphotons=2000, temperature=10.0, taumax=1e4, xy_periodic=True,
    nx=1, ny=1, nz=65, xmax=1.0, ymax=1.0, zmax=1.0,
    spectral_type='voigt', source_geometry='point',
    batch_size=1024, fly_substeps=24, scatter_rounds=6, chunk_cycles=16,
    n_devices=1,
)

t0 = time.time()
res = driver.run(par, seed=42,
                 progress=lambda l, n, a: print(f"  launched {l}/{n} alive {a}"))
print(f"wall {time.time()-t0:.1f}s  <N_scatt>={res.nscatt_tot:.1f}")
print("Jout sum * dxfreq * 4pi =", res.Jout.sum() * res.meta.dxfreq * 4 * np.pi)
print("Jin  sum * dxfreq * 4pi =", res.Jin.sum() * res.meta.dxfreq * 4 * np.pi)
print("xfreq range", res.meta.xfreq_min, res.meta.xfreq_max, res.meta.nxfreq)
print("taumax/tauhomo:", res.meta.taumax, res.meta.tauhomo, "atau3", res.meta.atau3)
