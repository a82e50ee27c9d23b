"""Engine-vs-golden-model parity comparison on the static slab."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lart_tpu.utils.platform import force_cpu
force_cpu(8)
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import time
import numpy as np

from lart_tpu.config import Params
from lart_tpu import driver
from tools.mc_serial import run_slab

tau0 = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
nph = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
T = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

t0 = time.time()
xf_s, J_s, ns_s, dxf_s = run_slab(nph, tau0, T=T, seed=3)
print(f"serial: <N_scatt>={ns_s:.2f} esc={J_s.sum()/nph:.4f} "
      f"({time.time()-t0:.0f}s)", flush=True)

par = Params(
    nphotons=nph, temperature=T, taumax=tau0, xy_periodic=True,
    nx=1, ny=1, nz=65, spectral_type='voigt', source_geometry='point',
    batch_size=2048, fly_substeps=24, scatter_rounds=8, chunk_cycles=8,
    n_devices=1,
)
t0 = time.time()
res = driver.run(par, seed=11)
print(f"engine: <N_scatt>={res.nscatt_tot:.2f} ({time.time()-t0:.0f}s)",
      flush=True)

# engine Jout normalized; convert back to counts-per-bin to compare shapes
J_e = res.Jout * (nph * res.meta.dxfreq * 2 * np.pi * 2.0)
print(f"engine esc={J_e.sum()/nph:.4f}")
print(f"nscatt ratio engine/serial = {res.nscatt_tot/ns_s:.4f}")

# spectra on same grid? engine auto-grid == serial auto-grid formula
assert abs(res.meta.dxfreq - dxf_s) < 1e-9, (res.meta.dxfreq, dxf_s)
p_s = J_s / J_s.sum()
p_e = J_e / J_e.sum()
# coarse chi2 on bins with decent counts
sel = (J_s > 20)
chi2 = np.sum((p_e[sel] - p_s[sel]) ** 2
              / (p_s[sel] / J_s.sum() + p_e[sel] / J_e.sum()))
print(f"chi2/dof over {sel.sum()} bins = {chi2/max(sel.sum(),1):.2f}")
