"""Engine-vs-golden-model parity for the uniform static sphere.

Also exercises the xyz_symmetry reflecting boundaries when --sym is given.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lart_tpu.utils.platform import force_cpu
force_cpu(8)
import time
import numpy as np

from lart_tpu.config import Params
from lart_tpu import driver
from tools.mc_serial import run_sphere

tau0 = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
nph = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
T = float(sys.argv[3]) if len(sys.argv) > 3 else 1e4
sym = '--sym' in sys.argv
n_cells = 65

t0 = time.time()
xf_s, J_s, ns_s, dxf_s = run_sphere(nph, tau0, T=T, seed=3)
print(f"serial: <N_scatt>={ns_s:.2f} esc={J_s.sum()/nph:.4f} "
      f"({time.time()-t0:.0f}s)", flush=True)

par = Params(
    nphotons=nph, temperature=T, taumax=tau0, geometry='sphere', rmax=1.0,
    nx=n_cells, ny=n_cells, nz=n_cells, xyz_symmetry=sym,
    spectral_type='voigt', source_geometry='point',
    batch_size=2048, fly_substeps=8, scatter_rounds=6, chunk_cycles=8,
    n_devices=1,
)
t0 = time.time()
res = driver.run(par, seed=11)
print(f"engine: <N_scatt>={res.nscatt_tot:.2f} ({time.time()-t0:.0f}s)",
      flush=True)
area = 4 * np.pi * 1.0 ** 2
J_e = res.Jout * (nph * res.meta.dxfreq * 2 * np.pi * area)
print(f"engine esc={J_e.sum()/nph:.4f}")
print(f"nscatt ratio engine/serial = {res.nscatt_tot/ns_s:.4f}")
assert abs(res.meta.dxfreq - dxf_s) < 1e-9, (res.meta.dxfreq, dxf_s)
p_s = J_s / J_s.sum()
p_e = J_e / J_e.sum()
sel = (J_s > 20)
chi2 = np.sum((p_e[sel] - p_s[sel]) ** 2
              / (p_s[sel] / J_s.sum() + p_e[sel] / J_e.sum()))
print(f"chi2/dof over {sel.sum()} bins = {chi2/max(sel.sum(),1):.2f}")
