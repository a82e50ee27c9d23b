"""Quick peel sanity on CPU: optically-thinnish sphere.

Physics checks:
1. The peeled total spectrum (direc+scatt summed over pixels) integrated
   over frequency equals the angle-averaged escaping luminosity: for an
   isotropized radiation field, Sum(peel)*sr_pix*dxfreq ~ 1/(4 pi d^2)
   per unit luminosity -- compare against Jout normalization instead:
   peel spectrum shape == Jout spectrum shape (within MC noise).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lart_tpu.utils.platform import force_cpu
force_cpu(8)
import numpy as np
import time
from lart_tpu.config import Params
from lart_tpu import driver

par = Params(
    nphotons=3000, temperature=1e4, taumax=2.0, geometry='sphere', rmax=1.0,
    nx=33, ny=33, nz=33, spectral_type='voigt', source_geometry='point',
    save_peeloff=True, nxim=33, nyim=33,
    batch_size=1024, fly_substeps=8, scatter_rounds=6, chunk_cycles=2,
    n_devices=1,
)
t0 = time.time()
res = driver.run(par, seed=21)
print(f"run {time.time()-t0:.0f}s  <N_scatt>={res.nscatt_tot:.2f}")
assert res.peel is not None
sc = res.peel['scatt'][0]    # (nxfreq, nxim, nyim)
dr = res.peel['direc'][0]
print("peel cubes finite:", np.all(np.isfinite(sc)), np.all(np.isfinite(dr)))
spec_peel = (sc + dr).sum(axis=(1, 2))

# total flux check: integral of peel over pixels+freq * sr_pix * bin ==
# escaped fraction / (4 pi d^2)... both spectra normalized to unit area:
p1 = spec_peel / spec_peel.sum()
p2 = res.Jout / res.Jout.sum()
# counts for chi2
n_eff = 3000
sel = p2 > 0.005
chi2 = np.sum((p1[sel] - p2[sel]) ** 2 / (p2[sel] / n_eff * 2))
print(f"peel-vs-Jout spectrum chi2/dof = {chi2/sel.sum():.2f} ({sel.sum()} bins)")

# absolute flux: sum(cube)*sr_pix*dxfreq*d^2*4pi/2... direct check:
tot = (sc + dr).sum() * res.obs_meta.steradian_pix * res.meta.dxfreq \
    * res.obs_meta.distance ** 2 * 4 * np.pi
print(f"peel total (should be ~1 = escaped fraction): {tot:.4f}")
