"""Cross-grid parity: same uniform sphere on Cartesian vs AMR backends.

The reference's strongest regression check (examples/amr_sphere_generic:
identical <N_scatt> from both grid backends)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lart_tpu.utils.platform import force_cpu
force_cpu(8)
import time
import numpy as np
import jax
import jax.numpy as jnp

from lart_tpu.config import Params
from lart_tpu.grid.cartesian import build_cartesian
from lart_tpu.grid.amr import build_amr, make_amr_sphere
from lart_tpu.transport import engine

tau0 = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
nph = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

def run(meta, dev, cfg, B=1024, seed=5):
    chunk = jax.jit(engine.make_chunk(cfg, meta))
    st = engine.init_state(B)
    ns = jnp.asarray([nph], jnp.int32)
    key = jax.random.PRNGKey(seed)
    acc_ns = 0.0
    Jout = np.zeros(meta.nxfreq)
    for i in range(400):
        st, tl, alive, launched = chunk(st, dev, jax.random.fold_in(key, i),
                                        ns, None)
        acc_ns += float(tl.nscatt_gas)
        Jout += np.asarray(tl.Jout)
        if int(launched) >= nph and int(alive) == 0:
            break
    return acc_ns / nph, Jout

# Cartesian 32^3 sphere
par_c = Params(nphotons=nph, temperature=1e4, taumax=tau0, geometry='sphere',
               rmax=1.0, nx=32, ny=32, nz=32, spectral_type='voigt',
               batch_size=1024, fly_substeps=8, scatter_rounds=6,
               chunk_cycles=8)
cfg_c = par_c.resolve()
meta_c, dev_c = build_cartesian(cfg_c)
t0 = time.time()
ns_c, J_c = run(meta_c, dev_c, cfg_c)
print(f"cartesian: <N_scatt>={ns_c:.3f} esc={J_c.sum()/nph:.4f} "
      f"({time.time()-t0:.0f}s)", flush=True)

# AMR: 16^3 base + refinement to level 5 inside r<0.5 (same physics)
par_a = Params(nphotons=nph, temperature=1e4, taumax=tau0, geometry='sphere',
               rmax=1.0, spectral_type='voigt',
               batch_size=1024, fly_substeps=8, scatter_rounds=6,
               chunk_cycles=8)
cfg_a = par_a.resolve()
data = make_amr_sphere(n_base=16, levels_extra=1, rmax=1.0, T=1e4)
res = build_amr(cfg_a, data=data)
print(f"amr grid: nleaf={res.tree.nleaf} ncells={res.tree.ncells} "
      f"levelmax={res.tree.levelmax} taumax={res.meta.taumax:.2f} "
      f"xfreq=[{res.meta.xfreq_min},{res.meta.xfreq_max}]", flush=True)
t0 = time.time()
ns_a, J_a = run(res.meta, res.dev, cfg_a)
print(f"amr:       <N_scatt>={ns_a:.3f} esc={J_a.sum()/nph:.4f} "
      f"({time.time()-t0:.0f}s)", flush=True)
print(f"N_scatt ratio amr/car = {ns_a/ns_c:.4f}")
assert abs(res.meta.dxfreq - meta_c.dxfreq) < 1e-9
p1 = J_c / max(J_c.sum(), 1)
p2 = J_a / max(J_a.sum(), 1)
sel = J_c > 20
chi2 = np.sum((p1[sel] - p2[sel]) ** 2
              / (p1[sel] / J_c.sum() + p2[sel] / J_a.sum()))
print(f"spectrum chi2/dof over {sel.sum()} bins = {chi2/max(sel.sum(),1):.2f}")
