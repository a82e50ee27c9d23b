"""Shearing-box transport (raytrace_to_tau_car_xyper_shear,
reference src/raytrace_car.f90:2677-2954)."""

import numpy as np
import jax
import jax.numpy as jnp

from lart_tpu.config import Params
from lart_tpu.transport import engine
from lart_tpu.grid.cartesian import build_cartesian


def _run(par, n_chunks=800, seed=3):
    cfg = par.resolve()
    meta, grid = build_cartesian(cfg)
    chunk = jax.jit(engine.make_chunk(cfg, meta))
    st = engine.init_state(par.batch_size)
    ns = jnp.asarray([par.nphotons], jnp.int32)
    key = jax.random.PRNGKey(seed)
    jout = 0.0
    for i in range(n_chunks):
        st, tl, alive, launched = chunk(st, grid, jax.random.fold_in(key, i),
                                        ns, None, None)
        jout = jout + np.asarray(tl.Jout, np.float64)
        if int(launched) >= par.nphotons and int(alive) == 0:
            return meta, jout
    raise AssertionError('did not drain')


def _base(om, **kw):
    return Params(nphotons=4000, xy_periodic=True, velocity_type='hubble',
                  Vexp=1.0,   # tiny velocity so the medium is non-static
                  nx=16, ny=16, nz=33, xmax=0.5, ymax=0.5, zmax=1,
                  taumax=100.0, temperature=1e4, distance_unit='kpc',
                  xfreq_min=-40.0, xfreq_max=40.0,
                  Omega=om, q=1.0,
                  batch_size=2048, chunk_cycles=32, fly_substeps=16, **kw)


def test_shear_broadens_spectrum():
    """A strong shear (large velocity jump per x-wrap) must broaden the
    emergent slab spectrum relative to Omega=0, and conserve weight."""
    meta0, j0 = _run(_base(0.0))
    metaS, jS = _run(_base(60.0))
    assert meta0.omega_shear == 0.0
    assert metaS.omega_shear > 1.0        # jump of several Doppler widths
    assert abs(j0.sum() / 4000 - 1.0) < 1e-3
    assert abs(jS.sum() / 4000 - 1.0) < 1e-3
    xc = np.linspace(meta0.xfreq_min + 0.5 * meta0.dxfreq,
                     meta0.xfreq_max - 0.5 * meta0.dxfreq, meta0.nxfreq)

    def rms(j):
        w = j / j.sum()
        mu = (w * xc).sum()
        return np.sqrt((w * (xc - mu) ** 2).sum())

    assert rms(jS) > rms(j0) * 1.1, (rms(j0), rms(jS))
