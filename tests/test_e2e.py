"""End-to-end transport tests (small, CPU).

The heavyweight physics validation lives in tools/ (golden-model
comparisons, Neufeld/TPU runs); these are fast smoke + invariant tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lart_tpu.config import Params
from lart_tpu.grid.cartesian import build_cartesian
from lart_tpu.transport import engine


def run_config(par, n_chunks=400, seed=7):
    cfg = par.resolve()
    meta, grid = build_cartesian(cfg)
    from lart_tpu.physics.sources import build_sources
    src = build_sources(cfg, meta, {'rhokap': np.asarray(grid.rhokap)})
    chunk = jax.jit(engine.make_chunk(cfg, meta))
    st = engine.init_state(par.batch_size)
    ns = jnp.asarray([par.nphotons], jnp.int32)
    key = jax.random.PRNGKey(seed)
    tot = {'nsc': 0.0, 'jout': np.zeros(meta.nxfreq),
           'jin': np.zeros(meta.nxfreq), 'jabs': np.zeros(meta.nxfreq)}
    done = False
    for i in range(n_chunks):
        st, tl, alive, launched = chunk(st, grid, jax.random.fold_in(key, i),
                                        ns, None, src)
        tot['nsc'] += float(tl.nscatt_gas)
        tot['jout'] += np.asarray(tl.Jout)
        tot['jin'] += np.asarray(tl.Jin)
        tot['jabs'] += np.asarray(tl.Jabs)
        if int(launched) >= par.nphotons and int(alive) == 0:
            done = True
            break
    return cfg, meta, tot, done


def test_slab_weight_conservation():
    """No dust: every launched photon eventually escapes with weight 1."""
    par = Params(nphotons=300, temperature=1e4, taumax=30.0,
                 xy_periodic=True, nx=1, ny=1, nz=31,
                 batch_size=256, fly_substeps=8, scatter_rounds=6,
                 chunk_cycles=8)
    cfg, meta, tot, done = run_config(par)
    assert done, 'run did not complete'
    esc = tot['jout'].sum() / par.nphotons
    assert abs(esc - 1.0) < 0.01, esc
    assert tot['jin'].sum() == par.nphotons
    # symmetric slab: spectrum symmetric within noise
    mid = meta.nxfreq // 2
    lo, hi = tot['jout'][:mid].sum(), tot['jout'][mid + 1:].sum()
    assert abs(lo - hi) / (lo + hi) < 0.15


def test_dust_albedo_budget():
    """With dust, absorbed + escaped = launched; Jabs fraction sane."""
    # dust optical depth ~ 2.9e-8 * DGR * tau_gas at Lya line center, so an
    # artificially huge DGR makes the dust channel testable at tau0=10
    par = Params(nphotons=300, temperature=1e4, taumax=10.0, DGR=4e6,
                 albedo=0.4, xy_periodic=True, nx=1, ny=1, nz=21,
                 batch_size=256, fly_substeps=8, scatter_rounds=6,
                 chunk_cycles=8)
    cfg, meta, tot, done = run_config(par)
    assert done
    esc = tot['jout'].sum() / par.nphotons
    absd = tot['jabs'].sum() / par.nphotons
    assert abs(esc + absd - 1.0) < 0.02, (esc, absd)
    assert absd > 0.1


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None
