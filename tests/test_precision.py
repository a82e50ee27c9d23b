"""f32 in-chunk tally accumulation error bound (VERDICT round-1 item 10).

The reference mandates f64 for the in-medium J / P_alpha deposit arrays
(define.f90:203-205).  The TPU engine instead scatter-adds f32 on device
within one jitted chunk (chunk_cycles cycles) and accumulates chunks into
host f64 (driver.py).  These tests bound the residual f32 error of the
in-chunk window:

1. test_chunk_f32_vs_cycle_flushed_f64 -- runs the IDENTICAL RNG stream
   (chunk.cycle exposes the per-iteration fold_in) once as a full f32
   chunk and once flushed to host f64 after every cycle, and asserts the
   J1/Pa/Pnew/Jout totals agree to a tight relative tolerance.  State
   evolution does not depend on tally contents, so the two paths differ
   ONLY in summation grouping/precision.
2. test_scatter_add_error_at_production_scale -- pure-numerics worst case
   at full production deposit counts (batch 2^17 x 32 cycles, every
   deposit landing in few bins): f32 .at[].add vs f64 sum.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lart_tpu.config import Params
from lart_tpu.transport import engine
from lart_tpu.grid.cartesian import build_cartesian


def _tally_arrays(tl):
    out = {}
    for k in ('Jout', 'Jin', 'J1', 'Pa', 'Pnew'):
        v = getattr(tl, k, None)
        if v is not None:
            out[k] = np.asarray(v, np.float64)
    return out


def test_chunk_f32_vs_cycle_flushed_f64():
    # sphere with CALCJ/CALCP/CALCPnew on: the deposit-heaviest mode
    # (one scatter-add per fly substep per lane into J1, one per
    # scattering into Pa)
    par = Params(nphotons=1 << 30, geometry='sphere', rmax=1.0,
                 nx=33, ny=33, nz=33, taumax=1e4, temperature=1e4,
                 core_skip=True, calcJ=True, calcP=True, calcPnew=True,
                 xfreq_min=-40.0, xfreq_max=40.0, nxfreq=129,
                 batch_size=1 << 12, fly_substeps=8, scatter_rounds=4,
                 chunk_cycles=32, refill_every=4)
    cfg = par.resolve()
    meta, grid = build_cartesian(cfg)
    chunk = engine.make_chunk(cfg, meta)
    cycle = jax.jit(chunk.cycle, static_argnums=())
    chunk_j = jax.jit(chunk)

    key = jax.random.PRNGKey(3)
    ns = jnp.asarray([par.nphotons], jnp.int32)

    # --- production path: one f32 chunk of 32 cycles
    st = engine.init_state(par.batch_size)
    st1, tl1, _, _ = chunk_j(st, grid, key, ns, None, None)
    prod = _tally_arrays(tl1)

    # --- reference path: same stream, flush to f64 every cycle
    st = engine.init_state(par.batch_size)
    acc = None
    tl_zero = None
    for i in range(par.chunk_cycles):
        if tl_zero is None:
            tl = engine.zero_tallies(
                meta.nxfreq, nbin_JPa=meta.nbin_JPa, calcJ=True,
                calcP=True, calcPnew=True)
            tl_zero = jax.tree.map(
                lambda a: jnp.zeros_like(a) if a is not None else None, tl,
                is_leaf=lambda x: x is None)
        st, tl = cycle(jnp.int32(i), st, grid, tl_zero, key, ns)
        arrs = _tally_arrays(tl)
        if acc is None:
            acc = arrs
        else:
            for k in acc:
                acc[k] = acc[k] + arrs[k]

    # states must be bitwise identical (tally precision cannot leak into
    # the transport)
    np.testing.assert_array_equal(np.asarray(st1.x), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(st1.xfreq),
                                  np.asarray(st.xfreq))

    checked = 0
    for k in prod:
        a, b = prod[k], acc[k]
        if b.sum() < 1e-6:
            # tally not meaningfully populated in this window (e.g. Jout
            # before any escapes at tau0=1e4): nothing to bound
            continue
        checked += 1
        # total mass agrees to ~f32 roundoff of the accumulation window
        assert abs(a.sum() - b.sum()) / b.sum() < 2e-5, (k, a.sum(), b.sum())
        # per-bin: relative to the max bin (empty bins are exactly equal)
        rel = np.abs(a - b) / b.max()
        assert rel.max() < 5e-5, (k, rel.max())
    # the deposit-heavy tallies must actually have been checked
    assert checked >= 3, checked


def test_scatter_add_error_at_production_scale():
    """Worst-case pure-numerics bound: production chunk deposit count
    (2^17 lanes x 32 cycles x 8 substeps ~ 3.4e7 J1 deposits) all landing
    in 64 bins, weights ~U(0.3, 1) -- f32 device scatter-add vs f64."""
    n_dep = 1 << 25                      # 3.36e7
    n_bins = 64
    key = jax.random.PRNGKey(0)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (n_dep,), jnp.float32, 0.3, 1.0)
    b = jax.random.randint(kb, (n_dep,), 0, n_bins)
    f32 = jnp.zeros((n_bins,), jnp.float32).at[b].add(w)
    f64 = np.zeros(n_bins)
    np.add.at(f64, np.asarray(b), np.asarray(w, np.float64))
    rel = np.abs(np.asarray(f32, np.float64) - f64) / f64
    # ~5e5 adds/bin; random-walk rounding ~ sqrt(n)*eps ~ 4e-5; assert a
    # comfortable production bound well below MC noise (1/sqrt(n) ~ 1e-3)
    assert rel.max() < 3e-4, rel.max()
