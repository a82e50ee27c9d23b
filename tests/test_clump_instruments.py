"""Clump-medium instruments: peel-off and sight-line maps
(reference raytrace_to_edge_clump*, sightline_tau_clump.f90)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lart_tpu.config import Params
from lart_tpu.transport import engine
from lart_tpu.grid.clump import build_clumps
from lart_tpu.instruments.observer import build_observers


def _par(**kw):
    base = dict(nphotons=3000, use_clump_medium=True, geometry='sphere',
                rmax=1.0, xmax=1, ymax=1, zmax=1,
                clump_radius=0.15, clump_N_clumps=30, clump_tau0=4.0,
                temperature=1e4, xfreq_min=-25.0, xfreq_max=25.0,
                batch_size=2048, chunk_cycles=16)
    base.update(kw)
    return Params(**base)


def test_clump_peel_consistency():
    """Peel spectrum from a clumpy sphere: total escaping flux seen by a
    distant observer must match the angle-averaged Jout to MC noise."""
    # optically thin-ish clumps so directional shadowing by individual
    # clumps stays small and the +z fluence ~ the angle average
    par = _par(save_peeloff=True, nxim=17, nyim=17, clump_tau0=0.5,
               alpha=(0.0,), beta=(0.0,), distance=100.0)
    cfg = par.resolve()
    meta, cmeta, grid = build_clumps(cfg, seed=42)
    obs_meta, odev = build_observers(cfg)
    chunk = jax.jit(engine.make_chunk(cfg, meta, obs_meta, cmeta=cmeta))
    st = engine.init_state(par.batch_size)
    ns = jnp.asarray([par.nphotons], jnp.int32)
    key = jax.random.PRNGKey(7)
    jout = 0.0
    sc = 0.0
    dr = 0.0
    for i in range(400):
        st, tl, alive, launched = chunk(st, grid, jax.random.fold_in(key, i),
                                        ns, odev, None)
        jout = jout + np.asarray(tl.Jout, np.float64)
        sc = sc + np.asarray(tl.peel.scatt, np.float64)
        dr = dr + np.asarray(tl.peel.direc, np.float64)
        if int(launched) >= par.nphotons and int(alive) == 0:
            break
    else:
        raise AssertionError('did not drain')
    assert abs(jout.sum() / par.nphotons - 1.0) < 1e-3
    # peel fluence: sum over cube * 4pi r^2 / nphotons ~ 1 (isotropized)
    r2 = float(np.asarray(odev.pos[0]) @ np.asarray(odev.pos[0]))
    tot = (sc.sum() + dr.sum()) * 4.0 * np.pi * r2 / par.nphotons
    assert 0.85 < tot < 1.15, tot
    assert dr.sum() > 0 and sc.sum() > 0


def test_clump_sightline_tau():
    """Clump sight-line maps: N_gas of the central pixel equals the sum of
    chord columns through the clumps along the axis."""
    from lart_tpu.instruments.sightline import make_sightline
    par = _par(save_peeloff=True, save_sightline_tau=True,
               nxim=9, nyim=9, nxfreq=5, xfreq_min=-3.0, xfreq_max=3.0,
               alpha=(0.0,), beta=(0.0,), distance=50.0)
    cfg = par.resolve()
    meta, cmeta, grid = build_clumps(cfg, seed=9)
    obs_meta, odev = build_observers(cfg)
    sl = make_sightline(cfg, meta, obs_meta, cmeta=cmeta)
    maps = sl(grid, odev, 0)
    assert maps['tau_gas'].shape == (5, 9, 9)
    # brute-force the central pixel column through all clumps
    pos = np.asarray(odev.pos[0])
    k = -pos / np.linalg.norm(pos)
    cx = np.asarray(grid.x, np.float64)
    cy = np.asarray(grid.y, np.float64)
    cz = np.asarray(grid.z, np.float64)
    r2 = np.asarray(grid.r2, np.float64)
    rho = np.asarray(grid.rhokap, np.float64)
    # ray from far outside through the center
    o = pos
    eb = (o[0] - cx) * k[0] + (o[1] - cy) * k[1] + (o[2] - cz) * k[2]
    ec = (o[0] - cx) ** 2 + (o[1] - cy) ** 2 + (o[2] - cz) ** 2 - r2
    det = eb * eb - ec
    chord = 2.0 * np.sqrt(np.maximum(det, 0.0))
    N_expect = float(np.sum(chord * rho) * meta.Dfreq_ref
                     / cfg.line.cross0)
    N_map = maps['N_gas'][4, 4]
    if N_expect > 0:
        assert abs(N_map - N_expect) / N_expect < 0.02, (N_map, N_expect)
