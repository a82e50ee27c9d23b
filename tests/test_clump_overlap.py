"""Overlapping-clump transport (reference raytrace_to_tau_clump_overlap,
src/raytrace_clump.f90:668-788): chord-overlap integral + bisection scatter
point + opacity-weighted owner sampling."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lart_tpu.config import Params
from lart_tpu.transport import engine


def _run_clump(par, meta, cmeta, grid, n_chunks=400, seed=11):
    cfg = par.resolve()
    chunk = jax.jit(engine.make_chunk(cfg, meta, cmeta=cmeta))
    st = engine.init_state(par.batch_size)
    ns = jnp.asarray([par.nphotons], jnp.int32)
    key = jax.random.PRNGKey(seed)
    nsc = 0.0
    jout = None
    for i in range(n_chunks):
        st, tl, alive, launched = chunk(st, grid, jax.random.fold_in(key, i),
                                        ns, None, None)
        nsc += float(tl.nscatt_gas)
        jout = (jout if jout is not None else 0.0) + np.asarray(tl.Jout,
                                                                np.float64)
        if int(launched) >= par.nphotons and int(alive) == 0:
            break
    else:
        raise AssertionError('did not drain')
    return nsc / par.nphotons, jout


def _base_par(**kw):
    base = dict(nphotons=4000, use_clump_medium=True,
                geometry='sphere', rmax=1.0,
                xmax=1, ymax=1, zmax=1,
                clump_radius=0.15, clump_N_clumps=40,
                clump_tau0=5.0, temperature=1e4,
                xfreq_min=-30.0, xfreq_max=30.0,
                batch_size=2048, chunk_cycles=16)
    base.update(kw)
    return Params(**base)


def test_overlap_matches_nonoverlap_population():
    """On a non-overlapping RSA population, overlap=True transport must be
    statistically identical to the non-overlap walker."""
    from lart_tpu.grid.clump import build_clumps
    par_no = _base_par(clump_allow_overlap=False, nphotons=20000)
    cfg_no = par_no.resolve()
    meta, cmeta, grid = build_clumps(cfg_no, seed=99)

    par_ov = _base_par(clump_allow_overlap=True, nphotons=20000)
    # same population: reuse the same grid/cmeta, only the kernel changes;
    # average two seeds per mode (seed-to-seed sigma of <N_scatt> is ~0.06
    # at 20k photons for this config)
    n1, jout_no = _run_clump(par_no, meta, cmeta, grid, seed=21)
    n2, _ = _run_clump(par_no, meta, cmeta, grid, seed=23)
    o1, jout_ov = _run_clump(par_ov, meta, cmeta, grid, seed=22)
    o2, _ = _run_clump(par_ov, meta, cmeta, grid, seed=24)
    nsc_no, nsc_ov = 0.5 * (n1 + n2), 0.5 * (o1 + o2)

    assert nsc_no > 0.5           # the population actually scatters
    assert abs(nsc_ov - nsc_no) / nsc_no < 0.05, (nsc_ov, nsc_no)
    # escaped-weight conservation in both modes
    assert abs(jout_no.sum() / par_no.nphotons - 1.0) < 1e-3
    assert abs(jout_ov.sum() / par_ov.nphotons - 1.0) < 1e-3
    # spectral shape agreement (coarse chi2 on rebinned spectra)
    a = jout_no.reshape(-1, 11).sum(axis=1)
    b = jout_ov.reshape(-1, 11).sum(axis=1)
    sel = (a + b) > 40
    chi2 = np.sum((a[sel] - b[sel]) ** 2 / (a[sel] + b[sel]))
    assert chi2 < 3.0 * sel.sum(), chi2


def test_overlap_colocated_pair_equals_single():
    """Two co-located clumps with half the opacity each must transport
    exactly like one clump at full opacity (additive-opacity check)."""
    from lart_tpu.grid.clump import build_clumps, ClumpMeta
    par1 = _base_par(clump_N_clumps=1, clump_tau0=8.0,
                     clump_radius=0.4, nphotons=4000)
    cfg1 = par1.resolve()
    meta, cmeta1, grid1 = build_clumps(cfg1, seed=5)

    # duplicate the clump: two ids, half rhokap, K=2 table
    def dup(a, scale=1.0):
        h = np.asarray(a)
        return jnp.asarray(np.concatenate([h * scale, h * scale]))

    tab = np.asarray(grid1.table)
    tab2 = np.full((tab.shape[0], 2), -1, np.int32)
    hit = tab[:, 0] >= 0
    tab2[hit, 0] = 0
    tab2[hit, 1] = 1
    grid2 = grid1._replace(
        x=dup(grid1.x), y=dup(grid1.y), z=dup(grid1.z),
        r2=dup(grid1.r2), radius=dup(grid1.radius),
        rhokap=dup(grid1.rhokap, 0.5),
        vx=dup(grid1.vx), vy=dup(grid1.vy), vz=dup(grid1.vz),
        table=jnp.asarray(tab2))
    cmeta2 = dataclasses.replace(cmeta1, n_clumps=2, K=2)

    par2 = _base_par(clump_N_clumps=1, clump_tau0=8.0, clump_radius=0.4,
                     nphotons=4000, clump_allow_overlap=True)

    # STRONG invariant: the overlap walker on the duplicated half-opacity
    # pair must match the overlap walker on the single full-opacity clump
    # essentially exactly (identical RNG stream, additive opacity)
    nsc_s, jout_s = _run_clump(par2, meta, cmeta1, grid1, seed=31)
    nsc_p, jout_p = _run_clump(par2, meta, cmeta2, grid2, seed=31)
    assert nsc_s > 0.2
    assert abs(nsc_p - nsc_s) / nsc_s < 1e-4, (nsc_s, nsc_p)
    assert np.allclose(jout_s, jout_p, rtol=1e-3, atol=1e-6)

    # and the overlap walker agrees with the non-overlap walker to MC noise
    nsc1, jout1 = _run_clump(par1, meta, cmeta1, grid1, seed=31)
    assert abs(nsc_s - nsc1) / nsc1 < 0.15, (nsc1, nsc_s)
    assert abs(jout_p.sum() / par2.nphotons - 1.0) < 1e-3


def test_clump_temperature_broadens_spectrum():
    """clump_temperature != temperature: a hotter single clump must emit a
    broader escape spectrum (widths in reference Doppler units scale as
    sqrt(T_cl/T_ref)); voigt_clump local-unit machinery,
    clump_mod.f90:130-168."""
    widths = {}
    for T_cl in (1e4, 9e4):
        par = _base_par(clump_N_clumps=1, clump_tau0=300.0,
                        clump_radius=0.5, nphotons=4000,
                        clump_temperature=T_cl,
                        xfreq_min=-60.0, xfreq_max=60.0)
        cfg = par.resolve()
        from lart_tpu.grid.clump import build_clumps
        meta, cmeta, grid = build_clumps(cfg, seed=77)
        # force the clump onto the origin so the source is inside it
        import jax.numpy as jnp
        grid = grid._replace(x=jnp.zeros_like(grid.x),
                             y=jnp.zeros_like(grid.y),
                             z=jnp.zeros_like(grid.z))
        assert (meta.Dfreq_cl > 0) == (T_cl != 1e4) or T_cl == 1e4
        nsc, jout = _run_clump(par, meta, cmeta, grid, seed=3)
        xc = np.linspace(meta.xfreq_min, meta.xfreq_max, par.nxfreq)
        w = jout / jout.sum()
        mu = (w * xc).sum()
        widths[T_cl] = np.sqrt((w * (xc - mu) ** 2).sum())
    # expected ratio = (T2/T1)^(1/2) for Doppler width; escape-wing
    # scaling for a thick uniform sphere goes as (a tau0)^(1/3) * vth ~
    # allow generous bounds around sqrt(9) = 3
    ratio = widths[9e4] / widths[1e4]
    assert 1.5 < ratio < 4.5, (widths, ratio)
