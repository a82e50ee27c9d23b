"""All-photons output table (save_all_photons; all_photons_type,
reference define.f90:602-613, run_simulation_mod.f90:244-357)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lart_tpu.config import Params
from lart_tpu.transport import engine
from lart_tpu.grid.cartesian import build_cartesian


def test_allphotons_rows():
    par = Params(nphotons=3000, geometry='sphere', rmax=1.0,
                 nx=17, ny=17, nz=17, xmax=1, ymax=1, zmax=1,
                 taumax=2.0, temperature=1e4,
                 xfreq_min=-30.0, xfreq_max=30.0,
                 save_all_photons=True,
                 batch_size=1024, chunk_cycles=16)
    cfg = par.resolve()
    meta, grid = build_cartesian(cfg)
    chunk = jax.jit(engine.make_chunk(cfg, meta))
    st = engine.init_state(par.batch_size)
    ns = jnp.asarray([par.nphotons], jnp.int32)
    key = jax.random.PRNGKey(2)
    acc = {}
    for i in range(300):
        st, tl, alive, launched = chunk(st, grid, jax.random.fold_in(key, i),
                                        ns, None, None)
        for k in tl.allph._fields:
            v = getattr(tl.allph, k)
            if v is not None:
                acc[k] = acc.get(k, 0.0) + np.asarray(v, np.float64)
        if int(launched) >= par.nphotons and int(alive) == 0:
            break
    else:
        raise AssertionError('did not drain')

    n = par.nphotons
    # every photon has birth and death rows
    assert acc['xfreq1'].shape == (n,)
    # birth frequencies are Voigt-distributed around 0
    assert abs(np.mean(acc['xfreq1'])) < 0.05
    assert 0.5 < np.std(acc['xfreq1']) < 1.0
    # escape frequencies are broadened by resonant scattering at tau=2
    assert np.std(acc['xfreq2']) > np.std(acc['xfreq1'])
    # mean scattering count matches the tally-level <N_scatt> scale
    nsg = acc['nscatt_gas']
    assert 0.5 < nsg.mean() < 4.0
    # impact parameters: sphere-crossing rays give rp <= rmax; rays that
    # escape through cube corners without re-crossing the sphere can reach
    # sqrt(3)*rmax (same in the reference, which uses the identical
    # projection)
    assert acc['rp'].max() <= np.sqrt(3.0) + 1e-4
    assert np.quantile(acc['rp'], 0.95) <= 1.0 + 1e-4
    assert acc['rp'].min() >= 0.0
    # birth at the center (point source): rp0 == 0
    assert np.allclose(acc['rp0'], 0.0, atol=1e-5)


def test_allphotons_multidevice_and_amr(tmp_path):
    """VERDICT round-1 item 8: allph on >1 device (global pid offsets via
    the [budget, offset] n_shard columns) and on the AMR grid backend."""
    import jax
    from lart_tpu import driver
    from lart_tpu.grid.amr import make_amr_sphere, write_generic_amr

    # --- multi-device Cartesian: 8 shards, disjoint pid ranges
    par = Params(nphotons=900, geometry='sphere', rmax=1.0,
                 nx=17, ny=17, nz=17, xmax=1, ymax=1, zmax=1,
                 taumax=2.0, temperature=1e4,
                 xfreq_min=-30.0, xfreq_max=30.0,
                 save_all_photons=True,
                 batch_size=128, chunk_cycles=8, refill_every=2)
    res = driver.run(par, seed=9)
    assert len(jax.devices()) == 8
    ap = res.allph
    assert ap['xfreq1'].shape == (900,)
    # every pid written exactly once: birth spectra Voigt-like, no zero
    # gaps from id collisions (a collision would double-add one row and
    # leave another at exactly 0 weight/frequency in BOTH columns)
    assert 0.4 < np.std(ap['xfreq1']) < 1.2
    both_zero = np.logical_and(ap['xfreq1'] == 0.0, ap['nscatt_gas'] == 0.0)
    assert both_zero.mean() < 0.02
    assert ap['rp'].max() <= np.sqrt(3.0) + 1e-4

    # --- AMR grid backend
    data = make_amr_sphere(n_base=8, levels_extra=1, rmax=1.0, T=1e4)
    path = str(tmp_path / 'ap_amr.h5')
    write_generic_amr(path, data)
    par_a = Params(nphotons=400, use_amr_grid=True, amr_file=path,
                   geometry='sphere', rmax=1.0, taumax=2.0,
                   temperature=1e4, xfreq_min=-30.0, xfreq_max=30.0,
                   save_all_photons=True, n_devices=1,
                   batch_size=256, chunk_cycles=8, refill_every=2)
    res_a = driver.run(par_a, seed=4)
    ap_a = res_a.allph
    assert ap_a['xfreq2'].shape == (400,)
    # deaths recorded: escape frequencies broadened vs birth
    assert np.std(ap_a['xfreq2']) > np.std(ap_a['xfreq1'])
    assert np.quantile(ap_a['rp'], 0.95) <= 1.0 + 1e-4


def test_allphotons_clump(tmp_path):
    """Clump-medium allph: escape deaths must be recorded (ADVICE r2:
    make_fly_clump previously had no death-recording carry, so xfreq2 and
    nscatt-at-death silently stayed zero)."""
    from lart_tpu import driver
    from lart_tpu.grid.clump import save_clumps

    cpath = str(tmp_path / 'one_clump.h5')
    save_clumps(cpath, np.zeros((1, 3)), np.array([1.0]), sphere_R=1.0)
    par = Params(nphotons=400, use_clump_medium=True,
                 clump_input_file=cpath, clump_tau0=5.0,
                 geometry='sphere', rmax=1.0, temperature=1e4,
                 xfreq_min=-30.0, xfreq_max=30.0,
                 save_all_photons=True, n_devices=1,
                 batch_size=256, chunk_cycles=8, refill_every=2)
    res = driver.run(par, seed=11)
    ap = res.allph
    assert ap['xfreq2'].shape == (400,)
    # deaths actually recorded: resonant scattering broadens the escape
    # frequencies, and the scattering counters are nonzero at tau0=5
    assert np.std(ap['xfreq2']) > np.std(ap['xfreq1'])
    assert ap['nscatt_gas'].mean() > 0.5
    assert np.quantile(ap['rp'], 0.95) <= 1.0 + 1e-4


def test_allphotons_in_output_file(tmp_path):
    from lart_tpu import driver
    from lart_tpu.io.writer import write_output
    import h5py
    par = Params(nphotons=500, geometry='sphere', rmax=1.0,
                 nx=9, ny=9, nz=9, xmax=1, ymax=1, zmax=1,
                 taumax=0.5, temperature=1e4,
                 xfreq_min=-20.0, xfreq_max=20.0,
                 save_all_photons=True, n_devices=1,
                 batch_size=512, chunk_cycles=8,
                 out_file=str(tmp_path / 'ap.h5'))
    res = driver.run(par)
    assert res.allph is not None
    fn = write_output(par.out_file, res)
    with h5py.File(fn) as f:
        assert 'AllPhotons' in f
        assert f['AllPhotons/xfreq2'].shape == (500,)
