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
