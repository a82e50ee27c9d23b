"""Metal-ion density model ``ion_model='solar_cie'`` for AMR grids.

Checks the Asplund+09 x Gnat-Sternberg CIE ion densities against the
reference formulas (reference: src/ion_data_mod.f90:64-200) at sampled
(T, Z), and that an AMR grid built with the model transports photons
(the round-1 crash path: grid/amr.py importing grid/ion_data.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from lart_tpu.config import Params
from lart_tpu.grid.ion_data import (Z_SUN, cie_ion_fraction, cie_xHI,
                                    solar_abundance, solar_ion_density)


def test_solar_abundances():
    # Asplund+09 Table 1 values (ion_data_mod.f90:40-49)
    assert solar_abundance('H  I') == 1.0
    assert abs(solar_abundance('Si II') - 3.236e-5) < 1e-9
    assert abs(solar_abundance('Si IV') - 3.236e-5) < 1e-9
    assert abs(solar_abundance('Fe II') - 3.162e-5) < 1e-9
    assert abs(solar_abundance('Mg II') - 3.981e-5) < 1e-9
    assert abs(solar_abundance('O VI') - 4.898e-4) < 1e-9
    assert solar_abundance('Xx IX') == 0.0


def test_cie_hydrogen_neutral_fraction():
    # rate-equation xHI at T=1e4 K (ion_data_mod.f90:200-209)
    k_ion = 5.84862e-9 * math.exp(-15.78215)
    k_rec = 4.13e-13
    expect = k_rec / (k_ion + k_rec)
    got = float(cie_xHI(1e4))
    assert abs(got - expect) / expect < 1e-12
    # cold gas fully neutral, hot gas ionized
    assert float(cie_xHI(100.0)) > 0.999999
    assert float(cie_xHI(1e7)) < 1e-4


def test_cie_metal_fractions_at_peak():
    # Gaussian fits peak at (logT_peak, f_peak) (ion_data_mod.f90:113-157)
    for ion, logT_peak, f_peak in [('Si II', 4.30, 0.70),
                                   ('Fe II', 4.35, 0.70),
                                   ('C IV', 5.05, 0.29),
                                   ('O VI', 5.45, 0.20),
                                   ('Mg II', 4.35, 0.70)]:
        f = float(cie_ion_fraction(ion, 10.0 ** logT_peak))
        assert abs(f - f_peak) < 1e-12, ion
        # one sigma away: f_peak * exp(-1/2)
        # width check for Si II (sigma=0.20)
    f1 = float(cie_ion_fraction('Si II', 10.0 ** (4.30 + 0.20)))
    assert abs(f1 - 0.70 * math.exp(-0.5)) < 1e-12


def test_solar_ion_density_values():
    nH, Z, T = 2.5, 0.5 * Z_SUN, 10.0 ** 4.35
    # metals scale with Z/Z_sun (ion_data_mod.f90:171-193)
    got = float(solar_ion_density(nH, Z, T, 'Fe II'))
    expect = nH * 0.5 * 3.162e-5 * 0.70
    assert abs(got - expect) / expect < 1e-12
    # hydrogen ignores Z
    gh = float(solar_ion_density(nH, 0.0, 1e4, 'H  I'))
    assert abs(gh - nH * float(cie_xHI(1e4))) < 1e-15
    # helium uses A_He, no Z scaling
    ghe = float(solar_ion_density(nH, 0.0, 10.0 ** 4.25, 'He I'))
    assert abs(ghe - nH * 8.511e-2 * 0.95) / ghe < 1e-12
    # vectorized over arrays
    arr = solar_ion_density(np.full(4, nH), np.full(4, Z), np.full(4, T),
                            'Si II')
    assert arr.shape == (4,)


def test_amr_solar_cie_builds_and_transports():
    """The round-1 crash: ion_model='solar_cie' AMR build + transport."""
    from lart_tpu.grid.amr import build_amr, make_amr_sphere
    from lart_tpu.transport import engine

    for line_id in ('SiII_1527', 'FeII_2600'):
        par = Params(nphotons=200, use_amr_grid=True, geometry='sphere',
                     line_id=line_id, ion_model='solar_cie',
                     metallicity_global=Z_SUN, tauhomo=1.0,
                     temperature=2e4, xfreq_min=-20.0, xfreq_max=20.0,
                     batch_size=256, chunk_cycles=16)
        cfg = par.resolve()
        data = make_amr_sphere(n_base=16, levels_extra=0)
        r = build_amr(cfg, data=data)
        assert np.isfinite(np.asarray(r.dev.rhokap)).all()
        assert float(np.asarray(r.dev.rhokap).max()) > 0.0

        chunk = jax.jit(engine.make_chunk(cfg, r.meta, None))
        st = engine.init_state(par.batch_size)
        ns = jnp.asarray([par.nphotons], jnp.int32)
        key = jax.random.PRNGKey(7)
        jout = 0.0
        for i in range(100):
            st, tl, alive, launched = chunk(st, r.dev,
                                            jax.random.fold_in(key, i),
                                            ns, None, None)
            jout = jout + np.asarray(tl.Jout, np.float64)
            if int(launched) >= par.nphotons and int(alive) == 0:
                break
        else:
            raise AssertionError('did not drain')
        assert jout.sum() > 0.0
