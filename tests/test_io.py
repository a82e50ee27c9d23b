"""Output writer/reader round trip + merge ("resume") semantics."""

import numpy as np

from lart_tpu.config import Params
from lart_tpu.grid.cartesian import build_cartesian
from lart_tpu.io.reader import read_lart
from lart_tpu.io.writer import write_output
from lart_tpu.tally import normalize


def fake_result(nph=1000, seed=0):
    par = Params(nphotons=nph, temperature=1e4, taumax=100.0,
                 xy_periodic=True, nx=1, ny=1, nz=21)
    cfg = par.resolve()
    meta, _ = build_cartesian(cfg)
    rng = np.random.default_rng(seed)
    raw = {
        'Jin': rng.random(meta.nxfreq),
        'Jout': rng.random(meta.nxfreq),
        'Jabs': np.zeros(meta.nxfreq),
        'nscatt_gas': 123.0 * nph,
        'nscatt_dust': 0.0,
    }
    return normalize(cfg, meta, raw, nph, exetime_s=60.0)


def test_roundtrip(tmp_path):
    res = fake_result()
    fn = write_output(str(tmp_path / 'out.h5'), res)
    out = read_lart(fn)
    np.testing.assert_allclose(out.Jout, res.Jout, rtol=1e-12)
    np.testing.assert_allclose(out.xfreq, res.xfreq, rtol=1e-12)
    assert out.header['nphotons'] == 1000
    assert abs(out.header['Nsc_tot'] - 123.0) < 1e-9
    assert 'taumax' in out.header and out.header['taumax'] == 100.0
    assert out.summary()


def test_merge_mode(tmp_path):
    fn = str(tmp_path / 'merge.h5')
    r1 = fake_result(nph=1000, seed=1)
    write_output(fn, r1)
    r2 = fake_result(nph=3000, seed=2)
    r2.cfg.par.out_merge = True
    write_output(fn, r2)
    out = read_lart(fn)
    assert out.header['nphotons'] == 4000
    expect = (r1.Jout * 1000 + r2.Jout * 3000) / 4000
    np.testing.assert_allclose(out.Jout, expect, rtol=1e-12)


def test_radial_profiles():
    from lart_tpu.instruments.profiles import radial_intensity, radial_stokes
    cube = np.ones((5, 17, 17))
    r, rI = radial_intensity(cube, cube, 0.5)
    assert rI.shape == r.shape
    # flat image -> flat profile: 2 cubes * 5 freq * 0.5 = 5.0
    assert np.allclose(rI[rI > 0], 5.0)
    r, a, b, c, d, pol = radial_stokes(cube, 0 * cube, 0 * cube, 0 * cube, 0.5)
    assert np.allclose(pol, 0.0)
