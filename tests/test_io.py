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


def fake_result_full(nph=1000, seed=0, fmt='hdf5'):
    """Result carrying every mergeable section (Jmu, J1/Pa/Pnew, peel)."""
    par = Params(nphotons=nph, temperature=1e4, taumax=100.0,
                 xy_periodic=True, nx=1, ny=1, nz=21, file_format=fmt,
                 save_Jmu=True, nmu=4, calcJ=True, calcP=True, calcPnew=True,
                 save_peeloff=True, nxim=9, nyim=9,
                 save_peeloff_2D=True, save_peeloff_3D=True)
    cfg = par.resolve()
    meta, _ = build_cartesian(cfg)
    from lart_tpu.instruments.observer import build_observers
    obs_meta, _ = build_observers(cfg)
    rng = np.random.default_rng(seed)
    nb = meta.nbin_JPa
    cube = meta.nxfreq * obs_meta.nxim * obs_meta.nyim
    raw = {
        'Jin': rng.random(meta.nxfreq),
        'Jout': rng.random(meta.nxfreq),
        'Jabs': np.zeros(meta.nxfreq),
        'Jmu': rng.random(meta.nxfreq * par.nmu),
        'J1': rng.random(meta.nxfreq * nb),
        'Pa': rng.random(nb),
        'Pnew': rng.random(nb),
        'peel_scatt': rng.random(cube),
        'peel_direc': rng.random(cube),
        'nscatt_gas': 123.0 * nph,
        'nscatt_dust': 1.5 * nph,
    }
    return normalize(cfg, meta, raw, nph, exetime_s=60.0, obs_meta=obs_meta)


def test_merge_full_sections(tmp_path):
    """Two-run merge equals the photon-count-weighted average of the two
    runs for EVERY section: spectra, Jmu, Jx/Pa/Pnew and peel cubes
    (reference merges all of them, write_output_rect.f90:130-420,780-960)."""
    fn = str(tmp_path / 'merge_full.h5')
    r1 = fake_result_full(nph=1000, seed=1)
    write_output(fn, r1)
    r2 = fake_result_full(nph=3000, seed=2)
    r2.cfg.par.out_merge = True
    write_output(fn, r2)
    from lart_tpu.io.iofile import open_read
    f = open_read(fn)
    w1, w2 = 0.25, 0.75
    np.testing.assert_allclose(
        np.asarray(f['Jmu/data'], np.float64).ravel(),
        (r1.Jmu * w1 + r2.Jmu * w2).ravel(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f['Jx_1D/data'], np.float64),
        r1.J1 * w1 + r2.J1 * w2, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f['Pa_1D/data'], np.float64),
        r1.Pa * w1 + r2.Pa * w2, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f['Pa_1D_new/data'], np.float64),
        r1.Pnew * w1 + r2.Pnew * w2, rtol=1e-6)
    # peel-cube merge in the side files
    pf = open_read(str(tmp_path / 'merge_full_peel3D.h5'))
    np.testing.assert_allclose(
        np.asarray(pf['Scattered/data'], np.float64),
        r1.peel['scatt'][0] * w1 + r2.peel['scatt'][0] * w2, rtol=1e-6)
    assert pf['Scattered'].attrs['nphotons'] == 4000
    p2 = open_read(str(tmp_path / 'merge_full_peel2D.h5'))
    bin_unit = r1.meta.dxfreq
    exp = (r1.peel['direc'][0] * w1 + r2.peel['direc'][0] * w2).sum(axis=0) \
        * bin_unit
    np.testing.assert_allclose(np.asarray(p2['Direct/data'], np.float64),
                               exp, rtol=1e-6)


def test_fits_output_end_to_end(tmp_path):
    """file_format='fits' writes native-FITS main+peel files readable by
    the reader stack."""
    res = fake_result_full(nph=500, seed=3, fmt='fits')
    fn = write_output(str(tmp_path / 'run.fits'), res)
    out = read_lart(fn)
    np.testing.assert_allclose(out.Jout, res.Jout, rtol=1e-6)
    assert out.header['nphotons'] == 500
    from lart_tpu.analysis import read_lart as read_full
    full = read_full(fn)
    assert full.Jmu is not None
    assert len(full.peel) == 1
    np.testing.assert_allclose(full.peel[0].scatt, res.peel['scatt'][0],
                               rtol=1e-6)


def test_read_lart_from_input_and_peel_mu(tmp_path):
    """The reference workflow read_lart('input.in') (fits_path_for,
    read_lart.py:2765) + the peel observer mu from OBSX/Y/Z keywords."""
    import os
    from lart_tpu import driver
    from lart_tpu.io.writer import write_output
    from lart_tpu import analysis

    inp = tmp_path / 'run.in'
    inp.write_text(
        "&parameters\n"
        " par%nphotons = 400\n"
        " par%geometry = 'sphere'\n par%rmax = 1.0\n"
        " par%nx = 17\n par%ny = 17\n par%nz = 17\n"
        " par%taumax = 1.0\n par%temperature = 1e4\n"
        " par%batch_size = 512\n par%chunk_cycles = 8\n"
        " par%n_devices = 1\n"
        " par%save_peeloff = .true.\n"
        " par%nxim = 9\n par%nyim = 9\n par%distance = 100.0\n"
        " par%nobs = 1\n par%alpha(1) = 0.0\n par%beta(1)  = 60.0\n"
        f" par%out_file = '{tmp_path}/run_out.h5'\n"
        "/\n")
    par = Params.from_namelist(str(inp))
    res = driver.run(par, seed=2)
    write_output(par.out_file, res)

    out = analysis.read_lart(str(inp))           # input-namelist entry
    assert out.nphotons == 400
    assert len(out.peel) == 1
    # beta=60 deg observer: mu = cos(60) = 0.5
    assert abs(out.peel[0].mu - 0.5) < 1e-6

    d = analysis.parse_input_file(str(inp))
    assert d['nphotons'] == 400 and d['beta'] == (60.0,)

    # moment map + jmu-compare plot methods run headless
    ax = out.plot_velocity_moment_map(0)
    assert ax is not None
