"""Spectral-cube analysis helpers (the read_lart surface the reference's
MUSE/DL2008 example plot scripts consume)."""
import numpy as np
import pytest

from lart_tpu.analysis import PeelObservation, radial_profile


@pytest.fixture
def obs():
    rng = np.random.default_rng(7)
    nxf, ny, nx = 12, 21, 21
    scatt = rng.random((nxf, ny, nx))
    direc = np.zeros((nxf, ny, nx))
    direc[:, ny // 2, nx // 2] = 1.0
    stokes = {'I': scatt + direc,
              'Q': 0.1 * scatt,
              'U': -0.05 * scatt}
    return PeelObservation(filename='synthetic', header={'OBSZ': 1.0},
                           scatt=scatt, direc=direc, stokes=stokes)


def test_sb_map_windows(obs):
    full = obs.sb_map()
    np.testing.assert_allclose(full, obs.total.sum(axis=0))
    lo = obs.sb_map(xsel=(0, 6))
    hi = obs.sb_map(xsel=(6, 12))
    np.testing.assert_allclose(lo + hi, full)
    mask = np.zeros(12, bool)
    mask[3] = True
    np.testing.assert_allclose(obs.sb_map(xsel=mask), obs.total[3])


def test_aperture_spectrum(obs):
    # the whole image is inside a huge aperture
    s_all = obs.aperture_spectrum(1e3)
    np.testing.assert_allclose(s_all, obs.average_spectrum())
    # a tiny aperture sees mostly the central direct source
    s_c = obs.aperture_spectrum(0.8, component='direc')
    np.testing.assert_allclose(s_c, np.ones(12))


def test_convolve_psf_conserves_flux(obs):
    for kind in ('gaussian', 'moffat'):
        sm = obs.convolve_psf(2.5, kind=kind)
        assert sm.scatt.shape == obs.scatt.shape
        # boundary-renormalized (astropy-style): a constant image is
        # reproduced exactly, total flux to ~% for interior-dominated maps
        const = PeelObservation(filename='c', header={},
                                scatt=np.ones_like(obs.scatt),
                                direc=np.zeros_like(obs.direc))
        np.testing.assert_allclose(const.convolve_psf(2.5, kind=kind).scatt,
                                   1.0, rtol=1e-9)
        np.testing.assert_allclose(sm.direc.sum(), obs.direc.sum(),
                                   rtol=0.02)
        # the delta-function direct source spreads out
        assert sm.direc[:, 10, 10].max() < 1.0
        assert sm.direc[:, 10, 12].max() > 0.0


def test_convolve_spectral(obs):
    sm = obs.convolve_spectral(3.0)
    assert sm.scatt.shape == obs.scatt.shape
    # per-pixel flux conserved away from the spectral edges
    mid = slice(4, 8)
    assert abs(sm.total[mid].sum() / obs.total[mid].sum() - 1) < 0.5
    # a line narrower after -> variance increases along axis 0
    var0 = np.var(np.argmax(obs.direc, axis=0))
    sm2 = obs.convolve_spectral(0.1)
    np.testing.assert_allclose(sm2.total.sum(), obs.total.sum(), rtol=1e-6)


def test_radial_profile_flat_image():
    img = np.ones((32, 32))
    r, p = radial_profile(img)
    np.testing.assert_allclose(p[np.isfinite(p)], 1.0)
    assert r[0] == 0.0 and 0.9 < r[-1] <= 1.0
    r2, p2 = radial_profile(img, normalize=False, whole_area=True)
    assert r2[-1] > 16.0


def test_radial_profile_centered_gaussian():
    yy, xx = np.indices((41, 41)) + 0.5
    r = np.hypot(xx - 20.5, yy - 20.5)
    img = np.exp(-0.5 * (r / 5.0) ** 2)
    rr, pp = radial_profile(img, normalize=False)
    # monotone decreasing
    assert np.all(np.diff(pp[:15]) < 0)


def test_polarization_radial_profile(obs):
    r, pol = radial_profile_obs = obs.polarization_radial_profile()
    ok = np.isfinite(pol)
    # Q=0.1 I_scatt, U=-0.05 I_scatt: P <= sqrt(.1^2+.05^2) ~ 0.112
    assert np.nanmax(pol[ok]) <= 0.12

    # the radial-table path takes precedence when present
    obs2 = PeelObservation(
        filename='t', header={}, scatt=obs.scatt, direc=obs.direc,
        stokes=obs.stokes,
        radial={'r': np.arange(5.0), 'I': np.ones(5),
                'Q': np.full(5, 0.3), 'U': np.full(5, 0.4)})
    r2, pol2 = obs2.polarization_radial_profile()
    np.testing.assert_allclose(pol2, 0.5)


def test_radial_sb_profile(obs):
    r, p = obs.radial_sb_profile()
    assert r.size == p.size and r.size > 5
