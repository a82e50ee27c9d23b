"""Source samplers: radial tables, sersic deprojection, star files,
emissivity fields, line-profile files (reference src/generate_photon.f90,
src/random_sersic.f90, src/read_text_data.f90)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lart_tpu.config import Params
from lart_tpu.physics import sources


def _draw_radii(p_tab, r_tab, n=200_000, seed=0):
    key = jax.random.PRNGKey(seed)
    return np.asarray(sources.sample_radius_loglog(
        key, jnp.asarray(p_tab, jnp.float32), jnp.asarray(r_tab, jnp.float32),
        (n,)))


def test_inv_cdf_r2exp_moments():
    # p(r) ~ r^2 exp(-r), untruncated mean = 3, var = 3
    p, r = sources.inv_cdf_rexp(2, 50.0)
    smp = _draw_radii(p, r)
    assert abs(smp.mean() - 3.0) < 0.02
    assert abs(smp.var() - 3.0) < 0.1


def test_inv_cdf_r1exp_truncation():
    p, r = sources.inv_cdf_rexp(1, 2.0)
    smp = _draw_radii(p, r)
    assert smp.max() <= 2.0 + 1e-5
    # analytic mean of r^1 e^-r on (0,2]: (2 - 10 e^-2/ (1-3e^-2)) ...
    # compute numerically instead
    rr = np.linspace(1e-6, 2.0, 20001)
    pdf = rr * np.exp(-rr)
    mean = np.trapezoid(rr * pdf, rr) / np.trapezoid(pdf, rr)
    assert abs(smp.mean() - mean) < 0.01


def test_sersic_gaussian_limit():
    # m = 0.5: I(R) = exp(-b R^2) deprojects to a 3-D Gaussian with the
    # same scale; radial density p(r) ~ r^2 exp(-b r^2)
    m = 0.5
    b = 2 * m - 1.0 / 3.0 + 4.0 / (405.0 * m) + 46.0 / (25515.0 * m * m)
    p, r = sources.sersic_deprojected_cumulative(m, 10.0)
    smp = _draw_radii(p, r)
    # mean of r^2 exp(-b r^2) = 2/sqrt(pi*b)
    mean = 2.0 / math.sqrt(math.pi * b)
    assert abs(smp.mean() - mean) / mean < 0.02


def test_sersic_half_light():
    # for any m the 3-D profile from a Sersic-m surface profile has
    # projected half-light radius = Re; check the cruder 3-D invariant
    # that r at p=0.5 is O(Re) and the cumulative is monotone
    p, r = sources.sersic_deprojected_cumulative(4.0, 50.0)
    assert np.all(np.diff(p) > 0)
    r_half = np.interp(0.5, p, r)
    assert 0.5 < r_half < 3.0


def test_star_file_alias(tmp_path):
    f = tmp_path / "stars.txt"
    f.write_text("0 0 0 1.0\n1 0 0 3.0\n0 2 0 0.0\n")
    x, y, z, pr, al, wgt = sources.read_stars(str(f), 0, 0.5)
    from lart_tpu.physics.samplers import alias_sample
    key = jax.random.PRNGKey(1)
    idx = np.asarray(alias_sample(key, jnp.asarray(pr, jnp.float32),
                                  jnp.asarray(al, jnp.int32), (100_000,)))
    frac = np.bincount(idx, minlength=3) / idx.size
    assert abs(frac[0] - 0.25) < 0.01
    assert abs(frac[1] - 0.75) < 0.01
    assert frac[2] == 0.0


def test_star_file_composite_unbiased(tmp_path):
    # composite biasing must keep the weighted luminosity estimate exact
    f = tmp_path / "stars.txt"
    f.write_text("0 0 0 1.0\n1 0 0 9.0\n")
    biased, wgt = sources._composite_bias(np.array([1.0, 9.0]), 0.5)
    # E[wgt] per draw must be 1 (sum over stars of p_biased * wgt = 1)
    assert abs(np.sum(biased * wgt) - 1.0) < 1e-12
    # and p_biased * wgt recovers the natural probabilities
    assert np.allclose(biased * wgt, [0.1, 0.9])
    # the full reader runs and returns a weight table
    x, y, z, pr, al, wgt2 = sources.read_stars(str(f), 1, 0.5)
    assert wgt2 is not None and len(wgt2) == 2


def test_emiss_profile_1d(tmp_path):
    # spherical profile: emissivity flat -> p(r) ~ r^2
    f = tmp_path / "emiss.txt"
    rs = np.linspace(0.0, 1.0, 51)
    np.savetxt(f, np.c_[rs, np.ones_like(rs)])
    ax, prd, pal, al, wgt = sources.build_emiss_profile_1d(
        str(f), 1.0, True, 0, 0.5)
    src = sources.SourceTables(
        ep_axis=jnp.asarray(ax, jnp.float32),
        ep_prob=jnp.asarray(prd, jnp.float32),
        ep_palias=jnp.asarray(pal, jnp.float32),
        ep_alias=jnp.asarray(al, jnp.int32))
    key = jax.random.PRNGKey(3)
    r, w = sources.sample_alias_linear(key, src, (200_000,))
    r = np.asarray(r)
    assert np.all(np.asarray(w) == 1.0)
    # mean of r^2 on (0,1) = 3/4
    assert abs(r.mean() - 0.75) < 0.005


def test_line_prof_file(tmp_path):
    # narrow top-hat profile at +200 km/s in wavelength units
    par = Params(nphotons=1000, temperature=1e4, line_id='ly_alpha',
                 line_prof_file_type=1)
    cfg = par.resolve()
    lam0_A = cfg.line.wavelength0 * 1e4
    # wavelengths shifted redward => negative xfreq
    dlam = lam0_A * (200.0 / 2.99792458e5)
    lam = np.linspace(lam0_A + dlam - 0.05, lam0_A + dlam + 0.05, 21)
    f = tmp_path / "prof.txt"
    np.savetxt(f, np.c_[lam, np.ones_like(lam)])
    pr, al, edges = sources.read_line_prof(str(f), cfg)
    x_mid = 0.5 * (edges[0] + edges[-1])
    # expected xfreq = -200 km/s / vtherm
    assert abs(x_mid - (-200.0 / cfg.vtherm)) < 0.5


def test_source_e2e_exponential_sphere():
    """End-to-end: exponential_sphere source in an optically thin sphere
    runs and conserves weight."""
    from tests.test_e2e import run_config
    par = Params(nphotons=2000, geometry='sphere', rmax=1.0,
                 nx=33, ny=33, nz=33, xmax=1, ymax=1, zmax=1,
                 taumax=0.1, temperature=1e4,
                 xfreq_min=-30.0, xfreq_max=30.0,
                 source_geometry='exponential_sphere',
                 source_rscale=0.2, source_rmax=1.0,
                 batch_size=1024, chunk_cycles=16)
    cfg, meta, tot, done = run_config(par, n_chunks=100)
    assert done
    assert abs(tot['jout'].sum() / par.nphotons - 1.0) < 1e-3


def test_source_e2e_star_file(tmp_path):
    f = tmp_path / "stars.txt"
    f.write_text("0 0 0 1.0\n0.3 0 0 2.0\n")
    from tests.test_e2e import run_config
    par = Params(nphotons=2000, geometry='sphere', rmax=1.0,
                 nx=17, ny=17, nz=17, xmax=1, ymax=1, zmax=1,
                 taumax=0.1, temperature=1e4,
                 xfreq_min=-30.0, xfreq_max=30.0,
                 source_geometry='star_file', star_file=str(f),
                 sampling_method=1,
                 batch_size=1024, chunk_cycles=16)
    cfg, meta, tot, done = run_config(par, n_chunks=100)
    assert done
    # weighted launch total equals nphotons on average (composite unbiased)
    assert abs(tot['jout'].sum() / par.nphotons - 1.0) < 0.05


def test_source_e2e_diffuse_emissivity_density():
    """diffuse_emissivity with emiss_file='density1' on a uniform sphere:
    photons born proportional to density."""
    from tests.test_e2e import run_config
    par = Params(nphotons=2000, geometry='sphere', rmax=1.0,
                 nx=17, ny=17, nz=17, xmax=1, ymax=1, zmax=1,
                 taumax=0.1, temperature=1e4,
                 xfreq_min=-30.0, xfreq_max=30.0,
                 source_geometry='diffuse_emissivity',
                 emiss_file='density1', sampling_method=0,
                 batch_size=1024, chunk_cycles=16)
    cfg, meta, tot, done = run_config(par, n_chunks=100)
    assert done
    assert abs(tot['jout'].sum() / par.nphotons - 1.0) < 1e-3


def test_spectral_voigt0_and_continuum_gaussian():
    from tests.test_e2e import run_config
    for st, extra in [('voigt0', dict(temperature0=1e4)),
                      ('continuum+gaussian',
                       dict(EW_line=100.0, gaussian_FWHM_vel=200.0))]:
        par = Params(nphotons=1000, geometry='sphere', rmax=1.0,
                     nx=9, ny=9, nz=9, xmax=1, ymax=1, zmax=1,
                     taumax=0.1, temperature=1e4,
                     xfreq_min=-30.0, xfreq_max=30.0,
                     spectral_type=st, batch_size=512, chunk_cycles=16,
                     **extra)
        cfg, meta, tot, done = run_config(par, n_chunks=100)
        assert done, st
        assert abs(tot['jout'].sum() / par.nphotons - 1.0) < 2e-3, st
