"""Table-driven source samplers: radial profiles, star particles, emissivity
fields, and file-based line profiles.

The reference samples these distributions one photon at a time with cached
rejection/alias machinery (reference: src/generate_photon.f90:33-341,
src/random_mt.f90:1208-1306, src/random_sersic.f90:128-182,
src/read_text_data.f90:143-415, src/setup.f90:651-746).  Here every
distribution is reduced at setup time to a device-resident table -- an
inverse-CDF grid for smooth radial laws, a Vose alias table for categorical
choices -- so the per-lane draw is O(1) gathers with no rejection at all.

All builders run on the host in f64 numpy; `SourceTables` is the device
pytree threaded through the jitted chunk alongside the grid.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import samplers

__all__ = ['SourceTables', 'build_sources', 'sample_radius_loglog',
           'sample_alias_linear']


class SourceTables(NamedTuple):
    """Optional device tables; entries are None unless the config needs them.

    r_p/r_r      : radial inverse-CDF knots (cumulative prob -> radius) for
                   exponential_sphere / exponential_cylinder / sersic sources
    star_*       : star-particle positions + alias table (+ composite weights)
    lp_*         : spectral-type 'line_prof_file' alias over frequency bins
                   (lp_edges has nbin+1 entries; uniform draw within a bin)
    em_*         : diffuse-emissivity alias over flat cell index (Cartesian,
                   C-order) or leaf id (AMR); em_wgt = composite-bias weights
    ep_*         : 1-D emissivity profile (plane/spherical atmosphere):
                   trapezoid-linear sampling between profile knots
    """
    r_p: Optional[jnp.ndarray] = None
    r_r: Optional[jnp.ndarray] = None
    star_x: Optional[jnp.ndarray] = None
    star_y: Optional[jnp.ndarray] = None
    star_z: Optional[jnp.ndarray] = None
    star_prob: Optional[jnp.ndarray] = None
    star_alias: Optional[jnp.ndarray] = None
    star_wgt: Optional[jnp.ndarray] = None
    lp_prob: Optional[jnp.ndarray] = None
    lp_alias: Optional[jnp.ndarray] = None
    lp_edges: Optional[jnp.ndarray] = None
    em_prob: Optional[jnp.ndarray] = None
    em_alias: Optional[jnp.ndarray] = None
    em_wgt: Optional[jnp.ndarray] = None
    ep_axis: Optional[jnp.ndarray] = None
    ep_prob: Optional[jnp.ndarray] = None
    ep_palias: Optional[jnp.ndarray] = None
    ep_alias: Optional[jnp.ndarray] = None
    ep_wgt: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------------
# Host-side builders
# ---------------------------------------------------------------------------

def _monotone_pr(cdf: np.ndarray, r: np.ndarray):
    """Strictly-increasing (p, r) knots for log-log inverse-CDF interp."""
    cdf = np.maximum.accumulate(cdf)
    keep = np.concatenate([[True], np.diff(cdf) > 0])
    keep &= (cdf > 0) & (r > 0)
    return cdf[keep], r[keep]


def inv_cdf_rexp(k: int, rmax: float, n: int = 2048):
    """Inverse CDF of p(r) dr = r^k exp(-r) dr on (0, rmax]
    (the samplers rand_r1exp/rand_r2exp, reference src/random_mt.f90:
    1227-1260, realized as a table instead of rejection).  Radii are in
    units of the scale length."""
    from scipy.special import gammainc
    r = np.geomspace(rmax * 1e-7, rmax, n)
    cdf = gammainc(k + 1, r) / gammainc(k + 1, rmax)
    p, rr = _monotone_pr(cdf, r)
    # power-law tail p ~ r^(k+1) below the first knot
    p0 = p[0] * 1e-12
    r0 = rr[0] * (p0 / p[0]) ** (1.0 / (k + 1))
    return np.concatenate([[p0], p]), np.concatenate([[r0], rr])


def sersic_deprojected_cumulative(m: float, rmax: float,
                                  n_r: int = 200, n_t: int = 1024):
    """Cumulative 3-D (deprojected) luminosity profile of a Sersic-m surface
    brightness I(R) = exp(-b (R/Re)^(1/m)), R in units of Re (the SSH galaxy
    model; reference src/random_sersic.f90:20-126 computes the same integral
    via an Abel transform).

    Derivation used here: the inverse Abel integral
        nu(s) = -(1/pi) int_s^inf I'(x) dx / sqrt(x^2 - s^2)
    with x = s cosh t becomes  nu(s) = (b/(pi m)) int_0^inf
        (s cosh t)^(1/m - 1) exp(-b (s cosh t)^(1/m)) dt,
    then L(<r) = int_0^r 4 pi s^2 nu(s) ds.

    Returns (p, r) knots of the normalized cumulative, r in Re units.
    """
    # Ciotti & Bertin (1999) asymptotic b(m)
    b = 2.0 * m - 1.0 / 3.0 + 4.0 / (405.0 * m) + 46.0 / (25515.0 * m * m)
    x_cut = (700.0 / b) ** m                      # exp(-700) underflow bound
    s = np.geomspace(min(1e-4, rmax * 1e-4), rmax, n_r)
    nu = np.empty(n_r)
    for i, si in enumerate(s):
        tmax = np.arccosh(max(x_cut / si, 1.0 + 1e-12))
        t = np.linspace(0.0, tmax, n_t)
        x = si * np.cosh(t)
        f = x ** (1.0 / m - 1.0) * np.exp(-b * x ** (1.0 / m))
        nu[i] = (b / (math.pi * m)) * np.trapezoid(f, t)
    integrand = 4.0 * math.pi * s * s * nu
    L = np.concatenate([[0.0], np.cumsum(
        0.5 * (integrand[1:] + integrand[:-1]) * np.diff(s))])
    # innermost shell: nu ~ const -> L ~ r^3... but for Sersic nu diverges as
    # s^(1/m - 1) for m > 1; the cumulative goes as s^(1/m + 2) (the same
    # small-r law the reference uses for its first bin).
    L = L + integrand[0] * s[0] / (1.0 / m + 3.0)
    cdf = L / L[-1]
    p, rr = _monotone_pr(cdf, s)
    p0 = p[0] * 1e-12
    r0 = rr[0] * (p0 / p[0]) ** (1.0 / (1.0 / m + 2.0))
    return np.concatenate([[p0], p]), np.concatenate([[r0], rr])


def _composite_bias(prob: np.ndarray, f_comp: float):
    """Composite importance-flattening: mix the natural PDF with a uniform
    over its support; returns (biased prob, weight) (read_stars,
    reference src/read_text_data.f90:403-414)."""
    prob = prob / prob.sum()
    mask = prob > 0
    ncount = int(mask.sum())
    wgt = np.ones_like(prob)
    biased = prob.copy()
    biased[mask] = prob[mask] * (1.0 - f_comp) + f_comp / ncount
    wgt[mask] = prob[mask] / biased[mask]
    return biased, wgt


def read_stars(path: str, sampling_method: int, f_composite: float):
    """Star-particle file: text columns x y z luminosity
    (read_stars, reference src/read_text_data.f90:346-415)."""
    dat = np.loadtxt(path, ndmin=2)
    x, y, z, lum = dat[:, 0], dat[:, 1], dat[:, 2], np.maximum(dat[:, 3], 0.0)
    prob = lum / lum.sum()
    wgt = None
    if sampling_method > 0:
        prob, wgt = _composite_bias(prob, f_composite)
    pr, al = samplers.build_alias_table(prob)
    return x, y, z, pr, al, wgt


def read_line_prof(path: str, cfg):
    """Line-profile file -> (alias prob, alias, bin edges in xfreq units)
    (setup_line_profile, reference src/setup.f90:651-746).  Two columns:
    frequency [Hz] (line_prof_file_type=0) or wavelength [Angstrom] (=1),
    and profile density (negatives clipped)."""
    from ..constants import SPEEDC as SPEEDC_KMS
    par, line = cfg.par, cfg.line
    dat = np.loadtxt(path, ndmin=2)
    xf, pdf = dat[:, 0].astype(np.float64), np.maximum(dat[:, 1], 0.0)
    lam_A = line.wavelength0 * 1e4          # um -> Angstrom
    lam_km = line.wavelength0 * 1e-9        # um -> km
    Dfreq_ref = cfg.Dfreq_ref
    if par.line_prof_file_type == 0:
        xf = (xf - SPEEDC_KMS / lam_km) / Dfreq_ref
    elif par.line_prof_file_type == 1:
        xf = -(xf - lam_A) / lam_A * (SPEEDC_KMS / cfg.vtherm)
    else:
        raise ValueError(f'line_prof_file_type {par.line_prof_file_type}')
    if xf[-1] < xf[0]:
        xf, pdf = xf[::-1].copy(), pdf[::-1].copy()
    n = len(xf)
    edges = np.empty(n + 1)
    edges[1:-1] = 0.5 * (xf[:-1] + xf[1:])
    edges[0] = xf[0] - 0.5 * (xf[1] - xf[0])
    edges[-1] = xf[-1] + 0.5 * (xf[-1] - xf[-2])
    pbin = pdf * np.diff(edges)
    pbin = pbin / pbin.sum()
    pr, al = samplers.build_alias_table(pbin)
    return pr, al, edges


def build_emiss_profile_1d(path: str, xmax: float, spherical: bool,
                           sampling_method: int, f_composite: float):
    """1-D emissivity profile for plane/spherical atmospheres
    (setup_plane_emissivity / setup_spherical_emissivity, reference
    src/read_text_data.f90:143-344): knots (axis, density); spherical
    profiles weight by r^2; bin probability is the trapezoid integral."""
    dat = np.loadtxt(path, ndmin=2)
    ax, pr = dat[:, 0].astype(np.float64), np.maximum(dat[:, 1], 0.0)
    if spherical:
        pr = pr * ax * ax
    keep = np.searchsorted(ax, xmax, side='left')
    if keep < len(ax):
        # truncate at the box edge, interpolating the last knot
        pr_edge = np.interp(xmax, ax, pr, left=0.0, right=0.0)
        ax = np.concatenate([ax[:keep], [xmax]])
        pr = np.concatenate([pr[:keep], [pr_edge]])
    pbin = 0.5 * (pr[:-1] + pr[1:]) * np.diff(ax)
    psum = pbin.sum()
    pbin = pbin / psum
    pr = pr / psum
    wgt = None
    if sampling_method > 0:
        f1 = 1.0 - f_composite
        support = (pbin > 0)
        width = np.diff(ax)
        wsum = width[support].sum()
        pcomp = np.where(support, width / wsum, 0.0)
        pbin = np.where(support, pbin * f1 + f_composite * pcomp, pbin)
        dens_mix = pr * f1 + f_composite / wsum
        wgt = np.where(dens_mix > 0, pr / np.where(dens_mix > 0, dens_mix, 1),
                       1.0)
        pr = dens_mix
    pal, al = samplers.build_alias_table(pbin)
    return ax, pr, pal, al, wgt


def build_sources(cfg, meta, host_data=None):
    """Build SourceTables for the resolved config, or None if every sampler
    in play has a closed form.  host_data may carry:
      'rhokap'     : host (nx,ny,nz) gas opacity (for emiss 'density1/2')
      'emissivity' : host emissivity per cell (Cartesian) or per leaf (AMR)
    """
    par = cfg.par
    sg = par.source_geometry.strip().lower()
    st = par.spectral_type.strip().lower()
    host_data = host_data or {}
    tab = {}

    if sg == 'exponential_sphere':
        p, r = inv_cdf_rexp(2, par.source_rmax / par.source_rscale)
        tab['r_p'], tab['r_r'] = p, r * par.source_rscale
    elif sg == 'exponential_cylinder':
        p, r = inv_cdf_rexp(1, par.source_rmax / par.source_rscale)
        tab['r_p'], tab['r_r'] = p, r * par.source_rscale
    elif sg in ('sersic', 'ssh'):
        p, r = sersic_deprojected_cumulative(
            par.sersic_m, par.source_rmax / par.Reff)
        tab['r_p'], tab['r_r'] = p, r * par.Reff
    elif sg == 'star_file':
        x, y, z, pr, al, wgt = read_stars(par.star_file, par.sampling_method,
                                          par.f_composite)
        tab.update(star_x=x, star_y=y, star_z=z, star_prob=pr, star_alias=al,
                   star_wgt=wgt)
    elif sg == 'diffuse_emissivity':
        emiss_src = par.emiss_file.strip()
        ext = emiss_src.rsplit('.', 1)[-1].lower() if '.' in emiss_src else ''
        if ext in ('txt', 'dat'):
            xmax = min(meta.xmax, meta.ymax, meta.zmax)
            spherical = par.geometry.strip() != 'plane_atmosphere'
            ax, prd, pal, al, wgt = build_emiss_profile_1d(
                emiss_src, xmax, spherical, par.sampling_method,
                par.f_composite)
            tab.update(ep_axis=ax, ep_prob=prd, ep_palias=pal, ep_alias=al,
                       ep_wgt=wgt)
        else:
            em = host_data.get('emissivity')
            if em is None and emiss_src in ('density1', 'density2'):
                rk = np.asarray(host_data['rhokap'], np.float64)
                em = rk if emiss_src == 'density1' else rk * rk
            if em is None and ext in ('fits', 'h5', 'hdf5'):
                from ..io.reader import read_3d_any
                em = read_3d_any(emiss_src)
            if em is None:
                raise ValueError(
                    'diffuse_emissivity needs emiss_file or grid emissivity')
            prob = np.asarray(em, np.float64).reshape(-1)
            wgt = None
            if par.sampling_method > 0:
                prob, wgt = _composite_bias(prob, par.f_composite)
            else:
                prob = prob / prob.sum()
            pr, al = samplers.build_alias_table(prob)
            tab.update(em_prob=pr, em_alias=al, em_wgt=wgt)

    if st == 'line_prof_file':
        pr, al, edges = read_line_prof(par.line_prof_file, cfg)
        tab.update(lp_prob=pr, lp_alias=al, lp_edges=edges)

    if not tab:
        return None
    return SourceTables(**{k: jnp.asarray(np.asarray(v, np.float64),
                                          jnp.int32 if v is not None
                                          and np.issubdtype(
                                              np.asarray(v).dtype, np.integer)
                                          else jnp.float32)
                           if v is not None else None
                           for k, v in tab.items()})


# ---------------------------------------------------------------------------
# Device-side samplers
# ---------------------------------------------------------------------------

# limb darkening polynomial I(mu)/I(0) = c0 + c1 mu + c2 mu^2 (the Sun at
# 200 nm; stellar_illumination.f90:48-55)
LIMB_COEFF = (0.55, 0.12, 0.33)


def _limb_wgt(limb_model: int, cos_ang):
    """Photon weight for the chosen limb-darkening law
    (random_stellar_illumination1, stellar_illumination.f90:436-450)."""
    if limb_model <= 0:
        return jnp.ones_like(cos_ang)
    if limb_model == 1:          # Lambertian
        return 2.0 * cos_ang
    if limb_model == 2:          # Eddington
        return cos_ang * (1.5 * cos_ang + 1.0)
    c0, c1, c2 = LIMB_COEFF
    norm = c0 / 2.0 + c1 / 3.0 + c2 / 4.0
    return (c0 + c1 * cos_ang + c2 * cos_ang * cos_ang) * cos_ang / norm / 2.0


def sample_limb_cost(key, limb_model: int, shape, n_rounds: int = 8):
    """Sample cos(theta) of emission from the stellar surface under the
    chosen limb-darkening law (importance sampling, weight 1;
    rand_eddington_limb_darkening / rand_general_limb_darkening,
    reference src/stellar_illumination.f90:57-163, used by
    peeling_direct_stellar_illumination1 at :1001-1028)."""
    if limb_model <= 0:
        return jax.random.uniform(key, shape, jnp.float32)
    if limb_model == 1:          # Lambertian: pdf = 2 mu
        return jnp.sqrt(jax.random.uniform(key, shape, jnp.float32))
    if limb_model == 2:          # Eddington: pdf = mu(1.5 mu + 1)
        def pdf(mu):
            return mu * (1.5 * mu + 1.0)
        pmax = 2.5
    else:                        # polynomial I(mu) = c0 + c1 mu + c2 mu^2
        c0, c1, c2 = LIMB_COEFF
        norm = c0 / 2.0 + c1 / 3.0 + c2 / 4.0

        def pdf(mu):
            return (c0 + c1 * mu + c2 * mu * mu) * mu / norm / 2.0
        pmax = float(pdf(jnp.float32(1.0)))
    acc = jnp.zeros(shape, bool)
    out = jnp.ones(shape, jnp.float32)
    for rnd in range(n_rounds):
        xi = jax.random.uniform(jax.random.fold_in(key, rnd),
                                (2,) + shape, jnp.float32)
        take = jnp.logical_and(~acc, xi[1] * pmax < pdf(xi[0]))
        out = jnp.where(take, xi[0], out)
        acc = jnp.logical_or(acc, take)
    return out


def sample_stellar_illumination(key, par, rmax, shape, n_rounds: int = 8):
    """Finite star of radius R* at distance D illuminating a planet
    atmosphere of radius rmax (random_stellar_illumination1,
    reference src/stellar_illumination.f90:313-470), vectorized as masked
    rejection rounds.  Returns (x, y, z, kx, ky, kz, wgt, flux_factor,
    nrejected)."""
    Rs = par.stellar_radius
    D = par.distance_star_to_planet
    cosvt_max = (Rs - rmax) / D
    cost_max = math.sqrt(max(1.0 - (rmax / (D - Rs)) ** 2, 0.0))
    flux_fac1 = (1.0 - cosvt_max) * (1.0 - cost_max) / 2.0

    acc = jnp.zeros(shape, bool)
    nrej = jnp.zeros(shape, jnp.float32)
    outs = [jnp.zeros(shape, jnp.float32) for _ in range(7)]
    x_, y_, z_, kx_, ky_, kz_, ca_ = outs
    for rnd in range(n_rounds):
        k = jax.random.fold_in(key, rnd)
        xi = jax.random.uniform(k, (4,) + shape, jnp.float32)
        cosvt = (1.0 - cosvt_max) * xi[0] + cosvt_max
        sinvt = jnp.sqrt(jnp.maximum(1.0 - cosvt * cosvt, 0.0))
        vphi = 2.0 * math.pi * xi[1]
        x0 = sinvt * jnp.cos(vphi)
        y0 = sinvt * jnp.sin(vphi)
        z0 = cosvt
        x = Rs * x0
        y = Rs * y0
        z = Rs * z0 - D
        rr = jnp.sqrt(x * x + y * y + z * z)
        kx0, ky0, kz0 = -x / rr, -y / rr, -z / rr
        cost = (1.0 - cost_max) * xi[2] + cost_max
        sint = jnp.sqrt(jnp.maximum(1.0 - cost * cost, 0.0))
        phi = 2.0 * math.pi * xi[3]
        cosp, sinp = jnp.cos(phi), jnp.sin(phi)
        kr = jnp.sqrt(jnp.maximum(kx0 * kx0 + ky0 * ky0, 1e-24))
        kx = cost * kx0 + sint * (kz0 * kx0 * cosp - ky0 * sinp) / kr
        ky = cost * ky0 + sint * (kz0 * ky0 * cosp + kx0 * sinp) / kr
        kz = cost * kz0 - sint * cosp * kr
        r_dot_k = x * kx + y * ky + z * kz
        det = r_dot_k * r_dot_k - (rr * rr - rmax * rmax)
        cos_ang = x0 * kx + y0 * ky + z0 * kz
        ok = jnp.logical_and(cos_ang >= 0.0, det >= 0.0)
        dist = -r_dot_k - jnp.sqrt(jnp.maximum(det, 0.0))
        take = jnp.logical_and(~acc, ok)
        x_ = jnp.where(take, x + kx * dist, x_)
        y_ = jnp.where(take, y + ky * dist, y_)
        z_ = jnp.where(take, z + kz * dist, z_)
        kx_ = jnp.where(take, kx, kx_)
        ky_ = jnp.where(take, ky, ky_)
        kz_ = jnp.where(take, kz, kz_)
        ca_ = jnp.where(take, cos_ang, ca_)
        nrej = nrej + jnp.where(jnp.logical_and(~acc, ~ok), 1.0, 0.0)
        acc = jnp.logical_or(acc, ok)
    # stragglers: aim at the planet center from the sub-planet point
    strag = ~acc
    x_ = jnp.where(strag, 0.0, x_)
    y_ = jnp.where(strag, 0.0, y_)
    z_ = jnp.where(strag, -rmax, z_)
    kx_ = jnp.where(strag, 0.0, kx_)
    ky_ = jnp.where(strag, 0.0, ky_)
    kz_ = jnp.where(strag, 1.0, kz_)
    ca_ = jnp.where(strag, 1.0, ca_)
    wgt = _limb_wgt(par.stellar_limb_darkening, ca_)
    flux_factor = flux_fac1 * wgt
    return x_, y_, z_, kx_, ky_, kz_, wgt, flux_factor, nrej


def sample_point_illumination(key, par, meta, shape, n_rounds: int = 8):
    """External point source on the z axis illuminating the box
    (random_point_illumination, reference src/point_illumination.f90:15-120):
    directions in the cone subtended by the near wall, rejected if the ray
    misses the wall rectangle.  Returns (x, y, z, kx, ky, kz, wgt,
    flux_factor, nrejected)."""
    dist_wall = abs(par.zs_point) - meta.zmax
    alpha = meta.xmax / dist_wall
    beta = meta.ymax / dist_wall
    flux_fac1 = math.atan(alpha * beta
                          / math.sqrt(1.0 + alpha ** 2 + beta ** 2)) / math.pi
    costm = dist_wall / math.sqrt(dist_wall ** 2 + meta.xmax ** 2
                                  + meta.ymax ** 2)
    below = par.zs_point < 0.0

    acc = jnp.zeros(shape, bool)
    nrej = jnp.zeros(shape, jnp.float32)
    x_ = jnp.zeros(shape, jnp.float32)
    y_ = jnp.zeros(shape, jnp.float32)
    kx_ = jnp.zeros(shape, jnp.float32)
    ky_ = jnp.zeros(shape, jnp.float32)
    cz_ = jnp.ones(shape, jnp.float32)
    for rnd in range(n_rounds):
        k = jax.random.fold_in(key, rnd)
        xi = jax.random.uniform(k, (2,) + shape, jnp.float32)
        cost = xi[0] * (1.0 - costm) + costm
        sint = jnp.sqrt(jnp.maximum(1.0 - cost * cost, 0.0))
        phi = 2.0 * math.pi * xi[1]
        kx = sint * jnp.cos(phi)
        ky = sint * jnp.sin(phi)
        dist = dist_wall / cost
        x = dist * kx
        y = dist * ky
        ok = jnp.logical_and(
            jnp.logical_and(x >= meta.xmin, x <= meta.xmax),
            jnp.logical_and(y >= meta.ymin, y <= meta.ymax))
        take = jnp.logical_and(~acc, ok)
        x_ = jnp.where(take, x, x_)
        y_ = jnp.where(take, y, y_)
        kx_ = jnp.where(take, kx, kx_)
        ky_ = jnp.where(take, ky, ky_)
        cz_ = jnp.where(take, cost, cz_)
        nrej = nrej + jnp.where(jnp.logical_and(~acc, ~ok), 1.0, 0.0)
        acc = jnp.logical_or(acc, ok)
    # stragglers: straight down the axis
    strag = ~acc
    x_ = jnp.where(strag, 0.0, x_)
    y_ = jnp.where(strag, 0.0, y_)
    kx_ = jnp.where(strag, 0.0, kx_)
    ky_ = jnp.where(strag, 0.0, ky_)
    cz_ = jnp.where(strag, 1.0, cz_)
    z = jnp.full(shape, meta.zmin if below else meta.zmax, jnp.float32)
    kz = cz_ if below else -cz_
    wgt = jnp.ones(shape, jnp.float32)
    return x_, y_, z, kx_, ky_, kz, wgt, flux_fac1 * wgt, nrej


def sample_radius_loglog(key, p_tab, r_tab, shape):
    """Radius draw by log-log interpolation of inverse-CDF knots (the table
    equivalent of rand_r1exp/rand_r2exp/rand_sersic)."""
    p = jnp.maximum(jax.random.uniform(key, shape, jnp.float32), 1e-12)
    lr = jnp.interp(jnp.log(p), jnp.log(p_tab), jnp.log(r_tab))
    return jnp.exp(lr)


def sample_alias_linear(key, src: SourceTables, shape):
    """1-D profile draw: alias over bins + trapezoid-linear within the bin
    (random_alias_linear, reference src/random_mt.f90:2240-2336).
    Returns (x, wgt)."""
    k1, k2 = jax.random.split(key)
    idx = samplers.alias_sample(k1, src.ep_palias, src.ep_alias, shape)
    xi = jax.random.uniform(k2, shape, jnp.float32)
    x0 = src.ep_axis[idx]
    x1 = src.ep_axis[idx + 1]
    p0 = src.ep_prob[idx]
    p1 = src.ep_prob[idx + 1]
    dp = p1 - p0
    # linear-density inverse CDF within the bin; fall back to uniform when
    # the density is flat across the bin
    root = jnp.sqrt(jnp.maximum(p0 * p0 + (p1 * p1 - p0 * p0) * xi, 0.0))
    x = jnp.where(jnp.abs(dp) > 1e-30,
                  (root - p0) * (x1 - x0) / jnp.where(dp == 0, 1.0, dp) + x0,
                  x0 + xi * (x1 - x0))
    if src.ep_wgt is not None:
        w0 = src.ep_wgt[idx]
        w1 = src.ep_wgt[idx + 1]
        wgt = (w1 - w0) / jnp.maximum(x1 - x0, 1e-30) * (x - x0) + w0
    else:
        wgt = jnp.ones(shape, jnp.float32)
    return x, wgt
