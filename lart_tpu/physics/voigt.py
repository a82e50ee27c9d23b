"""Vectorized Voigt function H(a, x) for TPU.

The reference evaluates H(a,x) one scalar at a time with table-interpolated
Harris expansions (reference: src/voigt_mod.f90:541-736, voigt_seon2).  Table
lookups with data-dependent indices are hostile to the VPU, so we instead use
Humlicek's (1982) four-region rational approximation of the complex
probability function w(z), written in explicit real arithmetic so it maps to
pure elementwise VPU ops with no gathers.  All four regional forms are
evaluated and blended with `where` (lanes are cheap; divergence is not).

Relative accuracy is ~1e-4 over the full (a, x) domain of interest
(a in [1e-6, 1e-1], |x| < 3e3), far below Monte Carlo noise.  Verified
against scipy.special.wofz in tests/test_voigt.py.
"""

from __future__ import annotations

import jax.numpy as jnp

_ONE_OVER_SQRTPI = 0.5641895835477563


def _humlicek_w4_real(x, y):
    """Re[w(x + i y)] for y > 0 via Humlicek (1982) w4, real arithmetic.

    Region selection by s = |x| + y:
      I   : s >= 15          w = t / sqrt(pi) / (0.5 + t^2)
      II  : 5.5 <= s < 15    rational in u = t^2
      III : s < 5.5, y >= 0.195|x| - 0.176   degree-4/5 rational in t
      IV  : else             exp(u) - rational(u)
    with t = y - i x,  u = t^2.
    """
    ax = jnp.abs(x)
    s = ax + y

    # complex helpers in real pairs: t = y - i x -> (tr, ti) = (y, -x)
    tr, ti = y, -x
    # u = t^2
    ur = tr * tr - ti * ti
    ui = 2.0 * tr * ti

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def cdiv_re(ar, ai, br, bi):
        """Re[(ar + i ai)/(br + i bi)] with safe denominator."""
        den = br * br + bi * bi
        den = jnp.where(den == 0.0, 1.0, den)
        return (ar * br + ai * bi) / den

    # --- Region I: w = t * c / (0.5 + t^2)
    nr, ni = _ONE_OVER_SQRTPI * tr, _ONE_OVER_SQRTPI * ti
    w1 = cdiv_re(nr, ni, 0.5 + ur, ui)

    # --- Region II: w = t (1.410474 + u * 0.5641896) / (0.75 + u (3 + u))
    ar, ai = 1.410474 + 0.5641896 * ur, 0.5641896 * ui
    nr, ni = cmul(tr, ti, ar, ai)
    br, bi = 3.0 + ur, ui
    br, bi = cmul(ur, ui, br, bi)
    w2 = cdiv_re(nr, ni, 0.75 + br, bi)

    # --- Region III: polynomial ratio in t
    def poly_t(coefs):
        pr = jnp.full_like(x, coefs[0])
        pi = jnp.zeros_like(x)
        for c in coefs[1:]:
            pr, pi = cmul(pr, pi, tr, ti)
            pr = pr + c
        return pr, pi

    nr, ni = poly_t([0.5642236, 3.778987, 11.96482, 20.20933, 16.4955])
    br, bi = poly_t([1.0, 6.699398, 21.69274, 39.27121, 38.82363, 16.4955])
    w3 = cdiv_re(nr, ni, br, bi)

    # --- Region IV: w = exp(u) - t * P(u) / Q(u)
    def poly_u_down(coefs):
        # coefs from highest "nesting": c0 - u (c1 - u (c2 - ...))
        pr = jnp.full_like(x, coefs[-1])
        pi = jnp.zeros_like(x)
        for c in coefs[-2::-1]:
            qr, qi = cmul(ur, ui, pr, pi)
            pr, pi = c - qr, -qi
        return pr, pi

    nr_p, ni_p = poly_u_down([36183.31, 3321.9905, 1540.787, 219.0313,
                              35.76683, 1.320522, 0.56419])
    dr_p, di_p = poly_u_down([32066.6, 24322.84, 9022.228, 2186.181,
                              364.2191, 61.57037, 1.841439, 1.0])
    nr, ni = cmul(tr, ti, nr_p, ni_p)
    # exp(u) for complex u, real part: exp(ur) * cos(ui).
    # In region IV, ur = y^2 - x^2 <= ~30 (s < 5.5), so no overflow; clamp
    # anyway so unused lanes in other regions cannot produce inf.
    e_r = jnp.exp(jnp.clip(ur, -88.0, 50.0)) * jnp.cos(ui)
    w4 = e_r - cdiv_re(nr, ni, dr_p, di_p)

    in1 = s >= 15.0
    in2 = jnp.logical_and(~in1, s >= 5.5)
    in3 = jnp.logical_and(s < 5.5, y >= 0.195 * ax - 0.176)
    in3 = jnp.logical_and(in3, ~in1)
    in3 = jnp.logical_and(in3, ~in2)
    return jnp.where(in1, w1, jnp.where(in2, w2, jnp.where(in3, w3, w4)))


def voigt(x, a):
    """Voigt-Hjerting function H(a, x) = Re[w(x + i a)], vectorized.

    x : dimensionless frequency offset in Doppler units (any shape)
    a : Voigt damping parameter (broadcastable to x, a > 0)
    """
    x = jnp.asarray(x)
    a = jnp.asarray(a)
    x, a = jnp.broadcast_arrays(x, a)
    return _humlicek_w4_real(x, a)


def voigt_profile_single(x, a):
    """H(a, x) for a single-component line (line_type 1, and types 4 etc.)."""
    return voigt(x, a)


def voigt_profile_doublet(x, a, DnuHK_over_Dfreq):
    """Two-component fine-structure profile (line_mod.f90:50-64, calc_voigt2).

    H_eff = H(x + DnuHK, a)/3 + 2 H(x, a)/3  (K:H statistical weights 2:1).
    """
    return (voigt(x + DnuHK_over_Dfreq, a) * (1.0 / 3.0)
            + voigt(x, a) * (2.0 / 3.0))


def voigt_profile_multiplet(x, a, dx_offsets, a_ratios, f_ratios):
    """Multi-upward-transition profile (calc_voigt3, line types 5/6).

    H_eff = H(x, a) + sum_i f_i/f_1 * H(x + dx_i, a * a_i/a_1)
    where dx_i = delE_Hz(i)/Dfreq (static per-line constants).
    """
    out = voigt(x, a)
    for dx, ar, fr in zip(dx_offsets, a_ratios, f_ratios):
        out = out + voigt(x + dx, a * ar) * fr
    return out


def voigt_profile_HD(x, a, dx_HD, ratio_Dfreq_HD, ratio_voigta_HD, nD_over_nH):
    """Combined H+D profile in H Doppler units (calc_voigt_HD, line_mod.f90:84-106)."""
    x_D = (x - dx_HD) * ratio_Dfreq_HD
    return (voigt(x, a)
            + nD_over_nH * ratio_Dfreq_HD * voigt(x_D, a * ratio_voigta_HD))
