"""Namelist parsing and mode resolution."""

import math

from lart_tpu.config import Params

T1TAU6 = """
&parameters
 par%no_photons  = 1e5
 par%temperature = 1.0e1
 par%taumax      = 1.0e6
 par%Vexp        = 0.0
 par%hgg         = 0.6592
 par%albedo      = 0.3899
 par%DGR         = 0.0
 par%use_stokes  = .true.
 par%save_Jin    = .true.
 par%spectral_type = 'voigt'
 par%recoil      = .false.
 par%xy_periodic = .true.
 par%nx = 1
 par%ny = 1
 par%nz = 201
 par%xmax   = 1.0
 par%ymax   = 1.0
 par%zmax   = 1.0
 par%nprint = 1000000
/
"""


def test_namelist_parse():
    p = Params.from_namelist(T1TAU6)
    assert p.nphotons == 100_000
    assert p.temperature == 10.0
    assert p.taumax == 1e6
    assert p.xy_periodic is True
    assert p.use_stokes is True
    assert p.nz == 201
    assert p.spectral_type == 'voigt'


def test_array_params():
    p = Params.from_namelist("""
&parameters
 par%save_peeloff = .true.
 par%alpha(1) = 0.0
 par%beta(1)  = 0.0
 par%alpha(2) = 90.0
 par%beta(2)  = 45.0
/
""")
    assert p.alpha == (0.0, 90.0)
    assert p.beta == (0.0, 45.0)


def test_resolution_slab():
    p = Params.from_namelist(T1TAU6)
    cfg = p.resolve()
    assert cfg.bc_x == 'periodic' and cfg.bc_z == 'escape'
    assert cfg.line.line_type == 1          # Lya without fine structure
    # T=10 K Lya: a = damping/(4 pi Dfreq)
    assert abs(cfg.voigt_a_ref - 1.49e-2) / 1.49e-2 < 0.01


def test_line_catalog():
    from lart_tpu.lines import get_line
    lya = get_line('ly_alpha')
    assert abs(lya.wavelength0 - 0.1215668237310) < 1e-12
    assert abs(lya.cross0 - 0.026540083434 / math.sqrt(math.pi)
               * (0.27760 + 0.13881)) < 1e-12
    civ = get_line('CIV_1548')
    assert civ.line_type == 2 and civ.DnuHK_Hz > 0
    si = get_line('SiII_1527')
    assert si.line_type == 4
    assert abs(sum(si.branches[0].P_down) - 1.0) < 1e-12
    lyb = get_line('ly_beta')
    assert abs(lyb.branches[0].P_down[1] - 0.11834) < 1e-4   # conversion branch
    hd = get_line('ly_alpha', include_deuterium=True)
    assert hd.line_type == 7 and hd.ratio_Dfreq_HD > 1.0
