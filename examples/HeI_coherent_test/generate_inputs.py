#!/usr/bin/env python3
"""Generate the HeI 10833 coherent-vs-incoherent input matrix
(reference examples/HeI_coherent_test/generate_inputs.py):

    source geometry: central point ('pt') vs filled sphere ('un')
    taumax: 0.1, 1, 10, 100, 1000
    HeI_coherent: .false. ('inc') vs .true. ('coh')

The HeI 10833 triplet has three upward transitions but ONE downward
branch; coherent mode computes frequency-dependent Rayleigh/isotropic
E1/E3 weights (reference line_mod.f90:8-34 compute_HeI_E_coherent).
The coherent-incoherent spectral difference vanishes at high tau and is
maximal near tau ~ 1-10.
"""
import os

THIS_DIR = os.path.dirname(os.path.abspath(__file__))

TEMPLATE = """\
&parameters
 par%line_id      = 'HeI_10833'
 par%HeI_coherent = {coh}
 par%no_photons   = {nph:.1e}
 par%temperature  = 1.0e4
 par%taumax       = {tau:.4e}
 par%DGR             = 0.0
 par%comoving_source = .false.
 par%recoil          = .false.
 par%use_stokes      = .true.
 par%geometry        = 'sphere'
 par%source_geometry = '{src}'
 par%source_rmax     = 1.0
 par%spectral_type   = 'voigt'
 par%nx               = 101
 par%ny               = 101
 par%nz               = 101
 par%rmax             = 1.0
 par%nvelocity        = 201
 par%velocity_min     = -120.0
 par%velocity_max     = 60.0
 par%save_peeloff     = .true.
 par%save_peeloff_3D  = .true.
 par%nxim             = 101
 par%nyim             = 101
 par%distance         = 100.0
 par%nobs             = 1
 par%alpha(1)         = 0.0
 par%beta(1)          = 0.0
 par%out_file         = '{name}.h5'
/
"""


def main(nph=1e5):
    for tau in (0.1, 1.0, 10.0, 100.0, 1000.0):
        for src_tag, src in (('pt', 'point'), ('un', 'uniform_sphere')):
            for coh_tag, coh in (('inc', '.false.'), ('coh', '.true.')):
                tau_s = f'{tau:g}'
                name = f'{src_tag}_tau{tau_s}_{coh_tag}'
                with open(os.path.join(THIS_DIR, name + '.in'), 'w') as fh:
                    fh.write(TEMPLATE.format(coh=coh, nph=nph, tau=tau,
                                             src=src, name=name))
                print('wrote', name + '.in')


if __name__ == '__main__':
    main()
