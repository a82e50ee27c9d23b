#!/usr/bin/env python3
"""Generate the SiII 1193 resonance+fluorescence input matrix
(reference examples/SiII_1193: tau x Vexp grid).  SiII 1193 decays to
both the ground level (1193) and the fine-structure excited level
(1197 fluorescence), so the emergent spectrum splits into a resonance
component and a fluorescent component whose ratio tracks tau."""
import os

THIS_DIR = os.path.dirname(os.path.abspath(__file__))

TEMPLATE = """\
&parameters
 par%line_id = 'SiII_1193'
 par%no_photons   = {nph:.1e}
 par%temperature  = 3.81929e+05
 par%taumax       = {tau:.5e}
 par%velocity_type = 'hubble'
 par%Vexp         = {vexp:.1f}
 par%DGR             = 0.0000
 par%use_stokes = .true.
 par%save_direc0     = .true.
 par%recoil          = .true.
 par%geometry        = 'sphere'
 par%source_geometry = 'point'
 par%source_rmax     = 1.0000
 par%spectral_type   = 'continuum'
 par%nx               = 101
 par%ny               = 101
 par%nz               = 101
 par%rmax             = 1.0000
 par%xmax             = 1.0000
 par%ymax             = 1.0000
 par%zmax             = 1.0000
 par%nwavelength    = 240
 par%wavelength_min = 1188.0
 par%wavelength_max = 1200.0
 par%distance = 1.0e+03
 par%nxim     = 100
 par%nyim     = 100
 par%save_peeloff = .true.
 par%nobs = 1
 par%alpha(1) = 0.0
 par%beta(1)  = 0.0
 par%out_file = '{name}.h5'
/
"""


def main(nph=1e5):
    for tau in (1.0, 10.0, 100.0):
        for vexp in (0.0, 200.0):
            name = f'tau{tau:.0e}_V{vexp:03.0f}'.replace('e+0', 'e+')
            with open(os.path.join(THIS_DIR, name + '.in'), 'w') as fh:
                fh.write(TEMPLATE.format(nph=nph, tau=tau, vexp=vexp,
                                         name=name))
            print('wrote', name + '.in')


if __name__ == '__main__':
    main()
