"""Generate the HeI_sphere_cont inputs (reference: examples/HeI_sphere_cont/).

He I 10833 triplet (line_type 6: three upward transitions, one lower
level) in a uniform sphere with a UNIFORM volume source and flat
continuum injection, tau0 = 1, 10, 100, 1000 -- the <N_scatt>(tau)
calibration used by write_nscatt2.py."""
import os

HERE = os.path.dirname(os.path.abspath(__file__))

TEMPLATE = """&parameters
 par%line_id      = 'HeI_10833'
 par%no_photons   = 1e6
 par%temperature  = 1.0e4
 par%taumax       = {tau:.5e}
 par%DGR          = 0.0
 par%comoving_source = .false.
 par%recoil       = .false.
 par%geometry        = 'sphere'
 par%source_geometry = 'uniform_sphere'
 par%source_rmax     = 1.0
 par%spectral_type   = 'continuum'
 par%nx = 65
 par%ny = 65
 par%nz = 65
 par%rmax = 1.0
 par%nvelocity    = 201
 par%velocity_min = -80.0
 par%velocity_max =  40.0
 par%out_file = '{name}'
/
"""


def main():
    for expo in range(4):
        name = f't4tau{expo}'
        with open(os.path.join(HERE, name + '.in'), 'w') as fh:
            fh.write(TEMPLATE.format(tau=10.0 ** expo, name=name))
        print(name + '.in')


if __name__ == '__main__':
    main()
