"""Generate the FeII_turb input matrix (reference: examples/FeII_turb/).

Fe II UV1/UV2/UV3 multiplets through a turbulent (fractional-Brownian-
motion-like) density cube with b_turb = 90 km/s, continuum injection,
Hubble outflows Vexp = 0/50/100 km/s, Stokes peel images.

The reference runs read an external M=10, b=0.4 fBm cube
(M010b040_001.fits.gz) that is not shipped; ``mk_turb_cube.py`` here
synthesizes a statistically similar lognormal cube so the suite is
self-contained.
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))

WINDOWS = {
    # multiplet: (wavelength_min, wavelength_max) [Angstrom]
    'FeII_UV1': (2584.0, 2634.0),
    'FeII_UV2': (2365.0, 2415.0),
    'FeII_UV3': (2240.0, 2290.0),
}

TEMPLATE = """&parameters
 par%line_id     = '{line}'
 par%no_photons  = 1e6
 par%bturb       = 90.0
 par%taumax      = 2.0e1
 par%dens_file   = 'turb_cube.h5'

 par%use_stokes  = .true.
 par%DGR         = 0.0
 par%spectral_type = 'continuum'
 par%velocity_type = 'hubble'
 par%Vexp        = {vexp:.1f}
 par%save_Jin    = .true.
 par%nx = 65
 par%ny = 65
 par%nz = 65
 par%rmax   = 1.0
 par%wavelength_min = {wmin:.1f}
 par%wavelength_max = {wmax:.1f}
 par%nwavelength    = 500
 par%save_peeloff   = .true.
 par%nxim   = 65
 par%nyim   = 65
 par%distance = 1.0e4
 par%save_radial_profile = .true.
 par%out_file = '{name}'
/
"""


def main():
    for line, (wmin, wmax) in WINDOWS.items():
        for vexp in (0.0, 50.0, 100.0):
            name = line if vexp == 0 else f'{line}_V{int(vexp):03d}'
            with open(os.path.join(HERE, name + '.in'), 'w') as fh:
                fh.write(TEMPLATE.format(line=line, vexp=vexp,
                                         wmin=wmin, wmax=wmax, name=name))
            print(name + '.in')


if __name__ == '__main__':
    main()
