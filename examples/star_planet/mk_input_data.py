"""Build the 1-D atmosphere profiles + injected line profile for the
star_planet (WASP-52b-like) transit suite (reference:
examples/star_planet/mk_input_data.py writes dens/temp/velo_profile.txt
and line_profile.txt).

Profiles are radius-parameterized text tables (r, value) in planet-radius
units: an isothermal escaping upper atmosphere with a beta-power density
law and a Parker-like radial outflow; the stellar injection spectrum is
the Lya line with a self-reversed core."""
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main(rmin=0.55, rmax=10.0, n=200):
    r = np.linspace(rmin, rmax, n)
    dens = (r / rmin) ** (-2.5)                    # escaping envelope
    temp = np.full_like(r, 9.0e3)                  # ~1e4 K upper atmosphere
    velo = 10.0 * (1.0 - np.exp(-(r - rmin)))      # accelerating outflow

    for name, val in (('dens_profile.txt', dens),
                      ('temp_profile.txt', temp),
                      ('velo_profile.txt', velo)):
        np.savetxt(os.path.join(HERE, name),
                   np.column_stack([r, val]), fmt='%.6e',
                   header='r[R_planet]  value')

    # stellar Lya profile: double-peaked (self-reversed core), in
    # wavelength [Angstrom] vs relative flux
    wave = np.linspace(1214.0, 1217.4, 341)
    x = (wave - 1215.67) / 0.5
    prof = (np.exp(-((x - 0.8) ** 2)) + np.exp(-((x + 0.8) ** 2))) \
        * (1.0 - 0.85 * np.exp(-(x / 0.35) ** 2)) + 1e-4
    np.savetxt(os.path.join(HERE, 'line_profile.txt'),
               np.column_stack([wave, prof]), fmt='%.6e',
               header='wavelength[A]  relative_flux')
    print('wrote dens/temp/velo_profile.txt + line_profile.txt')


if __name__ == '__main__':
    main()
