"""Generate the SiII_1527 input matrix (reference: examples/SiII_1527/).

Si II 1526.7 resonance line + its 1533.4 fluorescent channel
(line_type 4) at T = 1e5 K over tau0 = {1, 2, 5, 10, 20} x
Vexp = {0, 50, 100} km/s Hubble outflows -- the emission-line /
absorption-trough morphology study grid."""
import os

HERE = os.path.dirname(os.path.abspath(__file__))

TEMPLATE = """&parameters
 par%line_id     = 'SiII_1527'
 par%no_photons  = 1e6
 par%temperature = 1.0e5
 par%taumax      = {tau:.1e}
 par%use_stokes  = .false.
 par%DGR         = 0.0
 par%velocity_type = 'hubble'
 par%Vexp        = {vexp:.1f}
 par%save_Jin    = .true.
 par%nx = 65
 par%ny = 65
 par%nz = 65
 par%rmax   = 1.0
 par%wavelength_min = 1516.0
 par%wavelength_max = 1546.0
 par%nwavelength    = 800
 par%out_file = '{name}'
/
"""


def main():
    for tau, ts in [(1e0, '1e0'), (2e0, '2e0'), (5e0, '5e0'),
                    (1e1, '1e1'), (2e1, '2e1')]:
        for vexp in (0.0, 50.0, 100.0):
            name = f't1e5tau{ts}' + ('' if vexp == 0
                                     else f'_V{int(vexp):03d}')
            with open(os.path.join(HERE, name + '.in'), 'w') as fh:
                fh.write(TEMPLATE.format(tau=tau, vexp=vexp, name=name))
            print(name + '.in')


if __name__ == '__main__':
    main()
