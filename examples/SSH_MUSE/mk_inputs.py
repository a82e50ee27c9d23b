#!/usr/bin/env python
"""Generate inputs for the Song, Seon & Hwang (2020) SSH halo models fit
to MUSE/Leclercq+2017 Ly-alpha halos (reference examples/SSH_MUSE/
mk_inputs.py reading Leclercq/muse_bestfit.txt).

Each halo: Sersic-like UV source of scale rsUV, exponential HI halo of
scale rsHI, SSH velocity profile (Vpeak at rpeak, linear DeltaV beyond),
total line-center tau0, and dust DGR.  A representative subset of the
published best-fit table is embedded here (id, rsUV, rsHI, rpeak, Vpeak,
DeltaV, log10 tau0, DGR).
"""
import os

THIS_DIR = os.path.dirname(os.path.abspath(__file__))

# id     rsUV   rsHI  rpeak  Vpeak  DeltaV  log10tau  DGR
HALOS = [
    ('1185', 0.041, 0.3, 0.2, 300.0, -150.0, 6.6, 0.0),
    ('0082', 0.017, 0.5, 0.1, 300.0, -250.0, 6.6, 2.0),
    ('6905', 0.029, 0.1, 0.0, 300.0, -300.0, 6.3, 0.0),
    ('1343', 0.016, 0.8, 0.4, 200.0, -200.0, 6.9, 2.0),
    ('0053', 0.030, 0.4, 0.1, 300.0,  -50.0, 6.3, 2.0),
]

TEMPLATE = """\
&parameters
 par%no_photons  = {nph:.1e}
 par%temperature = 1.0e4
 par%taumax      = {tau0:.4e}
 par%DGR         = {dgr:.2f}
 par%use_reduced_wgt = .true.
 par%use_stokes      = .true.
 par%save_sightline_tau = .true.
 par%save_peeloff       = .true.
 par%save_peeloff_2D    = .true.
 par%comoving_source = .false.
 par%save_Jin        = .true.
 par%source_geometry = 'ssh'
 par%source_rscale   = {rsUV}
 par%velocity_type   = 'ssh'
 par%rpeak  = {rpeak}
 par%Vpeak  = {vpeak}
 par%DeltaV = {deltav}
 par%density_rscale = {rsHI}
 par%geometry = 'sphere'
 par%spectral_type = 'voigt'
 par%xmax = 1.0
 par%ymax = 1.0
 par%zmax = 1.0
 par%rmax = 1.0
 par%nx   = 201
 par%ny   = 201
 par%nz   = 201
 par%nxim = 129
 par%nyim = 129
 par%nxfreq    = 401
 par%xfreq_min = -150.0
 par%xfreq_max =   50.0
 par%distance  = 1e3
 par%nobs = 1
 par%alpha(1) = 0.0
 par%beta(1)  = 0.0
 par%out_file = 'halo_{hid}.h5'
/
"""


def main(nph=1e5):
    for hid, rsUV, rsHI, rpeak, vpeak, deltav, ltau, dgr in HALOS:
        path = os.path.join(THIS_DIR, f'halo_{hid}.in')
        with open(path, 'w') as fh:
            fh.write(TEMPLATE.format(nph=nph, tau0=10.0 ** ltau, dgr=dgr,
                                     rsUV=rsUV, rsHI=rsHI, rpeak=rpeak,
                                     vpeak=vpeak, deltav=deltav, hid=hid))
        print('wrote', path)


if __name__ == '__main__':
    main()
