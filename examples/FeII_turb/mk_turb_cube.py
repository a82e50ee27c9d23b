"""Synthesize a turbulent lognormal density cube for the FeII_turb suite.

Stands in for the reference's external fBm cube (M010b040_001.fits.gz,
isothermal Mach-10 turbulence): a Gaussian random field with a k^-11/3
power spectrum, exponentiated to a lognormal density with sigma_lnrho
set by the Mach-10 relation sigma^2 = ln(1 + (b M)^2), b = 0.4.

Writes turb_cube.h5 with a 'density' dataset (relative units -- the run
re-normalizes opacity to par%taumax, grid_mod_car.f90:490-537 semantics).
"""
import os

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def make_cube(n=65, mach=10.0, b=0.4, seed=20260820):
    rng = np.random.default_rng(seed)
    k = np.fft.fftfreq(n) * n
    kx, ky, kz = np.meshgrid(k, k, k, indexing='ij')
    kk = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
    kk[0, 0, 0] = 1.0
    amp = kk ** (-11.0 / 6.0)          # E(k) ~ k^-11/3 => |F| ~ k^-11/6
    amp[0, 0, 0] = 0.0
    phase = rng.standard_normal((n, n, n)) + 1j * rng.standard_normal((n, n, n))
    g = np.fft.ifftn(amp * phase).real
    g = (g - g.mean()) / g.std()
    sigma = np.sqrt(np.log(1.0 + (b * mach) ** 2))
    rho = np.exp(sigma * g - 0.5 * sigma ** 2)    # <rho> = 1
    return rho.astype(np.float32)


def main():
    rho = make_cube()
    path = os.path.join(HERE, 'turb_cube.h5')
    with h5py.File(path, 'w') as fh:
        fh.create_dataset('density', data=rho)
    print(f'{path}: {rho.shape}, <rho>={rho.mean():.3f}, '
          f'max/min={rho.max():.1f}/{rho.min():.2e}')


if __name__ == '__main__':
    main()
