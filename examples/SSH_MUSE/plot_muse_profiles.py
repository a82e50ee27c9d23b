#!/usr/bin/env python
"""Compare SSH halo models against MUSE-style observables (the logic of
the reference examples/SSH_MUSE/plot_muse_profiles.py, redrawn with the
lart_tpu analysis surface).

For each halo output this produces the three MUSE panels:
  1. the spatially-integrated emergent spectrum, smoothed to the MUSE
     resolution R ~ 3000 at the halo redshift,
  2. the seeing-convolved (Moffat PSF) surface-brightness radial profile,
  3. the polarization radial profile when Stokes cubes were saved.

Run the models first (mk_inputs.py writes halo_<id>.in):
    python mk_inputs.py && for f in halo_*.in; do python -m lart_tpu $f; done
    python plot_muse_profiles.py halo_1185.h5 [...]
"""
import os
import sys

import numpy as np

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

from lart_tpu.analysis import read_lart

WAVL0 = 1215.67          # Lya rest wavelength [A]
MUSE_R = 3000.0          # MUSE spectral resolution
SEEING_FWHM_PIX = 3.0    # Moffat seeing FWHM in image pixels
MOFFAT_BETA = 2.5

# categorical palette slots (skill-validated defaults)
COLORS = ['#2a78d6', '#eb6834', '#1baf7a', '#eda100']


def plot_halo(fname, axs, color, redshift=3.0):
    o = read_lart(fname)
    label = os.path.splitext(os.path.basename(fname))[0]

    ax_sp, ax_sb, ax_pol = axs
    if not o.peel:
        # no peel cube: fall back to the emergent spectrum only
        ax_sp.plot(o.xfreq, o.Jout / max(o.Jout.sum(), 1e-30),
                   color=color, label=label)
        return

    obs = o.peel[0]
    temp = o.header.get('temp', 1e4)
    vtherm = 0.12843374 * np.sqrt(temp)

    # MUSE resolution in frequency bins: dlambda_FWHM = lambda/R,
    # dx_bin = dxfreq, and dlambda/dx = lambda0 * vtherm/c
    dxfreq = float(o.xfreq[1] - o.xfreq[0])
    c_kms = 2.99792458e5
    fwhm_x = (c_kms / MUSE_R) / vtherm
    sm = obs.convolve_spectral(fwhm_x / dxfreq)
    spec = sm.average_spectrum()
    ax_sp.plot(o.xfreq, spec / max(spec.sum(), 1e-30), color=color,
               label=label)

    see = obs.convolve_psf(SEEING_FWHM_PIX, kind='moffat',
                           beta=MOFFAT_BETA)
    r, sb = see.radial_sb_profile()
    pk = np.nanmax(sb[1:]) if sb.size > 1 else 1.0
    ax_sb.plot(r, sb / max(pk, 1e-30), color=color, label=label)

    try:
        rp, pol = obs.polarization_radial_profile()
        ax_pol.plot(rp / max(rp.max(), 1e-30), 100.0 * pol, color=color,
                    label=label)
    except ValueError:
        pass


def main(argv=None):
    files = (argv if argv is not None else sys.argv[1:]) \
        or ['halo_1185.h5']
    fig, axs = plt.subplots(1, 3, figsize=(11, 3.6), facecolor='#fcfcfb')
    for ax in axs:
        ax.set_facecolor('#fcfcfb')
        ax.grid(color='#e6e5e1', lw=0.6)
        ax.set_axisbelow(True)
        for s in ('top', 'right'):
            ax.spines[s].set_visible(False)
    n = 0
    for i, fn in enumerate(files):
        try:
            plot_halo(fn, axs, COLORS[i % len(COLORS)])
            n += 1
        except (FileNotFoundError, OSError):
            print(f'skip {fn} (run the model first)', file=sys.stderr)
    if n == 0:
        print('nothing to plot', file=sys.stderr)
        return 1
    axs[0].set_xlabel(r'$x=(\nu-\nu_0)/\Delta\nu_{\rm D}$')
    axs[0].set_ylabel('normalized flux')
    axs[1].set_xlabel(r'$r/r_{\rm max}$')
    axs[1].set_ylabel('surface brightness (peak = 1)')
    axs[1].set_yscale('log')
    axs[2].set_xlabel(r'$r/r_{\rm max}$')
    axs[2].set_ylabel('polarization [%]')
    axs[0].legend(frameon=False, fontsize=8)
    fig.tight_layout()
    fig.savefig('fig_muse_profiles.png', dpi=150)
    print('wrote fig_muse_profiles.png')
    return 0


if __name__ == '__main__':
    sys.exit(main())
