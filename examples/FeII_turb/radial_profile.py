"""Radial surface-brightness + polarization profiles from a FeII_turb
peel image (reference: examples/FeII_turb/radial_profile.py, plot_pol.py)."""
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from lart_tpu import analysis


def main(stem):
    out = analysis.read_lart(stem if stem.endswith(('.h5', '.fits'))
                             else stem + '.h5')
    peel = out.peel[0]
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    out.plot_peeling_map(0, component='scatt', ax=axes[0])
    out.plot_peeling_radial_profile(0, ax=axes[1])

    # degree of polarization vs radius from the Stokes radial profiles
    prof = getattr(peel, 'radial', None)
    if prof is not None and 'Q' in prof:
        r = prof['r']
        I = np.maximum(prof['I'], 1e-300)
        p = np.sqrt(prof['Q'] ** 2 + prof['U'] ** 2) / I
        axes[2].plot(r, 100 * p)
        axes[2].set_xlabel('r / rmax')
        axes[2].set_ylabel('polarization degree [%]')
    fig.tight_layout()
    fig.savefig(f'{stem}_radial.png', dpi=130)
    print(f'{stem}_radial.png')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'FeII_UV1_V100')
