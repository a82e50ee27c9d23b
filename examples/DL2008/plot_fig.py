#!/usr/bin/env python
"""Reproduce the Dijkstra & Loeb (2008) expanding-shell spectra figure
(reference examples/DL2008/plot_fig.py, redrawn with the lart_tpu reader).

The emergent profile of a 200 km/s expanding N_HI=1e20 shell shows the
characteristic dominant red peak near x ~ -2 v_exp/v_th with a suppressed
blue peak; dust preferentially removes the long-path blue photons.
"""
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

from lart_tpu.analysis import read_lart

fig, ax = plt.subplots(figsize=(6, 4))
for fname, label in [('DL20e.h5', r'$N_{\rm HI}=10^{20}$, no dust'),
                     ('DL20e_dust.h5', r'$N_{\rm HI}=10^{20}$, DGR=1')]:
    try:
        o = read_lart(fname)
    except (FileNotFoundError, OSError):
        print(f'skip {fname} (run the .in first)', file=sys.stderr)
        continue
    ax.plot(o.xfreq, o.Jout, label=label)
ax.set_xlabel(r'$x = (\nu-\nu_0)/\Delta\nu_D$')
ax.set_ylabel(r'$J(x)$')
ax.set_xlim(-140, 90)
ax.legend()
fig.tight_layout()
fig.savefig('fig_DL2008.png', dpi=150)
print('wrote fig_DL2008.png')
