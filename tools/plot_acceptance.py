"""Render the committed acceptance artifact as a figure.

The reference commits run logs and figures per example directory
(examples/amr_sphere_generic logs, examples/DL2008/plot_fig.py); this
renders results/acceptance_r2.json -- every analytic case's emergent
spectrum against its analytic solution with the documented finite-(a
tau0) systematic band, plus the cross-backend parity overlay -- to
results/fig_acceptance.png.

Usage: LART_ACCEPT_CPU=1 python tools/plot_acceptance.py
"""
import json
import os
import sys

import numpy as np

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# categorical slots of the validated default palette
C_MODEL, C_ANALYTIC = '#2a78d6', '#eb6834'
C_BACKENDS = {'cartesian': '#2a78d6', 'amr': '#eb6834', 'clump': '#1baf7a'}
SURF, GRID_C, TXT2 = '#fcfcfb', '#e6e5e1', '#52514e'


def style(ax):
    ax.set_facecolor(SURF)
    ax.grid(color=GRID_C, lw=0.6)
    ax.set_axisbelow(True)
    for s in ('top', 'right'):
        ax.spines[s].set_visible(False)


def main():
    path = os.path.join(HERE, 'results', 'acceptance_r2.json')
    with open(path) as fh:
        art = json.load(fh)
    cases = [c for c in art['cases'] if 'J_model' in c]
    parity = [c for c in art['cases'] if c['case'] == 'parity_sphere']
    ncols = len(cases) + (1 if parity else 0)
    fig, axs = plt.subplots(1, ncols, figsize=(3.4 * ncols, 3.4),
                            facecolor=SURF)
    axs = np.atleast_1d(axs)

    sys_coef = art['thresholds'].get('sys_coef', 0.0)
    for ax, c in zip(axs, cases):
        style(ax)
        x = np.asarray(c['x'])
        pm = np.asarray(c['J_model'])
        pa = np.asarray(c['J_analytic'])
        if sys_coef and c.get('atau0'):
            band = sys_coef * c['atau0'] ** (-1 / 3) * pa.max()
            ax.fill_between(x, pa - band, pa + band, color=C_ANALYTIC,
                            alpha=0.18, lw=0,
                            label='analytic ± model error')
        ax.plot(x, pa, color=C_ANALYTIC, lw=2, label='analytic')
        ax.plot(x, pm, color=C_MODEL, lw=1.4, label='MC (this work)')
        t = '10' if c['T'] < 100 else '10$^4$'
        ax.set_title(rf"$\tau_0$=10$^{{{int(np.log10(c['tau0']))}}}$, "
                     rf"T={t} K, $a\tau_0$={c['atau0']:.0f}", fontsize=10)
        ax.set_xlabel(r'$x$')
        ax.text(0.03, 0.95,
                rf"$\chi^2/\nu$={c['chi2_dof']:.2f}"
                + (f" (raw {c['chi2_raw_dof']:.0f})"
                   if 'chi2_raw_dof' in c else ''),
                transform=ax.transAxes, va='top', fontsize=8, color=TXT2)
    axs[0].set_ylabel(r'$J(x)$ (unit area)')
    axs[0].legend(frameon=False, fontsize=7, loc='lower center')

    if parity:
        ax = axs[len(cases)]
        style(ax)
        c = parity[0]
        x = np.asarray(c['x'])
        for name, J in c['J'].items():
            ax.plot(x, np.asarray(J), color=C_BACKENDS[name], lw=1.4,
                    label=name)
        ax.set_title(rf"cross-backend parity, $\tau_0$={c['tau0']:.0f}",
                     fontsize=10)
        ax.set_xlabel(r'$x$')
        ax.legend(frameon=False, fontsize=7)

    fig.suptitle('lart-tpu physics acceptance '
                 f"({art['platform']}, committed artifact)", fontsize=11)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    out = os.path.join(HERE, 'results', 'fig_acceptance.png')
    fig.savefig(out, dpi=150)
    print(f'wrote {out}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
