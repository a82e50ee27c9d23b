"""Dijkstra & Loeb (2008) expanding-shell reproduction -> committed evidence.

The reference commits its literature reproductions as example dirs with a
plot script and (in the paper) the figure (reference examples/DL2008/README,
plot_fig.py; configs DL19e.in / DL20e.in).  This runner executes the same
two configs with the TPU engine, asserts the published qualitative physics,
and dumps the spectra + a figure as the committed artifact:

  * dominant RED peak near x ~ -2 v_exp / v_th  (backscattering off the
    receding far side of the 200 km/s shell; DL2008 fig. 2),
  * strongly suppressed blue peak (red/blue flux asymmetry),
  * the N_HI = 1e20 spectrum is broader and more red-shifted than 1e19.

Writes results/dl2008_spectra.json and results/fig_DL2008.png.
Scale photon budgets with LART_DL2008_SCALE (1.0 = the committed run);
LART_ACCEPT_CPU=1 routes to the virtual CPU mesh.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('LART_ACCEPT_CPU'):
    from lart_tpu.utils.platform import force_cpu
    force_cpu(8)

from lart_tpu.config import Params
from lart_tpu import driver

EXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples', 'DL2008')

# categorical slots 1-3 of the skill-validated default palette
C_19, C_20, C_IN = '#2a78d6', '#eb6834', '#1baf7a'


def run_case(infile, nphotons, *, grid_scale=1.0, seed=11):
    par = Params.from_namelist(os.path.join(EXDIR, infile))
    n = max(int(round(par.nx * grid_scale)) | 1, 33)   # keep odd
    par = dataclasses.replace(
        par, nphotons=nphotons, nx=n, ny=n, nz=n,
        save_peeloff=False, use_stokes=False,
        # a few % of photons scatter into the shell-frame core and
        # random-walk ~tau0 times (the physical trapped tail); core-skip
        # accelerates them without changing the emergent peaks materially
        core_skip=bool(os.environ.get('LART_DL2008_CORE_SKIP')),
        core_skip_global=(os.environ.get('LART_DL2008_CORE_SKIP')
                          == 'global'),
        batch_size=min(1 << 16,
                       1 << max(12, (nphotons - 1).bit_length())),
        # drain-dominated through the tunnel: long chunks amortize the
        # host<->device round-trip (4x wall-time win measured on tau1e6)
        chunk_cycles=int(os.environ.get('LART_DL2008_CHUNK_CYCLES', '256')),
        out_file='')
    t0 = time.time()
    last = [0.0]

    def progress(launched, ntot, alive):
        if time.time() - last[0] > 30.0:
            print(f"  [{infile}] {time.time()-t0:.0f}s launched={launched} "
                  f"alive={alive}", flush=True)
            last[0] = time.time()

    res = driver.run(par, seed=seed, progress=progress)
    x = res.xfreq
    J = res.Jout.copy()
    Jin = res.Jin.copy() if res.Jin is not None else None
    norm = max(np.trapezoid(J, x), 1e-30)
    out = {
        'infile': infile, 'nphotons': nphotons, 'N_HI': par.N_HI,
        'Vexp': par.Vexp, 'nscatt': float(res.nscatt_tot),
        'wall_s': time.time() - t0,
        'x': x.tolist(), 'J': (J / norm).tolist(),
        'Jin': (Jin / max(np.trapezoid(Jin, x), 1e-30)).tolist()
        if Jin is not None else None,
    }
    p = np.asarray(out['J'])
    out['xpeak'] = float(x[int(np.argmax(p))])
    red = float(np.trapezoid(np.where(x < 0, p, 0.0), x))
    blue = float(np.trapezoid(np.where(x > 0, p, 0.0), x))
    out['red_blue_ratio'] = red / max(blue, 1e-30)
    mean = float(np.trapezoid(x * p, x))
    out['xmean'] = mean
    out['xrms'] = float(np.sqrt(max(np.trapezoid((x - mean) ** 2 * p, x),
                                    0.0)))
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ('x', 'J', 'Jin')}), flush=True)
    return out


def check_trends(c19, c20, vtherm_kms=12.843374, vexp=200.0):
    """The DL2008 qualitative physics, asserted."""
    x_back = -2.0 * vexp / vtherm_kms     # ~ -31.1
    failures = []

    def chk(cond, msg):
        if not cond:
            failures.append(msg)
            print('FAIL:', msg, flush=True)

    for c in (c19, c20):
        chk(-55.0 < c['xpeak'] < -10.0,
            f"{c['infile']}: peak {c['xpeak']:.1f} not near {x_back:.1f}")
        chk(c['red_blue_ratio'] > 2.0,
            f"{c['infile']}: red/blue {c['red_blue_ratio']:.2f} <= 2")
    chk(c20['xrms'] > c19['xrms'],
        f"N_HI trend: rms(1e20)={c20['xrms']:.1f} "
        f"<= rms(1e19)={c19['xrms']:.1f}")
    chk(c20['xmean'] < c19['xmean'],
        f"N_HI trend: mean(1e20)={c20['xmean']:.1f} "
        f">= mean(1e19)={c19['xmean']:.1f}")
    return failures


def make_figure(c19, c20, path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2), facecolor='#fcfcfb')
    ax.set_facecolor('#fcfcfb')
    x19, x20 = np.asarray(c19['x']), np.asarray(c20['x'])
    if c19.get('Jin'):
        ax.plot(x19, c19['Jin'], color=C_IN, lw=2,
                label='input (Gaussian, 200 km/s)')
    ax.plot(x19, c19['J'], color=C_19, lw=2,
            label=r'$N_{\rm HI}=10^{19}\,{\rm cm^{-2}}$')
    ax.plot(x20, c20['J'], color=C_20, lw=2,
            label=r'$N_{\rm HI}=10^{20}\,{\rm cm^{-2}}$')
    ax.axvline(-2 * 200.0 / 12.843374, color='#52514e', lw=1, ls=':',
               label=r'$x=-2v_{\rm exp}/v_{\rm th}$')
    ax.set_xlabel(r'$x=(\nu-\nu_0)/\Delta\nu_{\rm D}$')
    ax.set_ylabel(r'$J(x)$ (unit area)')
    ax.set_xlim(min(x20[0], x19[0]), max(x20[-1], x19[-1]))
    ax.grid(color='#e6e5e1', lw=0.6)
    ax.set_axisbelow(True)
    for s in ('top', 'right'):
        ax.spines[s].set_visible(False)
    ax.legend(frameon=False, fontsize=9)
    ax.set_title('Dijkstra & Loeb (2008) expanding shell, '
                 r'$v_{\rm exp}=200$ km/s', fontsize=11)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    print(f'wrote {path}', flush=True)


def main():
    os.makedirs('results', exist_ok=True)
    scale = float(os.environ.get('LART_DL2008_SCALE', '1.0'))
    nph = max(int(1e5 * scale), 2000)
    grid_scale = 1.0 if scale >= 0.5 else 0.5
    import jax as _jax

    def dump(cases):
        with open('results/dl2008_spectra.json', 'w') as fh:
            json.dump({'platform': _jax.devices()[0].platform,
                       'scale': scale, 'passed': None,
                       'failures': ['incomplete'], 'cases': cases}, fh)

    c19 = run_case('DL19e.in', nph, grid_scale=grid_scale)
    dump([c19])
    c20 = run_case('DL20e.in', nph, grid_scale=grid_scale)
    dump([c19, c20])
    failures = check_trends(c19, c20)

    import jax
    payload = {'platform': jax.devices()[0].platform,
               'scale': scale, 'passed': not failures,
               'failures': failures, 'cases': [c19, c20]}
    with open('results/dl2008_spectra.json', 'w') as fh:
        json.dump(payload, fh)
    make_figure(c19, c20, 'results/fig_DL2008.png')
    print(f"wrote results/dl2008_spectra.json passed={not failures}",
          flush=True)
    if failures:
        sys.exit(1)


if __name__ == '__main__':
    main()
