"""Physics validation vs the Neufeld (1990) analytic slab solution (TPU).

Runs the static slab at high optical depth and compares the emergent
spectrum with the analytic solution for a midplane source:

  J(x) = sqrt(6)/24 * x^2/(a tau0) / cosh( sqrt(pi^3/54) * |x|^3/(a tau0) )

(shape comparison after normalizing both to unit area; also checks the
peak location x_p ~ 1.066 (a tau0)^{1/3}).  This is the acceptance test of
SURVEY.md Phase 1 (reference validates the same way: examples/slab).

Writes results to results/neufeld_rN.json.
"""
import json
import os
import sys
import time

import numpy as np

from lart_tpu.config import Params
from lart_tpu import driver


def neufeld_J(x, atau0):
    c = np.sqrt(np.pi ** 3 / 54.0)
    return (np.sqrt(6.0) / 24.0) * x ** 2 / atau0 / np.cosh(
        np.clip(c * np.abs(x) ** 3 / atau0, 0, 700))


def run_case(tau0, T, nphotons, core_skip=False, seed=5, nz=201,
             batch=1 << 16, chunk_cycles=32):
    par = Params(
        nphotons=nphotons, temperature=T, taumax=tau0, xy_periodic=True,
        nx=1, ny=1, nz=nz, spectral_type='voigt', source_geometry='point',
        core_skip=core_skip, batch_size=batch, fly_substeps=8,
        scatter_rounds=4, chunk_cycles=chunk_cycles, refill_every=4)
    t0 = time.time()
    last = [time.time()]

    def prog(l, n, a):
        now = time.time()
        if now - last[0] > 30:
            print(f"   ... launched {l}/{n} alive {a} t={now-t0:.0f}s",
                  flush=True)
            last[0] = now

    res = driver.run(par, seed=seed, progress=prog)
    wall = time.time() - t0

    a = res.cfg.voigt_a_ref
    atau0 = a * tau0
    x = res.xfreq
    Ja = neufeld_J(x, atau0)
    Jm = res.Jout.copy()
    # normalize both to unit area over the grid
    Ja /= np.trapezoid(Ja, x)
    norm_m = np.trapezoid(Jm, x)
    Jm_n = Jm / norm_m if norm_m > 0 else Jm

    # escaped-weight conservation: integral of Jout * dxfreq * 4pi == 1
    esc = res.Jout.sum() * res.meta.dxfreq * 4.0 * np.pi

    # chi2 over bins with meaningful analytic flux
    sel = Ja > Ja.max() * 3e-3
    # MC error estimate: counts per bin ~ Jm*norm... use relative 1/sqrt(N)
    counts = Jm * (nphotons * res.meta.dxfreq * 2 * np.pi * 2.0)
    with np.errstate(divide='ignore', invalid='ignore'):
        sigma = np.sqrt(np.maximum(counts, 1.0)) / (nphotons * res.meta.dxfreq
                                                    * 2 * np.pi * 2.0) / norm_m
    chi2 = float(np.sum(((Jm_n[sel] - Ja[sel]) / sigma[sel]) ** 2))
    ndof = int(sel.sum())

    xp_model = abs(x[np.argmax(Jm_n)])
    xp_exact = 1.0663 * atau0 ** (1 / 3)
    return {
        'tau0': tau0, 'T': T, 'nphotons': nphotons, 'core_skip': core_skip,
        'atau0': atau0, 'nscatt': res.nscatt_tot, 'escaped': float(esc),
        'chi2': chi2, 'ndof': ndof, 'chi2_dof': chi2 / max(ndof, 1),
        'xpeak_model': float(xp_model), 'xpeak_neufeld': float(xp_exact),
        'wall_s': wall,
        'scatt_per_s': res.nscatt_tot * nphotons / wall,
        'x': x.tolist(), 'J_model': Jm_n.tolist(), 'J_neufeld': Ja.tolist(),
    }


if __name__ == '__main__':
    os.makedirs('results', exist_ok=True)
    cases = []
    # tau0=1e4, T=10 K: a*tau0 = 149 -- marginally in the Neufeld regime
    cases.append(run_case(1e4, 10.0, 20_000))
    print(json.dumps({k: v for k, v in cases[-1].items()
                      if k not in ('x', 'J_model', 'J_neufeld')}), flush=True)
    # tau0=1e5, T=10 K: a*tau0 = 1490 -- Neufeld regime; with core-skip
    cases.append(run_case(1e5, 10.0, 10_000, core_skip=True))
    print(json.dumps({k: v for k, v in cases[-1].items()
                      if k not in ('x', 'J_model', 'J_neufeld')}), flush=True)
    with open('results/neufeld_r1.json', 'w') as fh:
        json.dump(cases, fh)
