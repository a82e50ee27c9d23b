"""Song, Seon & Hwang (2020) MUSE Ly-alpha halo reproduction -> evidence.

Runs the SSH halo model the reference fits to the MUSE/Leclercq+2017
halo id 1185 (reference examples/SSH_MUSE/mk_inputs.py + muse_bestfit
table: Sersic-like UV source, exponential HI halo, SSH velocity profile,
tau0 = 10^6.6), and commits:

  * results/ssh_muse_halo1185.json -- emergent spectrum, seeing-convolved
    surface-brightness radial profile, halo/source scale lengths, and the
    asserted qualitative physics,
  * results/fig_SSH_MUSE.png      -- the MUSE-style panels via
    examples/SSH_MUSE/plot_muse_profiles.py.

Asserted physics (Leclercq+2017 / SSH 2020):
  1. the Ly-alpha surface-brightness profile is EXTENDED: its exponential
     scale length far exceeds the UV source scale rsUV = 0.041 (the
     defining MUSE halo observation),
  2. the emergent spectrum is red-dominated (Vpeak = +300 km/s outflow),
  3. flux is conserved (escape + absorption budget closes).

Scale with LART_SSH_SCALE (1.0 = 1e5 photons, ~20 min on the TPU);
LART_ACCEPT_CPU=1 routes to the virtual CPU mesh.
"""
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('LART_ACCEPT_CPU'):
    from lart_tpu.utils.platform import force_cpu
    force_cpu(8)

EXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples', 'SSH_MUSE')
RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'results')


def main():
    from lart_tpu.config import Params
    from lart_tpu import driver
    from lart_tpu.io.writer import write_output

    scale = float(os.environ.get('LART_SSH_SCALE', '1.0'))
    nph = max(int(1e5 * scale), 2000)
    grid_n = 201 if scale >= 0.5 else 101

    subprocess.run([sys.executable, 'mk_inputs.py'], cwd=EXDIR, check=True,
                   stdout=subprocess.DEVNULL)
    par = Params.from_namelist(os.path.join(EXDIR, 'halo_1185.in'))
    par = dataclasses.replace(
        par, nphotons=nph, nx=grid_n, ny=grid_n, nz=grid_n,
        # cell-local core-skip (Smith+15 xcrit) makes tau0 = 10^6.6
        # tractable, exactly as the reference runs this class
        core_skip=True, save_sightline_tau=False,
        batch_size=min(1 << 16, 1 << max(12, (nph - 1).bit_length())),
        chunk_cycles=64, refill_every=4,
        checkpoint_file=os.path.join(RESULTS, '.ckpt_ssh1185.h5'),
        checkpoint_every=4,
        resume_checkpoint=bool(os.environ.get('LART_SSH_RESUME')),
        out_file=os.path.join(EXDIR, 'halo_1185.h5'))
    if scale < 0.5:
        # smoke mode: shrink the instrument (the full 129^2 x 401 Stokes
        # peel cube dominates CPU compile+run time) and the optical depth
        # -- this validates the pipeline, not the physics numbers
        par = dataclasses.replace(
            par, nxim=49, nyim=49, nxfreq=201, chunk_cycles=16,
            taumax=min(par.taumax, 1e4))

    t0 = time.time()
    last = [0.0]

    def progress(launched, ntot, alive):
        if time.time() - last[0] > 30.0:
            print(f"  [halo_1185] {time.time()-t0:.0f}s launched={launched} "
                  f"alive={alive}", flush=True)
            last[0] = time.time()

    res = driver.run(par, seed=1185, progress=progress)
    wall = time.time() - t0
    if os.path.exists(par.checkpoint_file):
        os.remove(par.checkpoint_file)
    write_output(par.out_file, res)
    print(f"run done: <N>={res.nscatt_tot:.4g} wall={wall:.0f}s", flush=True)

    # --- surface-brightness radial profile from the scattered peel cube
    obs = res.peel['scatt'][0]          # (nxfreq, nyim, nxim)
    img = obs.sum(axis=0)
    ny, nx = img.shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    r_pix = np.hypot(xx - (nx - 1) / 2.0, yy - (ny - 1) / 2.0)
    # pixel scale in box units (TAN small-angle: dxim deg at distance)
    dx_box = np.deg2rad(res.obs_meta.dxim) * par.distance
    nbin = 24
    redge = np.linspace(0.0, 0.95, nbin + 1) / dx_box   # pixels
    prof, rmid = [], []
    for i in range(nbin):
        sel = (r_pix >= redge[i]) & (r_pix < redge[i + 1])
        if sel.sum() == 0:
            continue
        prof.append(img[sel].mean())
        rmid.append(0.5 * (redge[i] + redge[i + 1]) * dx_box)
    prof = np.asarray(prof)
    rmid = np.asarray(rmid)

    # exponential scale length of the halo (fit ln SB over the halo body)
    sel = (rmid > 0.1) & (rmid < 0.7) & (prof > 0)
    slope = np.polyfit(rmid[sel], np.log(prof[sel]), 1)[0]
    r_scale = -1.0 / slope if slope < 0 else np.inf

    x = res.xfreq
    J = res.Jout / max(np.trapezoid(res.Jout, x), 1e-30)
    red = float(np.trapezoid(np.where(x < 0, J, 0.0), x))
    blue = float(np.trapezoid(np.where(x > 0, J, 0.0), x))
    budget = res.W_escape + res.W_absorb + res.W_oor

    failures = []
    if not r_scale > 3.0 * 0.041:
        failures.append(f'halo not extended: r_scale {r_scale:.3f} '
                        f'<= 3 x rsUV 0.041')
    if not red > blue:
        failures.append(f'spectrum not red-dominated: red {red:.3f} '
                        f'blue {blue:.3f}')
    if not abs(budget - 1.0) < 0.02:
        failures.append(f'weight budget {budget:.4f}')

    out = {
        'halo': '1185', 'nphotons': nph, 'grid_n': grid_n,
        'tau0': par.taumax, 'nscatt': float(res.nscatt_tot),
        'wall_s': wall, 'scatt_per_s': res.nscatt_tot * nph / wall,
        'r_scale_SB': float(r_scale), 'rsUV': 0.041, 'rsHI': 0.3,
        'red_fraction': red, 'blue_fraction': blue,
        'W_escape': res.W_escape, 'W_absorb': res.W_absorb,
        'W_oor': res.W_oor, 'budget': float(budget),
        'x': x.tolist(), 'J': J.tolist(),
        'r_SB': rmid.tolist(), 'SB': prof.tolist(),
        'passed': not failures, 'failures': failures,
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, 'ssh_muse_halo1185.json'), 'w') as fh:
        json.dump(out, fh)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ('x', 'J', 'r_SB', 'SB')}), flush=True)

    # MUSE-style figure via the example's own plot script (writes
    # fig_muse_profiles.png in its cwd)
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(EXDIR)),
               LART_CPU='1', LART_ACCEPT_CPU='1')
    p = subprocess.run(
        [sys.executable, 'plot_muse_profiles.py', 'halo_1185.h5'],
        cwd=EXDIR, env=env)
    fig_src = os.path.join(EXDIR, 'fig_muse_profiles.png')
    if p.returncode == 0 and os.path.exists(fig_src):
        os.replace(fig_src, os.path.join(RESULTS, 'fig_SSH_MUSE.png'))
        print('wrote results/fig_SSH_MUSE.png', flush=True)
    else:
        print('plot_muse_profiles failed (figure skipped)', flush=True)
    if failures:
        sys.exit(1)


if __name__ == '__main__':
    main()
