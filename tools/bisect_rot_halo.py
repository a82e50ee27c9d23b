"""Bisect the rotating_galaxy_halo axon-TPU kernel fault.

`rotating_galaxy_halo/rin0.1_Vrot100_NHI18.in` at 201^3 reproducibly
faulted the TPU backend in round 5 (3x) while every other 201^3
velocity-field case ran, so `tools/reconcile_logs.py` recorded the case
from the 8-device CPU mesh instead.  This harness isolates which
ingredient trips the fault by running ONE variant per process (a backend
fault kills the process, not the sweep):

    python tools/bisect_rot_halo.py VARIANT [nphotons]

The medium is a UNIFORM sphere (N_HImax=1e18) -- only the velocity
pattern, grid size, and frequency grid distinguish this case from ones
that run.  Variants: asis, solid_body / hubble (velocity pattern swap),
static (no velocity), nx101 (grid size).  Drive the sweep with:

    for v in asis solid_body hubble static nx101; do
        timeout 600 python tools/bisect_rot_halo.py $v 2000 || echo "$v rc=$?"
    done
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lart_tpu.config import Params
from lart_tpu import driver

NML = ('/root/reference/examples/rotating_galaxy_halo/'
       'rin0.1_Vrot100_NHI18.in')


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'asis'
    nph = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    par = Params.from_namelist(NML)
    over = dict(nx=201, ny=201, nz=201, save_peeloff=False, save_Jmu=False,
                core_skip=True, nphotons=nph, save_all_photons=False)
    if variant == 'solid_body':
        over['velocity_type'] = 'rotating_solid_body'
    elif variant == 'static':
        over['velocity_type'] = ''
    elif variant == 'nx101':
        over.update(nx=101, ny=101, nz=101)
    elif variant == 'hubble':
        over['velocity_type'] = 'hubble'
    elif variant != 'asis':
        raise SystemExit(f'unknown variant {variant!r}')
    par = dataclasses.replace(par, **over)

    t0 = time.time()
    last = [0.0]

    def progress(launched, ntot, alive):
        if time.time() - last[0] > 20.0:
            print(f'  [{variant}] {time.time()-t0:.0f}s launched={launched} '
                  f'alive={alive}', flush=True)
            last[0] = time.time()

    res = driver.run(par, seed=777, progress=progress)
    print(f'{variant}: OK nscatt/photon={res.nscatt_gas:.4g} '
          f'wall={time.time()-t0:.1f}s', flush=True)


if __name__ == '__main__':
    main()
