"""Multi-process worker for the distributed-backend test.

Launched N times (one per simulated host) by tests/test_multiprocess.py:

    python tools/mp_worker.py <coordinator> <num_procs> <proc_id> <out.json>

Each process owns 4 virtual CPU devices; the ('data',) mesh spans all
global devices, exactly as on a real TPU pod slice.  Process 0 writes the
accumulated tallies to out.json; because the per-chunk psum returns
replicated tallies, every process observes identical accumulators (the
multi-controller analogue of the reference's hierarchical MPI reduction,
memory_mod_mpi.f90:366-394).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lart_tpu.utils.platform import force_cpu

force_cpu(4)


def main():
    coordinator, num_procs, proc_id, out_path = sys.argv[1:5]

    from lart_tpu.parallel import distributed
    distributed.initialize(coordinator_address=coordinator,
                           num_processes=int(num_procs),
                           process_id=int(proc_id))
    import jax
    assert jax.process_count() == int(num_procs)

    from lart_tpu.config import Params
    from lart_tpu import driver

    par = Params(nphotons=600, temperature=1e4, taumax=30.0,
                 geometry='sphere', rmax=1.0, nx=17, ny=17, nz=17,
                 spectral_type='voigt', source_geometry='point',
                 batch_size=128, fly_substeps=8, scatter_rounds=4,
                 chunk_cycles=8, refill_every=2)
    res = driver.run(par, seed=42)

    if distributed.process_index() == 0:
        with open(out_path, 'w') as fh:
            json.dump({'nscatt': res.nscatt_tot,
                       'n_global_devices': jax.device_count(),
                       'Jout': res.Jout.tolist(),
                       'Jin': res.Jin.tolist()}, fh)
    print(f'proc {proc_id}: done, nscatt={res.nscatt_tot}', flush=True)


if __name__ == '__main__':
    main()
