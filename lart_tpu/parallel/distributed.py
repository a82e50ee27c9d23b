"""Multi-host (multi-process) entry for TPU pod slices.

The reference scales across nodes with MPI: photon ids striped over ranks,
grid replicated per node via MPI-3 shared windows, tallies sum-reduced
hierarchically (reference: src/memory_mod_mpi.f90:366-394,
src/run_simulation_mod.f90:11-133, communicator split setup.f90:146-154).

On TPU the same shape is JAX's single-program multi-controller model:
every host process runs the identical driver, `jax.distributed.initialize`
wires the processes into one runtime, and the ('data',) mesh simply spans
all global devices.  Photon budgets stripe across global devices; the grid
is replicated (device_put of identical host arrays on every process); the
per-chunk psum rides ICI within a slice and DCN across slices -- XLA picks
the transport, there is no hand-written hierarchy.  Tallies come back
replicated, so every process observes identical accumulators and only
process 0 writes output.

Usage (one command per host, e.g. via the TPU VM launcher):

    from lart_tpu.parallel import distributed
    distributed.initialize()            # no-op if single-process
    res = driver.run(par)               # mesh spans the whole pod slice
    if distributed.process_index() == 0:
        write_output(par, res)

On CPU (tests), pass coordinator/num/pid explicitly and set
--xla_force_host_platform_device_count for multiple devices per process.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def _runtime_already_wired() -> bool:
    """True iff jax.distributed.initialize has already run in this process.

    Checked WITHOUT calling jax.process_count()/jax.devices(): those
    initialize the XLA backend, after which jax.distributed.initialize
    raises ('must be called before any JAX calls that might initialise
    the XLA backend').  The distributed client handle is the only safe
    signal."""
    try:
        from jax._src.distributed import global_state
        return global_state.client is not None
    except Exception:
        return False


def _looks_like_tpu_pod() -> bool:
    """Environment-only TPU-pod sniff (safe before backend init)."""
    if 'cpu' in os.environ.get('JAX_PLATFORMS', '').lower():
        return False
    tpu_hints = ('TPU_WORKER_HOSTNAMES', 'TPU_WORKER_ID',
                 'CLOUD_TPU_TASK_ID', 'MEGASCALE_COORDINATOR_ADDRESS')
    return any(k in os.environ for k in tpu_hints)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments on a TPU pod slice, jax.distributed.initialize
    auto-detects the topology from the TPU metadata.  On CPU/GPU the
    coordinator address and process ids must be given (or via the
    LART_COORDINATOR / LART_NUM_PROCS / LART_PROC_ID environment
    variables).  Single-process runs may skip calling this entirely.
    """
    global _initialized
    if _initialized or _runtime_already_wired():
        _initialized = True
        return
    coordinator_address = coordinator_address \
        or os.environ.get('LART_COORDINATOR')
    if num_processes is None and 'LART_NUM_PROCS' in os.environ:
        num_processes = int(os.environ['LART_NUM_PROCS'])
    if process_id is None and 'LART_PROC_ID' in os.environ:
        process_id = int(os.environ['LART_PROC_ID'])
    if coordinator_address is None and num_processes is None \
            and process_id is None and not _looks_like_tpu_pod():
        # nothing to wire together: plain single-process CPU/GPU run.
        # (Detected from the environment, NOT jax.default_backend() --
        # that call would initialise the XLA backend and make the
        # jax.distributed.initialize below unusable.)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1
