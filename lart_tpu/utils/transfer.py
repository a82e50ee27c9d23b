"""Device->host transfers that survive a broken direct-D2H path.

On the tunneled single-chip TPU environment the literal device-to-host
copy (np.asarray / jax.device_get on a TPU array) can wedge indefinitely
while device-to-device transfers keep working.  ``to_host`` therefore
routes TPU arrays through the CPU backend (jax.device_put onto a CPU
device, which uses the healthy D2D stream) and converts locally.  On CPU
arrays -- and whenever the CPU backend is unavailable -- it degrades to
the plain conversion, so tests and normal environments see identical
behavior.

Transfers additionally run under a watchdog: the tunnel has been observed
to wedge a transfer at random mid-run (thread parked in futex inside the
runtime while the connection threads stay healthy), so each attempt runs
on a worker thread with a timeout and is retried; a wedge then costs
minutes, not the whole run.  Wedged worker threads are daemonic and leak
(they cannot be cancelled), bounded by the attempt count.

All host-side consumption of chunk tallies (driver accumulation,
bench loops, acceptance harnesses) must go through these helpers rather
than calling np.asarray on device arrays directly.
"""

from __future__ import annotations

import concurrent.futures
import os
import threading

import numpy as np
import jax

_CPU = None
_checked = False

# watchdog knobs (env-overridable for tests/debugging)
TRANSFER_TIMEOUT_S = float(os.environ.get('LART_TRANSFER_TIMEOUT', '180'))
TRANSFER_ATTEMPTS = int(os.environ.get('LART_TRANSFER_ATTEMPTS', '3'))


def _cpu_device():
    global _CPU, _checked
    if not _checked:
        _checked = True
        try:
            _CPU = jax.devices('cpu')[0]
        except RuntimeError:
            _CPU = None
    return _CPU


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ('cpu',)
    except Exception:
        return False


def _with_watchdog(fn):
    """Run fn() with timeout+retry on TPU; plain call elsewhere."""
    if not _on_tpu():
        return fn()
    last = None
    for attempt in range(TRANSFER_ATTEMPTS):
        done = threading.Event()
        box = {}

        def work():
            try:
                box['out'] = fn()
            except Exception as e:          # surfaced after join
                box['err'] = e
            done.set()

        t = threading.Thread(target=work, daemon=True)
        t.start()
        if done.wait(TRANSFER_TIMEOUT_S):
            if 'err' in box:
                last = box['err']
                continue
            return box['out']
        last = TimeoutError(
            f'device transfer wedged (> {TRANSFER_TIMEOUT_S:.0f}s, '
            f'attempt {attempt + 1}/{TRANSFER_ATTEMPTS})')
        print(f'[lart_tpu.transfer] {last}; retrying', flush=True)
    raise RuntimeError('device->host transfer failed after '
                       f'{TRANSFER_ATTEMPTS} attempts') from last


def to_host(x, dtype=None) -> np.ndarray:
    """Fetch a jax array to host memory as np.ndarray (robust path)."""
    if x is None:
        return None
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x, dtype) if dtype is not None else np.asarray(x)
    try:
        platform = x.devices().pop().platform if hasattr(x, 'devices') \
            else 'cpu'
    except Exception:
        platform = 'cpu'
    if platform not in ('cpu',):
        # wait for the producing computation first: a transfer requested
        # while the device is still executing can wedge the tunneled
        # runtime far more often than one issued at device idle
        def fetch():
            y = x
            try:
                y.block_until_ready()
            except Exception:
                pass
            cpu = _cpu_device()
            if cpu is not None:
                y = jax.device_put(y, cpu)
                y.block_until_ready()
            return np.asarray(y)
        arr = _with_watchdog(fetch)
    else:
        arr = np.asarray(x)
    return arr.astype(dtype) if dtype is not None else arr


def to_host_scalar(x) -> float:
    """float(x) for a (possibly device) scalar via the robust path."""
    return float(np.asarray(to_host(x)).reshape(()))


def tree_to_host(tree, dtype=None):
    """to_host over a pytree (None leaves preserved).

    All device leaves ride ONE batched jax.device_put onto the CPU
    backend: through the tunneled runtime every individual transfer is a
    full RPC round trip (~10 ms), so leaf-by-leaf transfers dominated
    chunk wall time (35 tally arrays -> ~0.4 s/chunk of pure latency)."""
    leaves, treedef = jax.tree.flatten(tree, is_leaf=lambda a: a is None)
    dev_idx = [i for i, a in enumerate(leaves)
               if a is not None and not isinstance(a, np.ndarray)
               and not np.isscalar(a)
               and getattr(a, 'devices', None) is not None]
    cpu = _cpu_device()
    if dev_idx and cpu is not None:
        def move():
            on_dev = [leaves[i] for i in dev_idx]
            jax.block_until_ready(on_dev)
            moved = jax.device_put(on_dev, cpu)
            jax.block_until_ready(moved)
            return moved
        try:
            moved = _with_watchdog(move)
            for i, m in zip(dev_idx, moved):
                leaves[i] = m
        except RuntimeError:
            # the watchdog already burned TRANSFER_ATTEMPTS x
            # TRANSFER_TIMEOUT_S on a wedged device; falling back to
            # per-leaf would pay that budget again for each of ~35 tally
            # leaves (hours).  A wedge must cost minutes, not the run.
            raise
        except Exception:
            pass      # non-watchdog failure: per-leaf robust path
    return jax.tree.unflatten(
        treedef, [to_host(a, dtype) for a in leaves])
