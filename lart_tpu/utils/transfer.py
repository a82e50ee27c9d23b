"""Device->host transfers that survive a broken direct-D2H path.

On the tunneled single-chip TPU environment the literal device-to-host
copy (np.asarray / jax.device_get on a TPU array) can wedge indefinitely
while device-to-device transfers keep working.  ``to_host`` therefore
routes TPU arrays through the CPU backend (jax.device_put onto a CPU
device, which uses the healthy D2D stream) and converts locally.  On CPU
arrays -- and whenever the CPU backend is unavailable -- it degrades to
the plain conversion, so tests and normal environments see identical
behavior.

All host-side consumption of chunk tallies (driver accumulation,
bench loops, acceptance harnesses) must go through these helpers rather
than calling np.asarray on device arrays directly.
"""

from __future__ import annotations

import numpy as np
import jax

_CPU = None
_checked = False


def _cpu_device():
    global _CPU, _checked
    if not _checked:
        _checked = True
        try:
            _CPU = jax.devices('cpu')[0]
        except RuntimeError:
            _CPU = None
    return _CPU


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
        # runtime (observed: tree_to_host immediately after an async
        # chunk dispatch hangs; the same transfer after
        # block_until_ready succeeds)
        try:
            x.block_until_ready()
        except Exception:
            pass
        cpu = _cpu_device()
        if cpu is not None:
            x = jax.device_put(x, cpu)
            x.block_until_ready()
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
        try:
            on_dev = [leaves[i] for i in dev_idx]
            jax.block_until_ready(on_dev)
            moved = jax.device_put(on_dev, cpu)
            jax.block_until_ready(moved)
            for i, m in zip(dev_idx, moved):
                leaves[i] = m
        except Exception:
            pass      # fall through to the per-leaf robust path
    return jax.tree.unflatten(
        treedef, [to_host(a, dtype) for a in leaves])
