"""Force-select the CPU backend for tests/tools.

This image's sitecustomize registers the axon TPU plugin and hard-sets
``jax_platforms="axon,cpu"`` in every interpreter, overriding the
JAX_PLATFORMS environment variable.  Tests and host-side tools must NOT
land on the single tunneled TPU chip (concurrent clients wedge the
tunnel), so they call force_cpu() before touching any jax array.
"""

import os


def force_cpu(n_devices: int = 8) -> None:
    """Select the CPU backend with `n_devices` virtual devices.

    Must run before the first backend initialization (any jax array or
    jax.devices() call); importing jax beforehand is fine.
    """
    flags = os.environ.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count={n_devices}'
        ).strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
