"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py, tools/acceptance.py and the driver's compile checks.

NOTE: this image's sitecustomize force-registers the axon TPU plugin and
sets jax_platforms='axon,cpu' in every process, overriding JAX_PLATFORMS
from the environment -- so we must override the jax config itself, not
just the env var.  Running tests on the tunneled TPU chip is both wrong
(single device, no sharding coverage) and hazardous (concurrent clients
wedge the tunnel).
"""

from lart_tpu.utils.platform import force_cpu

force_cpu(8)
