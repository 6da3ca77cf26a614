"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding is validated on a host-platform device farm
(``--xla_force_host_platform_device_count=8``), the TPU analog of testing
multi-node without a cluster (SURVEY.md section 4). x64 is enabled so the
golden parity tests can match the reference's float64 numpy physics bit-tight;
framework code is dtype-explicit (float32 by default) and unaffected.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# NB: the JAX_PLATFORMS env var is ignored by this machine's TPU plugin
# build; the config update is the override that actually works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
