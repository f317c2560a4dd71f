"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so the
reference package's property-test tolerances (1e-12 fixed points,
1e-14/1e-15 feasibility; see /root/reference/tests) can be asserted
exactly.  The production TPU path runs the same code in float32.

The environment variables must be set before JAX initializes its
backends, hence the os.environ writes at import time.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS to the TPU plugin via sitecustomize;
# the config update (after import) reliably redirects tests to the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
