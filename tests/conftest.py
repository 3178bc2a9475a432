"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are tested on host CPU devices — the standard way
to validate a pjit mesh without a TPU pod.

The ambient environment registers an 'axon' TPU backend at interpreter start
(sitecustomize) and overrides platform selection, so env vars alone are not
enough: jax is already imported by the time conftest runs. We therefore set
XLA_FLAGS (read lazily at backend init) and override the platform through
jax.config before any backend is initialized.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("S2VT_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
