"""Test environment: force CPU with 8 virtual devices (the JAX-native way to
test pjit/shard_map/collectives without TPU hardware — SURVEY.md §4).

Note: this image's sitecustomize programmatically sets
``jax_platforms='axon,cpu'`` (TPU-tunnel backend first) in every process, so
plain env vars are not enough — we must override the config *after* jax is
imported and before any backend is initialized. Tests must run on CPU: the
axon tunnel serializes compiles through a single remote chip.
"""

import os

# Read by the CPU client factory at backend-init time (backends are not yet
# initialized at conftest import).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():  # pragma: no cover - defensive
    from jax.extend.backend import clear_backends

    clear_backends()
