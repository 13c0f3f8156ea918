"""Test harness config: force CPU backend with 8 virtual devices so sharding
semantics (psum grads, sharded grid query) are testable without TPU hardware
(SURVEY.md §4).

NOTE: the env var JAX_PLATFORMS alone is NOT enough here — the 'axon' TPU
plugin in this image overrides it at import time and grabs the (single-client)
TPU tunnel, which makes any second JAX process block forever. The explicit
jax.config.update after import is what actually pins the CPU backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
