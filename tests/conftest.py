"""Test conftest: force JAX onto a virtual 8-device CPU mesh so tests
run fast and sharding tests need no TPU hardware.

Note: this environment's sitecustomize registers a remote 'axon' TPU
plugin and overrides jax_platforms, so the env var alone is not enough —
we must update jax.config before any backend initialization."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls in tests (JAX's default matmul precision is reduced)
jax.config.update("jax_default_matmul_precision", "highest")

# Repo-persistent compile cache. Tiny-model CPU compiles mostly finish
# under 1s, so use a low cache threshold here (the default 1.0s would
# skip caching most of the suite's recompilation).
from qdm_tpu.compile_cache import enable as _enable_compile_cache

_enable_compile_cache(min_secs=0.1)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
