"""Test conftest: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# exact f32 matmuls in tests (JAX's default matmul precision is reduced)
jax.config.update("jax_default_matmul_precision", "highest")
