"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Mirrors the SURVEY §4 test strategy: multi-device sharding paths are testable
without TPU hardware via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the machine env pins axon/TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize imports jax at interpreter startup (before this
# conftest), so jax.config already snapshotted JAX_PLATFORMS=axon; override it.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def embeddings_512(rng):
    """Unnormalized CLIP-like embeddings: 64 vectors, dim 512, varied norms."""
    x = rng.normal(size=(64, 512)).astype(np.float32)
    scale = rng.uniform(5.0, 15.0, size=(64, 1)).astype(np.float32)
    return x * scale
