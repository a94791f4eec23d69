"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Mirrors the SURVEY §4 test strategy: multi-device sharding paths are testable
without TPU hardware via --xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
