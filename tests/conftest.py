"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the real TPU bench
runs separately); this mirrors the reference's always-testable CPU fallback
policy (QAT compiled out in CI, .github/workflows/github-ci.yml:57-60).
"""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and pre-imports
# jax via sitecustomize, so plain env-var overrides are too late.  Switch the
# not-yet-initialized backend to local CPU explicitly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
