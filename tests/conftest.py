"""Test configuration: force an 8-virtual-device CPU platform.

Sharding tests need a multi-device mesh without TPU hardware; all other
tests are platform-agnostic.  Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be pre-imported (sitecustomize) with a TPU platform; the
# backend is initialized lazily, so overriding the config here still works.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "tests expect an 8-virtual-device CPU platform"


@pytest.fixture
def rng():
    return np.random.default_rng(37)


def random_dna(rng, n: int) -> str:
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture
def make_dna(rng):
    def _make(n: int) -> str:
        return random_dna(rng, n)

    return _make
