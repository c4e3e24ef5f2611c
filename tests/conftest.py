"""Test configuration: run JAX on CPU with 8 virtual devices.

Must set the environment before jax initializes its backend, so this file
avoids importing jax at module scope before the flags are in place. Sharding
tests then see an 8-device mesh without TPU hardware (SURVEY.md §4d).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache in tests: CPU AOT artifacts are
# machine-feature-specific and reloading them across hosts warns/SIGILLs.
os.environ["RPF_JAX_CACHE"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may import jax at interpreter start (sitecustomize
# registering a TPU plugin), capturing JAX_PLATFORMS before this file runs —
# override through the config API too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_linear_image(rng, h=64, w=96):
    """Random linear-light image with values spanning [0, ~1.2] to exercise
    clamping paths."""
    img = rng.random((h, w, 3), dtype=np.float32) ** 2.0
    img[:4, :4] = 0.0
    img[-4:, -4:] = 1.0
    return img.astype(np.float32)
