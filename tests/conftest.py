"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (gpann_tpu.dist) is validated on
``--xla_force_host_platform_device_count=8`` per the reference-parity test
strategy (SURVEY.md §4): the reference has no tests at all; we add the pyramid
it lacks — NumPy oracles, property tests, golden-metric integration tests, and
multi-device tests runnable without a pod.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env pre-sets axon/tpu; tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize.py in this image force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; the config update below wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(555)  # the reference's seed convention
