"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes, hence the top-of-file env
mutation.  This is the TPU-world substitute for a fake multi-device backend:
sharding/pjit paths are exercised for real on 8 host devices.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment may pre-register an accelerator plugin that wins the
# default-backend election regardless of JAX_PLATFORMS; pin the default
# device to CPU explicitly so tests are deterministic f32.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# reuse compiled executables across suite runs
from keypoints_interpolation_transformer_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
