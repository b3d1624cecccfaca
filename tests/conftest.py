"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that the
numerics can be compared against the numpy/sklearn-based reference
(``/root/reference``) at full precision.  TPU-only paths (Pallas kernels)
are exercised in interpreter mode on CPU and natively when a TPU is present.
"""
import os
import sys

# Must be set before jax initializes any backend.  Note: this environment
# may register a TPU plugin at interpreter start (sitecustomize) that
# overrides JAX_PLATFORMS, so we force the config AFTER importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# GPT_TPU_TESTS=1 leaves the default (TPU) backend in place so the
# tpu-marked hardware goldens run:  GPT_TPU_TESTS=1 pytest -m tpu
if not os.environ.get("GPT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)
