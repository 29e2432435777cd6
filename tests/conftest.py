import os

# Tests run on CPU with a virtual 8-device mesh so sharding paths can be
# exercised without TPU hardware (the driver separately dry-runs multi-chip).
# The axon TPU plugin force-registers itself and overrides JAX_PLATFORMS, so
# the platform must be pinned through jax.config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The plugin's sitecustomize sets JAX_PLATFORMS at interpreter start;
# overwrite it BEFORE importing jax -- the config pin below alone does not
# stop a wedged device tunnel from hanging backend init.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def load_f32(name, shape):
    a = np.fromfile(FIXTURES / name, dtype=np.float32)
    return a.reshape(shape)


def load_u8(name, shape):
    a = np.fromfile(FIXTURES / name, dtype=np.uint8)
    return a.reshape(shape)


@pytest.fixture(params=[(96, 64), (37, 29)], ids=["96x64", "37x29"])
def size(request):
    return request.param
