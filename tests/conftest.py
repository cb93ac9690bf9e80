import os
import sys

# Force tests onto a virtual 8-device CPU mesh: multi-chip sharding is
# validated without TPU hardware, and CI machines need no accelerator.
# AMV_TPU_SMOKE=1 keeps the real accelerator visible instead so
# tests/test_tpu_smoke.py can exercise compiled Mosaic kernels (every
# other Pallas test runs in interpret mode on the CPU mesh).
_TPU_SMOKE = os.environ.get("AMV_TPU_SMOKE") == "1"
if not _TPU_SMOKE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon site plugin force-registers the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"); override it back so tests
# really run on the virtual 8-device CPU mesh.
if not _TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

SAMPLE_AMV = "/root/reference/C-AMVDecoder/bin/AMV1.amv"


@pytest.fixture(scope="session")
def sample_amv_path():
    if not os.path.exists(SAMPLE_AMV):
        pytest.skip("sample corpus AMV1.amv not available")
    return SAMPLE_AMV


@pytest.fixture(scope="session")
def sample_amv_bytes(sample_amv_path):
    with open(sample_amv_path, "rb") as f:
        return f.read()
