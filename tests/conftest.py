import os
import sys

# Run JAX on CPU with a virtual 8-device mesh for sharding tests, unless the
# caller explicitly asked for a real platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The host environment registers an experimental TPU PJRT plugin ("axon")
# through sitecustomize; its initialization can block when the device tunnel
# is busy.  Tests run on the CPU backend, so deregister the plugin factory
# before any backend is initialized.  NOTE: with the plugin registered,
# XLA_FLAGS --xla_force_host_platform_device_count is ignored — the
# jax_num_cpu_devices config is the reliable way to get a virtual mesh.
try:  # pragma: no cover - depends on host environment
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import pytest  # noqa: E402

DATA_DIRS = [
    "/root/reference/src/pyrodigal/tests/data",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "data"),
]


def data_path(name):
    for d in DATA_DIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    pytest.skip(f"test data file {name} not available")


@pytest.fixture(scope="session")
def data():
    return data_path
