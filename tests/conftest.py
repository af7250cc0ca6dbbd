"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax is imported anywhere in the test process.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU plugin registers itself in every interpreter via
# sitecustomize and rewrites jax_platforms to "axon,cpu"; the config update
# below (before any backend is initialized) is what actually forces tests
# onto the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Make the PyTorch reference importable for parity tests (read-only)."""
    from agcn_tpu.utils.reference_stubs import install

    install(REFERENCE_ROOT)
