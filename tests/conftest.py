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
    """Make the PyTorch reference importable for parity tests (read-only).

    Stubs the reference's optional dependencies that aren't in this image
    (typer, torchinfo, fvcore) so its eager package __init__ imports work.
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import types

    if "typer" not in sys.modules:
        typer = types.ModuleType("typer")
        typer.Option = lambda *a, **k: None
        sys.modules["typer"] = typer
    if "torchinfo" not in sys.modules:
        torchinfo = types.ModuleType("torchinfo")
        torchinfo.summary = lambda *a, **k: None
        sys.modules["torchinfo"] = torchinfo
    if "DeBERTa" not in sys.modules:
        deberta_pkg = types.ModuleType("DeBERTa")
        deberta_mod = types.ModuleType("DeBERTa.deberta")

        class _Stub:  # archived aagcn_v27 references these at class scope
            def __init__(self, *a, **k):
                raise ImportError("DeBERTa stub")

        for name in ("DisentangledSelfAttention", "BertLayerNorm",
                     "StableDropout", "ACT2FN"):
            setattr(deberta_mod, name, _Stub)
        deberta_pkg.deberta = deberta_mod
        sys.modules["DeBERTa"] = deberta_pkg
        sys.modules["DeBERTa.deberta"] = deberta_mod
    if "sam" not in sys.modules:
        sam = types.ModuleType("sam")
        sam.SAM = None
        sys.modules["sam"] = sam
