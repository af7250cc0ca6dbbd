"""Make the read-only PyTorch reference importable for parity tests and
baseline benches by stubbing its optional dependencies that are not in
this image (typer, torchinfo, DeBERTa, sam)."""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def install(reference_root: str = REFERENCE_ROOT) -> None:
    if reference_root not in sys.path:
        # APPEND, never prepend: the reference tree has top-level modules
        # named `infer`, `main`, `ensemble` that would otherwise shadow
        # this repo's own root-level modules of the same names
        sys.path.append(reference_root)

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
