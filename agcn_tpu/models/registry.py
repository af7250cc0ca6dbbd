"""Model registry.

Replaces the reference's dotted-path `import_class` plug-in mechanism
(utils/utils.py:79-84, utils/processor.py:287): models are selected by
short name; the reference's dotted paths are aliased so its config files
work unchanged. Graph construction (the `graph`/`graph_args` model args)
resolves through agcn_tpu.graph.
"""

from __future__ import annotations

from typing import Any, Dict

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models.aagcn import AAGCN
from agcn_tpu.models.aagcn_transformer import AAGCNTransformer
from agcn_tpu.models.agcn import AGCN
from agcn_tpu.models.sgn import SGN
from agcn_tpu.models.sgn_transformer import SGNTransformer

_ALIASES = {
    "model.agcn.Model": "agcn",
    "model.aagcn.Model": "aagcn",
    "model.architecture.aagcn.agcn.Model": "agcn",
    "model.architecture.aagcn.aagcn.Model": "aagcn",
    "model.sgn_v11.SGN": "sgn",
    "model.sgn_v12.SGN": "sgn",
    "model.sgn_v13.SGN": "sgn",
    "model.sgn_v14.SGN": "sgn",
    "model.architecture.sgn.sgn_v11.SGN": "sgn",
    "model.architecture.sgn.sgn_v12.SGN": "sgn",
    "model.architecture.sgn.sgn_v13.SGN": "sgn",
    "model.architecture.sgn.sgn_v14.SGN": "sgn",
    "model.sgn_v15.SGN": "sgn_transformer",
    "model.architecture.sgn.sgn_v15.SGN": "sgn_transformer",
    # the original microsoft/SGN — archived in the reference but still
    # referenced by shipped openpose recipes (train_joint_sgn.yaml)
    "model.sgn.SGN": "sgn_original",
    "model.architecture.sgn.sgn.SGN": "sgn_original",
    "model.architecture.sgn.archiv.sgn.SGN": "sgn_original",
    "model.aagcn_v37.Model": "aagcn_transformer",
    "model.architecture.aagcn.aagcn_v37.Model": "aagcn_transformer",
    # version-faithful variants (models/aagcn_versions.py)
    "model.aagcn_v17.Model": "aagcn_v17",
    "model.architecture.aagcn.aagcn_v17.Model": "aagcn_v17",
    "model.aagcn_v30.Model": "aagcn_v30",
    "model.architecture.aagcn.aagcn_v30.Model": "aagcn_v30",
    "model.aagcn_v31.Model": "aagcn_v31",
    "model.architecture.aagcn.aagcn_v31.Model": "aagcn_v31",
    "model.aagcn_v32.Model": "aagcn_v32",
    "model.architecture.aagcn.aagcn_v32.Model": "aagcn_v32",
    "model.aagcn_v24.Model": "aagcn_v24",
    "model.architecture.aagcn.aagcn_v24.Model": "aagcn_v24",
    "model.aagcn_v34.Model": "aagcn_v34",
    "model.architecture.aagcn.aagcn_v34.Model": "aagcn_v34",
}


def _build_agcn(model_args: Dict[str, Any], cls, edge_mesh=None):
    args = dict(model_args)
    graph = args.pop("graph", "ntu_rgb_d")
    graph_args = args.pop("graph_args", {})
    adj = build_adjacency(graph, **graph_args)
    # reference arg names we normalize
    args.pop("num_subset", None)
    # the original AGCN Model takes no drop_out (reference agcn.py:133);
    # every BaseModel descendant (aagcn + versions) applies it before fc
    if "drop_out" in args and not hasattr(cls, "drop_out"):
        args.pop("drop_out")
    if edge_mesh is not None:
        if cls in (AGCN, AAGCN):
            args["edge_mesh"] = edge_mesh
        else:
            raise ValueError(
                f"mesh_edge > 1 requires a model with in-model edge "
                f"partitioning (agcn/aagcn); got {cls.__name__}")
    return cls(adj=adj, **args)


def import_class(name: str):
    """Dotted-path class loader (reference utils/utils.py:79-84): the
    plug-in mechanism for user-defined models."""
    import importlib

    module, _, attr = name.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def build_model(name: str, model_args: Dict[str, Any],
                edge_mesh=None):
    key = _ALIASES.get(name, name).lower()
    if edge_mesh is not None and (key.startswith("sgn") or "." in key):
        # fail loudly instead of silently replicating compute over the
        # reserved 'edge' mesh axis (the aagcn-family guard lives in
        # _build_agcn)
        raise ValueError(
            f"mesh_edge > 1 requires a model with in-model edge "
            f"partitioning (agcn/aagcn families); got {name!r}")
    if key == "agcn":
        return _build_agcn(model_args, AGCN, edge_mesh)
    if key == "aagcn":
        return _build_agcn(model_args, AAGCN, edge_mesh)
    if key == "aagcn_transformer":
        return _build_agcn(model_args, AAGCNTransformer, edge_mesh)
    if key in ("aagcn_v17", "aagcn_v24", "aagcn_v30", "aagcn_v31",
               "aagcn_v32", "aagcn_v34"):
        from agcn_tpu.models.aagcn_versions import (AAGCNv17, AAGCNv24,
                                                    AAGCNv30, AAGCNv31,
                                                    AAGCNv34)

        if key == "aagcn_v32":  # v32 = v31 + per-layer alphas/attn-a
            model_args = dict(model_args, version="v32")
            key = "aagcn_v31"
        cls = {"aagcn_v17": AAGCNv17, "aagcn_v24": AAGCNv24,
               "aagcn_v30": AAGCNv30, "aagcn_v31": AAGCNv31,
               "aagcn_v34": AAGCNv34}[key]
        return _build_agcn(model_args, cls, edge_mesh)
    if key == "sgn_original":
        from agcn_tpu.models.sgn_original import SGNOriginal

        args = dict(model_args)
        if "bias" in args:
            args["use_bias"] = bool(args.pop("bias"))
        return SGNOriginal(**args)
    if key == "sgn_transformer":
        args = dict(model_args)
        if "bias" in args:
            args["use_bias"] = bool(args.pop("bias"))
        for k in ("spatial_mha_kwargs", "temporal_mha_kwargs"):
            short = k.replace("_kwargs", "")
            if k in args:
                args[short] = args.pop(k)
        # reference-only v15 args we fix or that are dead upstream:
        # norm/act are fixed bn+relu (the only shipped values);
        # dropout2d only reaches bert-style (mode>=100) embeddings, which
        # no v15 recipe uses; semantic_frame_fusion is marked UNUSED in
        # the reference itself (sgn_v15.py:130). Dropping a NON-default
        # value would silently build a different model — fail fast.
        fixed = {"norm_type": ("bn",), "act_type": ("relu",),
                 "semantic_frame_fusion": None}
        for k, allowed in fixed.items():
            if k in args:
                val = args.pop(k)
                if allowed is not None and val not in allowed:
                    raise ValueError(
                        f"sgn_transformer: {k}={val!r} is not supported "
                        f"(only {allowed} — see registry.py)")
        d2d = args.pop("dropout2d", 0.0)
        if d2d and any(int(args.get(k, 0) or 0) >= 100 for k in
                       ("input_position", "input_velocity",
                        "semantic_joint", "semantic_frame",
                        "semantic_class")):
            # dropout2d only reaches bert-style (mode >= 100) embeddings
            # upstream; with one in play dropping it would silently
            # change the model
            raise ValueError(
                "sgn_transformer: dropout2d with a bert-style (>=100) "
                "embedding mode is not supported — see registry.py")
        return SGNTransformer(**args)
    if key == "sgn":
        args = dict(model_args)
        # normalize reference arg names -> ours
        rename = {
            "bias": "use_bias",
            "t_mha_kwargs": "t_mha_kwargs",
        }
        for ref, ours in rename.items():
            if ref in args:
                args[ours] = args.pop(ref)
        if "use_bias" in args:
            args["use_bias"] = bool(args["use_bias"])
        # drop reference-only args our SGN fixes or doesn't expose
        # (fixed 1x1 kernels / bn+relu / unshipped experiment switches)
        # norm/act are fixed bn+relu (the only shipped values);
        # semantic_frame_fusion is marked UNUSED in the reference itself
        # (sgn_v14.py:258)
        for k in ("norm_type", "act_type",
                  "semantic_frame_fusion", "semantic_class_fusion",
                  # sgcn2 G/GT args are dead in the reference's own
                  # forward (Block2 always receives g_attn)
                  "sgcn2_g_kernel", "sgcn2_g_proj_dim",
                  "sgcn2_g_proj_shared", "sgcn2_g_weighted",
                  "sgcn2_g_res_alpha", "sgcn2_gt_mode", "sgcn2_gt_act",
                  "sgcn2_gt_g3_idx",
                  "sgcn_ffn_mode"):
            args.pop(k, None)
        for dk in ("sgcn_dims", "sgcn2_dims"):
            if dk in args and args[dk] is not None:
                args[dk] = tuple(args[dk])
        if "sgcn_residual" in args:
            r = args["sgcn_residual"]
            args["sgcn_residual"] = tuple(r) if isinstance(r, (list, tuple)) \
                else (r,) * 3
        if "multi_t" in args:
            args["multi_t"] = tuple(tuple(t) for t in args["multi_t"])
        if "c_multiplier" in args and not isinstance(
                args["c_multiplier"], (list, tuple)):
            args["c_multiplier"] = (args["c_multiplier"],) * 4
        return SGN(**args)
    if "." in name:
        if name.startswith("model."):
            # a reference dotted path we did NOT alias: an archived
            # experiment (aagcn v2-v28, sgn v2-v10 — reference archiv/
            # dirs, explicit non-goals). Fail with the situation spelled
            # out instead of an ImportError from a missing torch module.
            raise KeyError(
                f"{name!r} is an archived reference experiment with no "
                f"equivalent here; supported reference paths: "
                f"{sorted(k for k in _ALIASES if k.startswith('model.'))}")
        # user plug-in: dotted path to a flax Module class/factory
        cls = import_class(name)
        return cls(**model_args)
    raise KeyError(f"Unknown model {name!r}")
