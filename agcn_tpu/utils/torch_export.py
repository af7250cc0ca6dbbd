"""Checkpoint EXPORT to the reference's PyTorch format.

The inverse of agcn_tpu.utils.torch_import for the flagship AGCN: our
trained variables become a state_dict the reference model
(/root/reference equivalent: model/architecture/aagcn/agcn.py `Model`)
loads with `strict=True` — so checkpoints trained here can be validated
or deployed inside the original torch harness. Pure numpy; the caller
wraps values in torch tensors if needed (`torch.load`-compatible files
can be written with torch.save on the returned dict).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def dense_to_pointwise(w) -> np.ndarray:
    """flax dense (in, out) -> torch 1x1 conv (out, in, 1, 1)."""
    return _np(w).T[:, :, None, None]


def conv_to_torch(w) -> np.ndarray:
    """flax conv (kh, kw, in, out) -> torch (out, in, kh, kw)."""
    return np.transpose(_np(w), (3, 2, 0, 1))


def _require_stats(variables: Mapping[str, Any]) -> Mapping[str, Any]:
    stats = variables.get("batch_stats") or {}
    if not stats:
        raise ValueError(
            "export requires batch_stats (BN running statistics) — the "
            "reference state_dict carries running_mean/var for every BN; "
            "this checkpoint has none")
    return stats


def _bn_out(out: Dict[str, np.ndarray], prefix: str,
            params: Mapping[str, Any], stats: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def agcn_state_dict_from_variables(variables: Mapping[str, Any],
                                   num_subset: int = 3
                                   ) -> Dict[str, np.ndarray]:
    """Our AGCN variables -> reference agcn.py Model state_dict (numpy
    values, torch parameter names; loads with strict=True)."""
    params = variables["params"]
    stats = _require_stats(variables)
    out: Dict[str, np.ndarray] = {}

    _bn_out(out, "data_bn", params["data_bn"], stats["data_bn"])
    out["fc.weight"] = _np(params["fc"]["kernel"]).T
    out["fc.bias"] = _np(params["fc"]["bias"])

    for block in sorted(k for k in params if k.startswith("l")):
        bp, bs = params[block], stats.get(block, {})
        g, gs = bp["gcn1"], bs.get("gcn1", {})
        p = f"{block}.gcn1"
        out[f"{p}.PA"] = _np(g["PA"])
        for k in range(num_subset):
            for role in ("a", "b", "d"):
                out[f"{p}.conv_{role}.{k}.weight"] = dense_to_pointwise(
                    g[f"conv_{role}{k}_kernel"])
                out[f"{p}.conv_{role}.{k}.bias"] = _np(
                    g[f"conv_{role}{k}_bias"])
        _bn_out(out, f"{p}.bn", g["bn"], gs["bn"])
        if "down_conv" in g:
            out[f"{p}.down.0.weight"] = dense_to_pointwise(
                g["down_conv"]["conv"]["kernel"])
            out[f"{p}.down.0.bias"] = _np(g["down_conv"]["conv"]["bias"])
            _bn_out(out, f"{p}.down.1", g["down_bn"], gs["down_bn"])
        out[f"{block}.tcn1.conv.weight"] = conv_to_torch(
            bp["tcn1"]["conv"]["conv"]["kernel"])
        out[f"{block}.tcn1.conv.bias"] = _np(
            bp["tcn1"]["conv"]["conv"]["bias"])
        _bn_out(out, f"{block}.tcn1.bn", bp["tcn1"]["bn"],
                bs["tcn1"]["bn"])
        if "residual" in bp:
            out[f"{block}.residual.conv.weight"] = conv_to_torch(
                bp["residual"]["conv"]["conv"]["kernel"])
            out[f"{block}.residual.conv.bias"] = _np(
                bp["residual"]["conv"]["conv"]["bias"])
            _bn_out(out, f"{block}.residual.bn", bp["residual"]["bn"],
                    bs["residual"]["bn"])
    return out


def conv1d_to_torch(w) -> np.ndarray:
    """flax conv1d (k, in, out) -> torch (out, in, k)."""
    return np.transpose(_np(w), (2, 1, 0))


def aagcn_state_dict_from_variables(variables: Mapping[str, Any],
                                    num_subset: int = 3,
                                    adaptive: bool = True
                                    ) -> Dict[str, np.ndarray]:
    """Our AAGCN variables -> reference aagcn.py Model state_dict
    (inverse of torch_import.aagcn_variables_from_torch)."""
    params = variables["params"]
    stats = _require_stats(variables)
    out: Dict[str, np.ndarray] = {}

    _bn_out(out, "data_bn", params["data_bn"], stats["data_bn"])
    out["fc.weight"] = _np(params["fc"]["kernel"]).T
    out["fc.bias"] = _np(params["fc"]["bias"])

    for block in sorted(k for k in params if k.startswith("l")):
        bp, bs = params[block], stats.get(block, {})
        g, gs = bp["gcn1"], bs.get("gcn1", {})
        p = f"{block}.gcn1"
        a = g["agcn"]
        for k in range(num_subset):
            out[f"{p}.conv_d.{k}.weight"] = dense_to_pointwise(
                a[f"conv_d{k}_kernel"])
            out[f"{p}.conv_d.{k}.bias"] = _np(a[f"conv_d{k}_bias"])
            if adaptive:
                # the reference passes the unit's conv_d ModuleList into
                # AdaptiveGCN, which registers it AGAIN (aagcn.py:228-233)
                # — strict load wants both aliases of the shared weights
                out[f"{p}.agcn.conv_d.{k}.weight"] = \
                    out[f"{p}.conv_d.{k}.weight"]
                out[f"{p}.agcn.conv_d.{k}.bias"] = \
                    out[f"{p}.conv_d.{k}.bias"]
                for role in ("a", "b"):
                    out[f"{p}.agcn.conv_{role}.{k}.weight"] = \
                        dense_to_pointwise(a[f"conv_{role}{k}_kernel"])
                    out[f"{p}.agcn.conv_{role}.{k}.bias"] = _np(
                        a[f"conv_{role}{k}_bias"])
        if adaptive:
            out[f"{p}.agcn.PA"] = _np(a["PA"])
            out[f"{p}.agcn.alpha"] = _np(a["alpha"])
        if "attn_s" in g:
            out[f"{p}.attn_s.conv_sa.weight"] = conv1d_to_torch(
                g["attn_s"]["conv_sa"]["kernel"])
            out[f"{p}.attn_s.conv_sa.bias"] = _np(
                g["attn_s"]["conv_sa"]["bias"])
            out[f"{p}.attn_t.conv_ta.weight"] = conv1d_to_torch(
                g["attn_t"]["conv_ta"]["kernel"])
            out[f"{p}.attn_t.conv_ta.bias"] = _np(
                g["attn_t"]["conv_ta"]["bias"])
            for fc in ("fc1c", "fc2c"):
                out[f"{p}.attn_c.{fc}.weight"] = _np(
                    g["attn_c"][fc]["kernel"]).T
                out[f"{p}.attn_c.{fc}.bias"] = _np(g["attn_c"][fc]["bias"])
        _bn_out(out, f"{p}.bn", g["bn"], gs["bn"])
        if "down_conv" in g:
            out[f"{p}.down.0.weight"] = dense_to_pointwise(
                g["down_conv"]["conv"]["kernel"])
            out[f"{p}.down.0.bias"] = _np(g["down_conv"]["conv"]["bias"])
            _bn_out(out, f"{p}.down.1", g["down_bn"], gs["down_bn"])
        out[f"{block}.tcn1.conv.weight"] = conv_to_torch(
            bp["tcn1"]["conv"]["conv"]["kernel"])
        out[f"{block}.tcn1.conv.bias"] = _np(
            bp["tcn1"]["conv"]["conv"]["bias"])
        _bn_out(out, f"{block}.tcn1.bn", bp["tcn1"]["bn"],
                bs["tcn1"]["bn"])
        if "residual" in bp:
            out[f"{block}.residual.conv.weight"] = conv_to_torch(
                bp["residual"]["conv"]["conv"]["kernel"])
            out[f"{block}.residual.conv.bias"] = _np(
                bp["residual"]["conv"]["conv"]["bias"])
            _bn_out(out, f"{block}.residual.bn", bp["residual"]["bn"],
                    bs["residual"]["bn"])
    return out


def sgn_original_state_dict_from_variables(variables: Mapping[str, Any]
                                           ) -> Dict[str, np.ndarray]:
    """Our SGNOriginal variables -> original microsoft/SGN state_dict
    (inverse of torch_import.sgn_original_variables_from_torch)."""
    params = variables["params"]
    stats = _require_stats(variables)
    out: Dict[str, np.ndarray] = {}

    def dense(flax_node, torch_prefix):
        out[f"{torch_prefix}.weight"] = dense_to_pointwise(
            flax_node["kernel"])
        if "bias" in flax_node:
            out[f"{torch_prefix}.bias"] = _np(flax_node["bias"])

    for f_name, t_name, normed in (("pos_embed", "joint_embed", True),
                                   ("dif_embed", "dif_embed", True),
                                   ("spa_embed", "spa_embed", False),
                                   ("tem_embed", "tem_embed", False)):
        node = params[f_name]
        i = 0
        if normed:
            _bn_out(out, f"{t_name}.cnn.0.bn", node["in_norm"],
                    stats[f_name]["in_norm"])
            i = 1
        dense(node["cnn1"]["conv"], f"{t_name}.cnn.{i}.cnn")
        dense(node["cnn2"]["conv"], f"{t_name}.cnn.{i + 2}.cnn")

    dense(params["g1"]["conv"], "compute_g1.g1.cnn")
    dense(params["g2"]["conv"], "compute_g1.g2.cnn")

    for i in (1, 2, 3):
        out[f"gcn{i}.w.cnn.weight"] = dense_to_pointwise(
            params[f"gcn{i}"]["w"]["kernel"])
        dense(params[f"gcn{i}"]["w1"]["conv"], f"gcn{i}.w1.cnn")
        _bn_out(out, f"gcn{i}.bn", params[f"gcn{i}"]["norm"],
                stats[f"gcn{i}"]["norm"])

    # torch local conv is (1,3) over the W=time axis -> (out, in, 1, 3)
    out["cnn.cnn1.weight"] = np.transpose(
        _np(params["t_cnn1"]["kernel"]), (3, 2, 1, 0))
    if "bias" in params["t_cnn1"]:
        out["cnn.cnn1.bias"] = _np(params["t_cnn1"]["bias"])
    _bn_out(out, "cnn.bn1", params["t_norm1"], stats["t_norm1"])
    dense(params["t_cnn2"]["conv"], "cnn.cnn2")
    _bn_out(out, "cnn.bn2", params["t_norm2"], stats["t_norm2"])

    out["fc.weight"] = _np(params["fc"]["kernel"]).T
    out["fc.bias"] = _np(params["fc"]["bias"])
    return out


def main(argv=None):
    """CLI: export one of our checkpoints as a reference .pt file.

    python -m agcn_tpu.utils.torch_export --checkpoint work/checkpoints/epoch_50 \
        --out agcn_joint.pt
    """
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m agcn_tpu.utils.torch_export")
    p.add_argument("--checkpoint", required=True,
                   help="orbax dir or .npz saved by the Trainer")
    p.add_argument("--out", required=True, help=".pt output path")
    p.add_argument("--model", default="agcn",
                   choices=["agcn", "aagcn", "sgn_original"],
                   help="model family to export as")
    args = p.parse_args(argv)

    # exporting never needs an accelerator — pin the host platform so
    # the orbax load can't grab (or hang on) the TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from agcn_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    variables = {"params": ckpt["params"],
                 "batch_stats": ckpt.get("batch_stats", {})}
    export = {"agcn": agcn_state_dict_from_variables,
              "aagcn": aagcn_state_dict_from_variables,
              "sgn_original": sgn_original_state_dict_from_variables}
    sd = export[args.model](variables)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
