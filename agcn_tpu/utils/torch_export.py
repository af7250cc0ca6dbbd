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


def _torch_conv_weight(kernel: np.ndarray) -> np.ndarray:
    """Invert the import's conv_block/plain_conv kernel transform: 2-D
    dense (in, out) -> torch 1x1 (out, in, 1, 1); 4-D (kw, kh, in, out)
    -> torch (out, in, kh, kw)."""
    k = _np(kernel)
    return dense_to_pointwise(k) if k.ndim == 2 else np.transpose(
        k, (3, 2, 1, 0))


def _conv_block_out(out: Dict[str, np.ndarray], torch_prefix: str,
                    node: Mapping[str, Any],
                    stats_node: Mapping[str, Any]) -> None:
    """Our ConvNormAct tree -> one reference Conv block
    (model/layers/torch/module.py 'Conv': conv [+norm])."""
    conv = node["cnn"]["conv"]
    out[f"{torch_prefix}.block.conv.conv.weight"] = _torch_conv_weight(
        conv["kernel"])
    if "bias" in conv:
        out[f"{torch_prefix}.block.conv.conv.bias"] = _np(conv["bias"])
    if "norm" in node:
        _bn_out(out, f"{torch_prefix}.block.norm", node["norm"],
                stats_node["norm"])


def _plain_conv_out(out: Dict[str, np.ndarray], torch_prefix: str,
                    node: Mapping[str, Any]) -> None:
    out[f"{torch_prefix}.block.conv.conv.weight"] = _torch_conv_weight(
        node["conv"]["kernel"])
    if "bias" in node["conv"]:
        out[f"{torch_prefix}.block.conv.conv.bias"] = _np(
            node["conv"]["bias"])


def _embedding_out(out: Dict[str, np.ndarray], torch_prefix: str,
                   node: Mapping[str, Any],
                   stats_node: Mapping[str, Any]) -> None:
    """Our Embedding tree -> reference Embedding (in-BN + cnn chain)."""
    if "in_norm" in node:
        _bn_out(out, f"{torch_prefix}.norm.bn", node["in_norm"],
                stats_node["in_norm"])
    i = 1
    while f"cnn{i}" in node:
        _conv_block_out(out, f"{torch_prefix}.cnn{i}", node[f"cnn{i}"],
                        stats_node.get(f"cnn{i}", {}))
        i += 1


def _onehot_buffer(dim_eye: int, dim_length: int, mode: int) -> np.ndarray:
    """Reference OneHotTensor constant buffer
    (model/architecture/sgn/blocks/semantic.py:128-146): eye(dim_eye)
    tiled to (1, dim_length, E, E), then mode-permuted. Registered
    buffers appear in torch state_dicts, so strict load needs them —
    they are pure constants with no counterpart in our variables."""
    oh = np.broadcast_to(np.eye(dim_eye, dtype=np.float32),
                         (1, dim_length, dim_eye, dim_eye))
    if mode == 0:
        oh = oh.transpose(0, 3, 2, 1)
    elif mode == 1:
        oh = oh.transpose(0, 3, 1, 2)
    return np.ascontiguousarray(oh)


def _embed_in_dim(node: Mapping[str, Any]) -> int:
    return int(np.shape(node["cnn1"]["cnn"]["conv"]["kernel"])[-2])


def _vc_to_cv(w: np.ndarray, num_point: int = 25) -> np.ndarray:
    """Inverse of torch_import.cv_to_vc: reorder a dense kernel whose
    input features are (v, c)-flattened back to the reference's (c, v)
    order. w: (in=v*c, out)."""
    cin = w.shape[0] // num_point
    return w.reshape(num_point, cin, -1).transpose(1, 0, 2).reshape(
        w.shape)


def sgn_state_dict_from_variables(variables: Mapping[str, Any],
                                  linear_ffn: bool = False,
                                  num_point: int = 25,
                                  num_segment: int = 20
                                  ) -> Dict[str, np.ndarray]:
    """Our configurable SGN (v11-v14 space) variables -> reference
    sgn_v14.py state_dict (inverse of torch_import.sgn_variables_from_torch;
    reference naming: model/architecture/sgn/sgn_v14.py +
    blocks/{semantic,spatial,temporal}.py).

    linear_ffn: the reference's "Linear" FFN variants (sgcn_ffn modes
    2xx/3xx) share our flax layout with the conv variants but use
    '.block.linear.linear.*' torch keys — pass True when exporting a
    checkpoint trained with one of those modes.

    Known strict-load asymmetries (both dead in the reference forward):
    gcn_fpn=10's sgcn2 carries unused gcn_g{i}/alpha params, and
    gcn_fpn_output_merge=2 over-allocates fc heads (sgn_v14.py:798-803)
    — those reference-side params have no counterpart here, so such
    checkpoints load with strict=False.
    """
    import re

    params = variables["params"]
    stats = _require_stats(variables)
    out: Dict[str, np.ndarray] = {}

    def emb(flax_name: str, torch_prefix: str) -> None:
        if flax_name not in params:
            return
        node, snode = params[flax_name], stats.get(flax_name, {})
        if "seg0" in node:
            # body-part segment embedding: one Embedding per part group
            for idx in range(len(node)):
                _embedding_out(out, f"{torch_prefix}.{idx}",
                               node[f"seg{idx}"],
                               snode.get(f"seg{idx}", {}))
        else:
            _embedding_out(out, torch_prefix, node, snode)

    emb("pos_embed", "feature_extractor.pos_embed")
    emb("vel_embed", "feature_extractor.vel_embed")
    emb("joint_embed", "semantic_embedding.spa_embedding")
    emb("frame_embed", "semantic_embedding.tem_embedding")
    emb("class_embed", "semantic_embedding.cls_embedding")

    # the semantic one-hot dims are the embeddings' input dims; prefer
    # tree-derived values so c'tor geometry follows the checkpoint
    if "joint_embed" in params:
        num_point = _embed_in_dim(params["joint_embed"])
    if "frame_embed" in params:
        num_segment = _embed_in_dim(params["frame_embed"])
    if "joint_embed" in params:
        out["semantic_embedding.spa_onehot.onehot"] = _onehot_buffer(
            num_point, num_segment, mode=0)
    if "frame_embed" in params:
        out["semantic_embedding.tem_onehot.onehot"] = _onehot_buffer(
            num_segment, num_point, mode=1)
    if "class_embed" in params:
        out["semantic_embedding.cls_onehot.onehot"] = _onehot_buffer(
            _embed_in_dim(params["class_embed"]), 1, mode=2)

    def export_gcn_stack(flax_name: str, torch_name: str,
                         num_point: int = 25) -> None:
        sg, sgs = params.get(flax_name, {}), stats.get(flax_name, {})
        i = 1
        while f"g{i}" in sg:  # G-attention builders (first stack only)
            g = sg[f"g{i}"]
            gs = sgs.get(f"g{i}", {})
            gp = f"{torch_name}.gcn_g{i}"
            for gname in ("g1", "g2", "g3", "g4"):
                if gname in g and "conv" in g[gname]:
                    _plain_conv_out(out, f"{gp}.{gname}", g[gname])
            if "g3" in g and "kernel" in g["g3"]:
                # GT2: per-frame scalar Linear over (c*v) features
                out[f"{gp}.g3.weight"] = np.ascontiguousarray(
                    _vc_to_cv(_np(g["g3"]["kernel"]), num_point).T)
                if "bias" in g["g3"]:
                    out[f"{gp}.g3.bias"] = _np(g["g3"]["bias"])
            if "tem_embedding" in g:
                # GT5/GT6 one-hot temporal Embedding (+ GT5 MLPTemporal
                # over the V*V maps as g3_cnn{li}); map channels are
                # (i, j) attention indices — no (c, v) reorder
                _embedding_out(out, f"{gp}.tem_embedding",
                               g["tem_embedding"],
                               gs.get("tem_embedding", {}))
                out[f"{gp}.tem_onehot.onehot"] = _onehot_buffer(
                    _embed_in_dim(g["tem_embedding"]), 1, mode=1)
                li = 1
                while f"g3_cnn{li}" in g:
                    _conv_block_out(out, f"{gp}.g3.cnn{li}",
                                    g[f"g3_cnn{li}"],
                                    gs.get(f"g3_cnn{li}", {}))
                    li += 1
            elif "g3" in g and "cnn1" in g["g3"]:
                # GT3/GT4: per-frame scalar MLPTemporal over (c*v)
                li = 1
                while f"cnn{li}" in g["g3"]:
                    node = g["g3"][f"cnn{li}"]
                    last = "conv" in node
                    conv = node["conv"] if last else node["cnn"]["conv"]
                    kern = _np(conv["kernel"])
                    if li == 1:
                        # first layer consumes (c, v)-flattened features
                        if kern.ndim == 4:
                            kk, one, cin_all, outd = kern.shape
                            flat = kern.reshape(kk * one, cin_all, outd)
                            kern = np.stack(
                                [_vc_to_cv(c, num_point)
                                 for c in flat]).reshape(
                                    kk, one, cin_all, outd)
                        else:
                            kern = _vc_to_cv(kern, num_point)
                    pref = f"{gp}.g3.cnn{li}"
                    out[f"{pref}.block.conv.conv.weight"] = \
                        _torch_conv_weight(kern)
                    if "bias" in conv:
                        out[f"{pref}.block.conv.conv.bias"] = _np(
                            conv["bias"])
                    if not last and "norm" in node:
                        _bn_out(out, f"{pref}.block.norm", node["norm"],
                                gs["g3"][f"cnn{li}"]["norm"])
                    li += 1
            if "alpha" in g:
                out[f"{gp}.alpha"] = _np(g["alpha"])
            i += 1
        i = 1
        while f"gcn{i}" in sg:
            n, ns = sg[f"gcn{i}"], sgs.get(f"gcn{i}", {})
            pref = f"{torch_name}.gcn{i}"
            out[f"{pref}.w1.block.conv.conv.weight"] = dense_to_pointwise(
                n["w1"]["kernel"])
            if "bias" in n["w1"]:
                out[f"{pref}.w1.block.conv.conv.bias"] = _np(
                    n["w1"]["bias"])
            _plain_conv_out(out, f"{pref}.w2", n["w2"])
            if "res_alpha" in n:  # "varalpha" learnable residual scale
                out[f"{pref}.res_alpha"] = _np(n["res_alpha"])
            if "w0" in n:  # gcn_v_kernel > 0 pre-aggregation conv
                _plain_conv_out(out, f"{pref}.w0", n["w0"])
            if "w3" in n:  # attn_mode 2 squeeze-excite reduction
                _plain_conv_out(out, f"{pref}.w3", n["w3"])
            if "norm" in n:
                _bn_out(out, f"{pref}.norm", n["norm"], ns["norm"])
            if f"prenorm{i}" in sg:
                _bn_out(out, f"{torch_name}.gcn_prenorm{i}",
                        sg[f"prenorm{i}"], sgs[f"prenorm{i}"])
            if f"ffn{i}" in sg:
                fn, fns = sg[f"ffn{i}"], sgs.get(f"ffn{i}", {})
                fp = f"{torch_name}.gcn_ffn{i}"
                for which in ("ffn1", "ffn2"):
                    if linear_ffn:
                        conv = fn[which]["cnn"]["conv"]
                        out[f"{fp}.{which}.block.linear.linear."
                            f"weight"] = np.ascontiguousarray(
                                _np(conv["kernel"]).T)
                        if "bias" in conv:
                            out[f"{fp}.{which}.block.linear.linear."
                                f"bias"] = _np(conv["bias"])
                        if "norm" in fn[which]:
                            _bn_out(out, f"{fp}.{which}.block.norm",
                                    fn[which]["norm"],
                                    fns[which]["norm"])
                    else:
                        _conv_block_out(out, f"{fp}.{which}", fn[which],
                                        fns.get(which, {}))
                if "norm" in fn:  # post-norm FFN variants (modes 1xx/3xx)
                    _bn_out(out, f"{fp}.norm", fn["norm"], fns["norm"])
            if f"res{i}" in sg:  # second-stack residual projection
                _plain_conv_out(out, f"{torch_name}.gcn_res{i}",
                                sg[f"res{i}"])
            i += 1

    export_gcn_stack("sgcn", "sgcn", num_point)
    export_gcn_stack("sgcn2", "sgcn2", num_point)

    for name in params:  # temporal MLP branches
        m = re.match(r"^tem(\d+)_(\d+)_k(\d+)$", name)
        if not m:
            continue
        i, j, k = m.groups()
        node = params[name]["cnn"]
        snode = stats.get(name, {}).get("cnn", {})
        li = 1
        while f"cnn{li}" in node:
            _conv_block_out(out, f"tem_mlp_{i}_{j}_k{k}.cnn.cnn{li}",
                            node[f"cnn{li}"], snode.get(f"cnn{li}", {}))
            li += 1

    if "fc" in params:
        out["fc.weight"] = _np(params["fc"]["kernel"]).T
        out["fc.bias"] = _np(params["fc"]["bias"])
    i = 1
    while f"fc{i}" in params:  # per-branch heads (output_merge == 2)
        out[f"fc{i}.weight"] = _np(params[f"fc{i}"]["kernel"]).T
        out[f"fc{i}.bias"] = _np(params[f"fc{i}"]["bias"])
        i += 1
    return out


def sgn_transformer_state_dict_from_variables(
        variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Our SGNTransformer (v15) variables -> reference sgn_v15.py
    state_dict (inverse of
    torch_import.sgn_transformer_variables_from_torch; reference naming:
    model/architecture/sgn/sgn_v15.py + the lucidrains transformer at
    model/layers/attention/crossattention.py:202-304)."""
    params = variables["params"]
    stats = _require_stats(variables)
    out: Dict[str, np.ndarray] = {}

    for flax_name, torch_prefix in (
            ("pos_embed", "feature_extractor.pos_embed"),
            ("vel_embed", "feature_extractor.vel_embed"),
            ("joint_embed", "semantic_embedding.spa_embedding"),
            ("frame_embed", "semantic_embedding.tem_embedding"),
            ("class_embed", "semantic_embedding.cls_embedding")):
        if flax_name in params:
            _embedding_out(out, torch_prefix, params[flax_name],
                           stats.get(flax_name, {}))

    num_point = (_embed_in_dim(params["joint_embed"])
                 if "joint_embed" in params else 25)
    num_segment = (_embed_in_dim(params["frame_embed"])
                   if "frame_embed" in params else 20)
    if "joint_embed" in params:
        out["semantic_embedding.spa_onehot.onehot"] = _onehot_buffer(
            num_point, num_segment, mode=0)
    if "frame_embed" in params:
        out["semantic_embedding.tem_onehot.onehot"] = _onehot_buffer(
            num_segment, num_point, mode=1)
    if "class_embed" in params:
        out["semantic_embedding.cls_onehot.onehot"] = _onehot_buffer(
            _embed_in_dim(params["class_embed"]), 1, mode=2)

    def channel_norm_out(torch_prefix, node, snode):
        """Normalize-wrapped BN1d (has running stats) or LayerNorm."""
        n = node["norm"]
        sn = (snode or {}).get("norm", {})
        if "mean" in sn:
            _bn_out(out, torch_prefix, n, sn)
        else:
            out[f"{torch_prefix}.weight"] = _np(n["scale"])
            out[f"{torch_prefix}.bias"] = _np(n["bias"])

    def dense_out(torch_prefix, node):
        out[f"{torch_prefix}.weight"] = np.ascontiguousarray(
            _np(node["kernel"]).T)
        if "bias" in node:
            out[f"{torch_prefix}.bias"] = _np(node["bias"])

    for mha in ("spatial_mha", "temporal_mha"):
        node = params.get(mha)
        if node is None:
            continue
        if any(k.startswith("layer") for k in node):
            raise ValueError(
                f"{mha} uses the torch-style generic encoder "
                "(norm != 'bn' in the reference's mha kwargs) — only the "
                "lucid/CrossViT encoder branch has a reference-checkpoint "
                "mapping (matching torch_import's coverage)")
        snode = stats.get(mha, {})
        i = 1
        while f"l{i}_attn" in node:
            base = f"{mha}.transformer.layers.l{i}"
            channel_norm_out(f"{base}.attn.norm.fn",
                             node[f"l{i}_attn_norm"],
                             snode.get(f"l{i}_attn_norm"))
            channel_norm_out(f"{base}.ffn.norm.fn",
                             node[f"l{i}_ffn_norm"],
                             snode.get(f"l{i}_ffn_norm"))
            at = node[f"l{i}_attn"]
            for lin in ("to_q", "to_k", "to_v"):
                dense_out(f"{base}.attn.fn.{lin}", at[lin])
            dense_out(f"{base}.attn.fn.to_out.linear", at["to_out"])
            if "residual" in at:
                dense_out(f"{base}.attn.fn.residual", at["residual"])
            ff = node[f"l{i}_ffn"]
            dense_out(f"{base}.ffn.fn.net.linear1", ff["linear1"])
            dense_out(f"{base}.ffn.fn.net.linear2", ff["linear2"])
            if "residual" in ff:
                dense_out(f"{base}.ffn.fn.residual", ff["residual"])
            i += 1
        if "global_norm" in node:
            channel_norm_out(f"{mha}.transformer.norm.fn",
                             node["global_norm"],
                             snode.get("global_norm"))

    out["fc.weight"] = np.ascontiguousarray(_np(params["fc"]["kernel"]).T)
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
                   choices=["agcn", "aagcn", "sgn_original", "sgn",
                            "sgn_transformer"],
                   help="model family to export as")
    p.add_argument("--linear-ffn", action="store_true",
                   help="sgn only: checkpoint was trained with a "
                        "'Linear' FFN mode (sgcn_ffn 2xx/3xx)")
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
    import functools

    export = {"agcn": agcn_state_dict_from_variables,
              "aagcn": aagcn_state_dict_from_variables,
              "sgn_original": sgn_original_state_dict_from_variables,
              "sgn": functools.partial(sgn_state_dict_from_variables,
                                       linear_ffn=args.linear_ffn),
              "sgn_transformer": sgn_transformer_state_dict_from_variables}
    sd = export[args.model](variables)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
