"""PyTorch checkpoint import: map reference state_dicts onto flax pytrees.

Used for (a) parity tests against the reference implementation and (b)
migrating users' existing 2s-AGCN checkpoints onto this framework. Only
array-layout conversion happens here — no torch code is required at
runtime; inputs are plain numpy arrays keyed by torch parameter names
(reference checkpoint format described in utils/processor.py:225-270).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def pointwise_kernel(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv (out, in, 1, 1) -> dense (in, out)."""
    return w[:, :, 0, 0].T


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv1d (out, in, k) -> flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch linear (out, in) -> dense (in, out)."""
    return w.T


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


def _strip_module_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DDP's 'module.' prefix (reference processor.py:242-249)."""
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def state_dict_to_numpy(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Convert a torch state_dict (tensors or arrays) to plain numpy."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        # copy: .numpy() shares memory with the live torch tensor, and a
        # later torch optimizer step would silently mutate our arrays
        out[k] = np.array(v, copy=True)
    return _strip_module_prefix(out)


def _bn(tree: Dict, params_path: Tuple[str, ...], stats_path: Tuple[str, ...],
        sd: Mapping[str, np.ndarray], prefix: str) -> None:
    _set(tree["params"], params_path + ("scale",), sd[f"{prefix}.weight"])
    _set(tree["params"], params_path + ("bias",), sd[f"{prefix}.bias"])
    _set(tree["batch_stats"], stats_path + ("mean",),
         sd[f"{prefix}.running_mean"])
    _set(tree["batch_stats"], stats_path + ("var",),
         sd[f"{prefix}.running_var"])


def aagcn_variables_from_torch(sd: Mapping[str, Any],
                               num_subset: int = 3,
                               adaptive: bool = True,
                               data_norm: str = "bn") -> Dict[str, Dict]:
    """Map the reference AAGCN state_dict (aagcn.py Model) onto our AAGCN."""
    sd = state_dict_to_numpy(sd)
    tree: Dict[str, Dict] = {"params": {}, "batch_stats": {}}

    if data_norm == "bn":
        _bn(tree, ("data_bn",), ("data_bn",), sd, "data_bn")
    else:
        _set(tree["params"], ("data_bn", "scale"), sd["data_bn.weight"])
        _set(tree["params"], ("data_bn", "bias"), sd["data_bn.bias"])
    _set(tree["params"], ("fc", "kernel"), linear_kernel(sd["fc.weight"]))
    _set(tree["params"], ("fc", "bias"), sd["fc.bias"])

    blocks = sorted({k.split(".")[0] for k in sd if re.match(r"^l\d+\.", k)})
    for block in blocks:
        g = (block, "gcn1")
        p = f"{block}.gcn1"
        # graph conv ----------------------------------------------------
        for k in range(num_subset):
            if adaptive:
                _set(tree["params"], g + ("agcn", f"conv_d{k}_kernel"),
                     pointwise_kernel(sd[f"{p}.conv_d.{k}.weight"]))
                _set(tree["params"], g + ("agcn", f"conv_d{k}_bias"),
                     sd[f"{p}.conv_d.{k}.bias"])
                for role in ("a", "b"):
                    _set(tree["params"],
                         g + ("agcn", f"conv_{role}{k}_kernel"),
                         pointwise_kernel(sd[f"{p}.agcn.conv_{role}.{k}.weight"]))
                    _set(tree["params"],
                         g + ("agcn", f"conv_{role}{k}_bias"),
                         sd[f"{p}.agcn.conv_{role}.{k}.bias"])
            else:
                _set(tree["params"], g + ("agcn", f"conv_d{k}_kernel"),
                     pointwise_kernel(sd[f"{p}.conv_d.{k}.weight"]))
                _set(tree["params"], g + ("agcn", f"conv_d{k}_bias"),
                     sd[f"{p}.conv_d.{k}.bias"])
        if adaptive:
            _set(tree["params"], g + ("agcn", "PA"), sd[f"{p}.agcn.PA"])
            _set(tree["params"], g + ("agcn", "alpha"),
                 sd[f"{p}.agcn.alpha"])
        # attention ------------------------------------------------------
        if f"{p}.attn_s.conv_sa.weight" in sd:
            _set(tree["params"], g + ("attn_s", "conv_sa", "kernel"),
                 conv1d_kernel(sd[f"{p}.attn_s.conv_sa.weight"]))
            _set(tree["params"], g + ("attn_s", "conv_sa", "bias"),
                 sd[f"{p}.attn_s.conv_sa.bias"])
            _set(tree["params"], g + ("attn_t", "conv_ta", "kernel"),
                 conv1d_kernel(sd[f"{p}.attn_t.conv_ta.weight"]))
            _set(tree["params"], g + ("attn_t", "conv_ta", "bias"),
                 sd[f"{p}.attn_t.conv_ta.bias"])
            for fc in ("fc1c", "fc2c"):
                _set(tree["params"], g + ("attn_c", fc, "kernel"),
                     linear_kernel(sd[f"{p}.attn_c.{fc}.weight"]))
                _set(tree["params"], g + ("attn_c", fc, "bias"),
                     sd[f"{p}.attn_c.{fc}.bias"])
        # norm / residual / tcn -----------------------------------------
        _bn(tree, g + ("bn",), g + ("bn",), sd, f"{p}.bn")
        if f"{p}.down.0.weight" in sd:
            _set(tree["params"], g + ("down_conv", "conv", "kernel"),
                 pointwise_kernel(sd[f"{p}.down.0.weight"]))
            _set(tree["params"], g + ("down_conv", "conv", "bias"),
                 sd[f"{p}.down.0.bias"])
            _bn(tree, g + ("down_bn",), g + ("down_bn",), sd, f"{p}.down.1")
        _set(tree["params"], (block, "tcn1", "conv", "conv", "kernel"),
             conv_kernel(sd[f"{block}.tcn1.conv.weight"]))
        _set(tree["params"], (block, "tcn1", "conv", "conv", "bias"),
             sd[f"{block}.tcn1.conv.bias"])
        _bn(tree, (block, "tcn1", "bn"), (block, "tcn1", "bn"), sd,
            f"{block}.tcn1.bn")
        if f"{block}.residual.conv.weight" in sd:
            _set(tree["params"], (block, "residual", "conv", "conv",
                                  "kernel"),
                 conv_kernel(sd[f"{block}.residual.conv.weight"]))
            _set(tree["params"], (block, "residual", "conv", "conv", "bias"),
                 sd[f"{block}.residual.conv.bias"])
            _bn(tree, (block, "residual", "bn"), (block, "residual", "bn"),
                sd, f"{block}.residual.bn")

    return tree


def sgn_variables_from_torch(sd: Mapping[str, Any]) -> Dict[str, Dict]:
    """Map the reference SGN v14 state_dict onto our SGN (default config
    path: embedding modes 1-4/11/12, shared or per-layer G, t_mode 1/2).

    Reference naming: model/architecture/sgn/sgn_v14.py +
    blocks/{semantic,spatial,temporal}.py; Conv nesting produces keys like
    'sgcn.gcn1.w1.block.conv.conv.weight'.
    """
    sd = state_dict_to_numpy(sd)
    tree: Dict[str, Dict] = {"params": {}, "batch_stats": {}}

    def conv_block(torch_prefix, flax_path, kernel_fn=None):
        """One reference Conv block (conv [+norm]) -> ConvNormAct tree."""
        w = sd[f"{torch_prefix}.block.conv.conv.weight"]
        if kernel_fn is None:
            k = w.shape[-1]
            conv = pointwise_kernel(w) if k == 1 else np.transpose(
                w, (3, 2, 1, 0))
        else:
            conv = kernel_fn(w)
        _set(tree["params"], flax_path + ("cnn", "conv", "kernel"), conv)
        if f"{torch_prefix}.block.conv.conv.bias" in sd:
            _set(tree["params"], flax_path + ("cnn", "conv", "bias"),
                 sd[f"{torch_prefix}.block.conv.conv.bias"])
        if f"{torch_prefix}.block.norm.weight" in sd:
            _bn(tree, flax_path + ("norm",), flax_path + ("norm",), sd,
                f"{torch_prefix}.block.norm")

    def plain_conv(torch_prefix, flax_path):
        """Reference Conv with no norm/act wrapper needed on our side."""
        w = sd[f"{torch_prefix}.block.conv.conv.weight"]
        k = w.shape[-1]
        conv = pointwise_kernel(w) if k == 1 else np.transpose(w, (3, 2, 1, 0))
        _set(tree["params"], flax_path + ("conv", "kernel"), conv)
        if f"{torch_prefix}.block.conv.conv.bias" in sd:
            _set(tree["params"], flax_path + ("conv", "bias"),
                 sd[f"{torch_prefix}.block.conv.conv.bias"])

    def embedding(torch_prefix, flax_path):
        if isinstance(flax_path, str):
            flax_path = (flax_path,)
        if f"{torch_prefix}.norm.bn.weight" in sd:
            _bn(tree, flax_path + ("in_norm",), flax_path + ("in_norm",),
                sd, f"{torch_prefix}.norm.bn")
        i = 1
        while f"{torch_prefix}.cnn{i}.block.conv.conv.weight" in sd:
            conv_block(f"{torch_prefix}.cnn{i}", flax_path + (f"cnn{i}",))
            i += 1

    if "feature_extractor.pos_embed.0.cnn1.block.conv.conv.weight" in sd:
        # body-part segment embedding: one Embedding per part group
        # (blocks/feature_extractor.py:50-70)
        for idx in range(8):
            embedding(f"feature_extractor.pos_embed.{idx}",
                      ("pos_embed", f"seg{idx}"))
            embedding(f"feature_extractor.vel_embed.{idx}",
                      ("vel_embed", f"seg{idx}"))
    else:
        embedding("feature_extractor.pos_embed", "pos_embed")
        embedding("feature_extractor.vel_embed", "vel_embed")
    embedding("semantic_embedding.spa_embedding", "joint_embed")
    embedding("semantic_embedding.tem_embedding", "frame_embed")
    embedding("semantic_embedding.cls_embedding", "class_embed")

    # spatial GCN block -------------------------------------------------
    # the (c, v) reorder needs the joint count; derive it from the
    # semantic joint embedding's one-hot input dim when present (its
    # in-channels == num_point), else NTU's 25
    _np_key = "semantic_embedding.spa_embedding.cnn1.block.conv.conv.weight"
    num_point = sd[_np_key].shape[1] if _np_key in sd else 25

    def cv_to_vc(w, num_point=num_point):
        """Reorder a kernel whose input features are (c, v)-flattened to
        our (v, c) order. w: (in=c*v, out) dense kernel."""
        cin = w.shape[0] // num_point
        return w.reshape(cin, num_point, -1).transpose(1, 0, 2).reshape(
            w.shape)

    i = 1
    while f"sgcn.gcn_g{i}.g1.block.conv.conv.weight" in sd:
        for gname in ("g1", "g2", "g3", "g4"):
            if f"sgcn.gcn_g{i}.{gname}.block.conv.conv.weight" in sd:
                plain_conv(f"sgcn.gcn_g{i}.{gname}",
                           ("sgcn", f"g{i}", gname))
        # GT2: per-frame scalar Linear over (c*v) features
        if f"sgcn.gcn_g{i}.g3.weight" in sd:
            _set(tree["params"], ("sgcn", f"g{i}", "g3", "kernel"),
                 cv_to_vc(linear_kernel(sd[f"sgcn.gcn_g{i}.g3.weight"])))
            if f"sgcn.gcn_g{i}.g3.bias" in sd:
                _set(tree["params"], ("sgcn", f"g{i}", "g3", "bias"),
                     sd[f"sgcn.gcn_g{i}.g3.bias"])
        if f"sgcn.gcn_g{i}.tem_embedding.cnn1.block.conv.conv.weight" in sd:
            # GT5/GT6 (blocks/spatial.py:547-700): one-hot temporal
            # Embedding + (GT5 only) MLPTemporal over the V*V-flattened
            # attention maps. Map channels are (i, j) attention indices —
            # same flattening order on both sides, so no cv_to_vc.
            embedding(f"sgcn.gcn_g{i}.tem_embedding",
                      ("sgcn", f"g{i}", "tem_embedding"))
            li = 1
            while f"sgcn.gcn_g{i}.g3.cnn{li}.block.conv.conv.weight" in sd:
                conv_block(f"sgcn.gcn_g{i}.g3.cnn{li}",
                           ("sgcn", f"g{i}", f"g3_cnn{li}"))
                li += 1
            if f"sgcn.gcn_g{i}.alpha" in sd:
                _set(tree["params"], ("sgcn", f"g{i}", "alpha"),
                     sd[f"sgcn.gcn_g{i}.alpha"])
            i += 1
            continue
        # GT3/GT4: per-frame scalar MLPTemporal over (c*v) features
        li = 1
        while f"sgcn.gcn_g{i}.g3.cnn{li}.block.conv.conv.weight" in sd:
            prefix = f"sgcn.gcn_g{i}.g3.cnn{li}"
            w = sd[f"{prefix}.block.conv.conv.weight"]
            k = w.shape[-1]
            if k == 1:
                conv = pointwise_kernel(w)
            else:
                conv = np.transpose(w, (3, 2, 1, 0))
            if li == 1:
                # first layer consumes the (c, v)-flattened features
                if conv.ndim == 4:
                    kk, one, cin_all, outd = conv.shape
                    flat = conv.reshape(kk * one, cin_all, outd)
                    conv = np.stack([cv_to_vc(c) for c in flat]).reshape(
                        kk, one, cin_all, outd)
                else:
                    conv = cv_to_vc(conv)
            is_last = f"sgcn.gcn_g{i}.g3.cnn{li + 1}." \
                      f"block.conv.conv.weight" not in sd
            if is_last:
                path = ("sgcn", f"g{i}", "g3", f"cnn{li}", "conv")
                _set(tree["params"], path + ("kernel",), conv)
                if f"{prefix}.block.conv.conv.bias" in sd:
                    _set(tree["params"], path + ("bias",),
                         sd[f"{prefix}.block.conv.conv.bias"])
            else:
                path = ("sgcn", f"g{i}", "g3", f"cnn{li}")
                _set(tree["params"], path + ("cnn", "conv", "kernel"),
                     conv)
                if f"{prefix}.block.conv.conv.bias" in sd:
                    _set(tree["params"], path + ("cnn", "conv", "bias"),
                         sd[f"{prefix}.block.conv.conv.bias"])
                if f"{prefix}.block.norm.weight" in sd:
                    _bn(tree, path + ("norm",), path + ("norm",), sd,
                        f"{prefix}.block.norm")
            li += 1
        if f"sgcn.gcn_g{i}.alpha" in sd:
            _set(tree["params"], ("sgcn", f"g{i}", "alpha"),
                 sd[f"sgcn.gcn_g{i}.alpha"])
        i += 1
    i = 1
    while f"sgcn.gcn{i}.w1.block.conv.conv.weight" in sd:
        _set(tree["params"], ("sgcn", f"gcn{i}", "w1", "kernel"),
             pointwise_kernel(sd[f"sgcn.gcn{i}.w1.block.conv.conv.weight"]))
        if f"sgcn.gcn{i}.w1.block.conv.conv.bias" in sd:
            _set(tree["params"], ("sgcn", f"gcn{i}", "w1", "bias"),
                 sd[f"sgcn.gcn{i}.w1.block.conv.conv.bias"])
        plain_conv(f"sgcn.gcn{i}.w2", ("sgcn", f"gcn{i}", "w2"))
        if f"sgcn.gcn{i}.res_alpha" in sd:
            # learnable residual scale ("varalpha",
            # blocks/spatial.py:728-733)
            _set(tree["params"], ("sgcn", f"gcn{i}", "res_alpha"),
                 sd[f"sgcn.gcn{i}.res_alpha"])
        if f"sgcn.gcn{i}.w0.block.conv.conv.weight" in sd:
            # gcn_v_kernel > 0: pre-aggregation temporal conv
            plain_conv(f"sgcn.gcn{i}.w0", ("sgcn", f"gcn{i}", "w0"))
        if f"sgcn.gcn{i}.w3.block.conv.conv.weight" in sd:
            # attn_mode 2 squeeze-excite reduction conv
            plain_conv(f"sgcn.gcn{i}.w3", ("sgcn", f"gcn{i}", "w3"))
        if f"sgcn.gcn{i}.norm.weight" in sd:
            _bn(tree, ("sgcn", f"gcn{i}", "norm"),
                ("sgcn", f"gcn{i}", "norm"), sd, f"sgcn.gcn{i}.norm")
        if f"sgcn.gcn_prenorm{i}.weight" in sd:
            _bn(tree, ("sgcn", f"prenorm{i}"), ("sgcn", f"prenorm{i}"), sd,
                f"sgcn.gcn_prenorm{i}")
        if f"sgcn.gcn_ffn{i}.ffn1.block.conv.conv.weight" in sd:
            conv_block(f"sgcn.gcn_ffn{i}.ffn1", ("sgcn", f"ffn{i}", "ffn1"))
            conv_block(f"sgcn.gcn_ffn{i}.ffn2", ("sgcn", f"ffn{i}", "ffn2"))
        elif f"sgcn.gcn_ffn{i}.ffn1.block.linear.linear.weight" in sd:
            # "Linear" FFN variants (modes 2xx/3xx) == 1x1 convs
            for which in ("ffn1", "ffn2"):
                pref = f"sgcn.gcn_ffn{i}.{which}.block"
                path = ("sgcn", f"ffn{i}", which)
                _set(tree["params"], path + ("cnn", "conv", "kernel"),
                     linear_kernel(sd[f"{pref}.linear.linear.weight"]))
                if f"{pref}.linear.linear.bias" in sd:
                    _set(tree["params"], path + ("cnn", "conv", "bias"),
                         sd[f"{pref}.linear.linear.bias"])
                if f"{pref}.norm.weight" in sd:
                    _bn(tree, path + ("norm",), path + ("norm",), sd,
                        f"{pref}.norm")
        if f"sgcn.gcn_ffn{i}.norm.weight" in sd:
            # post-norm FFN variants (modes 1xx/3xx)
            _bn(tree, ("sgcn", f"ffn{i}", "norm"),
                ("sgcn", f"ffn{i}", "norm"), sd, f"sgcn.gcn_ffn{i}.norm")
        i += 1

    # second GCN stack (gcn_fpn = 10, GCNSpatialBlock2 -> our "sgcn2"
    # block); its gcn_g{i}/alpha params are dead in the reference's
    # forward (Block2 always receives g_attn) and are skipped
    i = 1
    while f"sgcn2.gcn{i}.w1.block.conv.conv.weight" in sd:
        _set(tree["params"], ("sgcn2", f"gcn{i}", "w1", "kernel"),
             pointwise_kernel(sd[f"sgcn2.gcn{i}.w1.block.conv.conv.weight"]))
        if f"sgcn2.gcn{i}.w1.block.conv.conv.bias" in sd:
            _set(tree["params"], ("sgcn2", f"gcn{i}", "w1", "bias"),
                 sd[f"sgcn2.gcn{i}.w1.block.conv.conv.bias"])
        plain_conv(f"sgcn2.gcn{i}.w2", ("sgcn2", f"gcn{i}", "w2"))
        if f"sgcn2.gcn{i}.res_alpha" in sd:
            _set(tree["params"], ("sgcn2", f"gcn{i}", "res_alpha"),
                 sd[f"sgcn2.gcn{i}.res_alpha"])
        for extra in ("w0", "w3"):
            if f"sgcn2.gcn{i}.{extra}.block.conv.conv.weight" in sd:
                plain_conv(f"sgcn2.gcn{i}.{extra}",
                           ("sgcn2", f"gcn{i}", extra))
        if f"sgcn2.gcn{i}.norm.weight" in sd:
            _bn(tree, ("sgcn2", f"gcn{i}", "norm"),
                ("sgcn2", f"gcn{i}", "norm"), sd, f"sgcn2.gcn{i}.norm")
        if f"sgcn2.gcn_prenorm{i}.weight" in sd:
            _bn(tree, ("sgcn2", f"prenorm{i}"), ("sgcn2", f"prenorm{i}"),
                sd, f"sgcn2.gcn_prenorm{i}")
        if f"sgcn2.gcn_ffn{i}.ffn1.block.conv.conv.weight" in sd:
            conv_block(f"sgcn2.gcn_ffn{i}.ffn1",
                       ("sgcn2", f"ffn{i}", "ffn1"))
            conv_block(f"sgcn2.gcn_ffn{i}.ffn2",
                       ("sgcn2", f"ffn{i}", "ffn2"))
        if f"sgcn2.gcn_res{i}.block.conv.conv.weight" in sd:
            plain_conv(f"sgcn2.gcn_res{i}", ("sgcn2", f"res{i}"))
        i += 1

    # temporal branches -------------------------------------------------
    for key in list(sd):
        m = re.match(r"^tem_mlp_(\d+)_(\d+)_k(\d+)\.cnn\.cnn(\d)\."
                     r"block\.conv\.conv\.weight$", key)
        if not m:
            continue
        i, j, k, layer = m.groups()
        conv_block(f"tem_mlp_{i}_{j}_k{k}.cnn.cnn{layer}",
                   (f"tem{i}_{j}_k{k}", "cnn", f"cnn{layer}"))

    if "fc.weight" in sd:  # absent when mapping a sub-module state dict
        _set(tree["params"], ("fc", "kernel"),
             linear_kernel(sd["fc.weight"]))
        _set(tree["params"], ("fc", "bias"), sd["fc.bias"])
    # per-branch heads (gcn_fpn_output_merge == 2, sgn_v14.py:798-803);
    # the reference over-allocates fc heads (len(multi_t) * stale
    # t_kernels) — only the first N are used in forward, matching ours
    i = 1
    while f"fc{i}.weight" in sd:
        _set(tree["params"], (f"fc{i}", "kernel"),
             linear_kernel(sd[f"fc{i}.weight"]))
        _set(tree["params"], (f"fc{i}", "bias"), sd[f"fc{i}.bias"])
        i += 1
    return tree


def _transformer_layer(tree: Dict, sd: Mapping[str, np.ndarray],
                       torch_prefix: str, flax_path: Tuple[str, ...]) -> None:
    """torch nn.TransformerEncoderLayer -> our TransformerEncoderLayer.
    Bias keys may be absent (the v32/v34 positional-arg bias=False slip);
    a fork-MHA rel-pos table maps onto our RelPosEmb1D."""
    _set(tree["params"], flax_path + ("self_attn", "in_proj_kernel"),
         np.ascontiguousarray(sd[f"{torch_prefix}.self_attn."
                                 f"in_proj_weight"].T))
    if f"{torch_prefix}.self_attn.in_proj_bias" in sd:
        _set(tree["params"], flax_path + ("self_attn", "in_proj_bias"),
             sd[f"{torch_prefix}.self_attn.in_proj_bias"])
    _set(tree["params"], flax_path + ("self_attn", "out_proj", "kernel"),
         linear_kernel(sd[f"{torch_prefix}.self_attn.out_proj.weight"]))
    if f"{torch_prefix}.self_attn.out_proj.bias" in sd:
        _set(tree["params"], flax_path + ("self_attn", "out_proj", "bias"),
             sd[f"{torch_prefix}.self_attn.out_proj.bias"])
    if f"{torch_prefix}.self_attn.pos_emb.rel_pos_emb" in sd:
        _set(tree["params"],
             flax_path + ("self_attn", "rel_pos", "rel_pos_emb"),
             sd[f"{torch_prefix}.self_attn.pos_emb.rel_pos_emb"])
    # bias keys may be absent (v32's accidental bias=False layers)
    for lin in ("linear1", "linear2"):
        _set(tree["params"], flax_path + (lin, "kernel"),
             linear_kernel(sd[f"{torch_prefix}.{lin}.weight"]))
        if f"{torch_prefix}.{lin}.bias" in sd:
            _set(tree["params"], flax_path + (lin, "bias"),
                 sd[f"{torch_prefix}.{lin}.bias"])
    for norm in ("norm1", "norm2"):
        _set(tree["params"], flax_path + (norm, "scale"),
             sd[f"{torch_prefix}.{norm}.weight"])
        if f"{torch_prefix}.{norm}.bias" in sd:
            _set(tree["params"], flax_path + (norm, "bias"),
                 sd[f"{torch_prefix}.{norm}.bias"])


def aagcn_v17_variables_from_torch(sd: Mapping[str, Any],
                                   data_norm: str = "bn") -> Dict[str, Dict]:
    """Map reference aagcn_v17.py Model -> models/aagcn_versions.AAGCNv17."""
    tree = aagcn_variables_from_torch(sd, data_norm=data_norm)
    sdn = state_dict_to_numpy(sd)
    if "cls_token" in sdn:
        _set(tree["params"], ("cls_token",), sdn["cls_token"])
    if "pos_encoder.pe" in sdn:
        _set(tree["params"], ("pos_encoder", "pe"), sdn["pos_encoder.pe"])
    i = 0
    while f"trans_enc.{i}.self_attn.in_proj_weight" in sdn:
        _transformer_layer(tree, sdn, f"trans_enc.{i}", (f"layer{i}",))
        i += 1
    return tree


def aagcn_v30_variables_from_torch(sd: Mapping[str, Any]
                                   ) -> Dict[str, Dict]:
    """Map reference aagcn_v30.py Model -> models/aagcn_versions.AAGCNv30."""
    tree = aagcn_variables_from_torch(sd)
    sdn = state_dict_to_numpy(sd)
    if "cls_token" in sdn:
        _set(tree["params"], ("cls_token",), sdn["cls_token"])
    if "t_pos_encoder.pe" in sdn:
        _set(tree["params"], ("t_pos_encoder", "pe"),
             sdn["t_pos_encoder.pe"])
    i = 0
    while f"t_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn:
        _transformer_layer(tree, sdn, f"t_trans_enc_layers.{i}",
                           (f"t_layer{i}",))
        i += 1
    i = 0
    while f"s_trans_enc_layers.{i}.agcn.PA" in sdn:
        p = f"s_trans_enc_layers.{i}"
        g = (f"s_layer{i}",)
        _set(tree["params"], g + ("agcn", "PA"), sdn[f"{p}.agcn.PA"])
        _set(tree["params"], g + ("agcn", "alpha"), sdn[f"{p}.agcn.alpha"])
        k = 0
        while f"{p}.agcn.conv_a.{k}.weight" in sdn:
            for role in ("a", "b"):
                _set(tree["params"],
                     g + ("agcn", f"conv_{role}{k}", "conv", "kernel"),
                     pointwise_kernel(sdn[f"{p}.agcn.conv_{role}.{k}"
                                          f".weight"]))
                _set(tree["params"],
                     g + ("agcn", f"conv_{role}{k}", "conv", "bias"),
                     sdn[f"{p}.agcn.conv_{role}.{k}.bias"])
            _set(tree["params"],
                 g + ("agcn", f"conv_d{k}", "conv", "kernel"),
                 pointwise_kernel(sdn[f"{p}.conv_d.{k}.weight"]))
            _set(tree["params"],
                 g + ("agcn", f"conv_d{k}", "conv", "bias"),
                 sdn[f"{p}.conv_d.{k}.bias"])
            k += 1
        _bn(tree, g + ("bn",), g + ("bn",), sdn, f"{p}.bn")
        i += 1
    return tree


def aagcn_v24_variables_from_torch(sd: Mapping[str, Any]
                                   ) -> Dict[str, Dict]:
    """Map reference aagcn_v24.py Model -> models/aagcn_versions.AAGCNv24."""
    tree = aagcn_variables_from_torch(sd)
    sdn = state_dict_to_numpy(sd)
    if "s_cls_token" in sdn:
        _set(tree["params"], ("s_cls_token",), sdn["s_cls_token"])
    if "s_pos_encoder.pe" in sdn:
        _set(tree["params"], ("s_pos_encoder", "pe"),
             sdn["s_pos_encoder.pe"])
    if "alpha" in sdn:
        _set(tree["params"], ("alpha",), sdn["alpha"])
    i = 0
    while f"s_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn:
        _transformer_layer(tree, sdn, f"s_trans_enc_layers.{i}",
                           (f"s_layer{i}",))
        if f"s_trans_enc_layers.{i}.PA" in sdn:
            _set(tree["params"], (f"s_layer{i}_PA",),
                 sdn[f"s_trans_enc_layers.{i}.PA"])
        i += 1
    return tree


def aagcn_v34_variables_from_torch(sd: Mapping[str, Any]
                                   ) -> Dict[str, Dict]:
    """Map reference aagcn_v34.py Model -> models/aagcn_versions.AAGCNv34."""
    tree = aagcn_variables_from_torch(sd)
    sdn = state_dict_to_numpy(sd)
    for key, path in (("cls_token", ("cls_token",)),
                      ("t_pos_encoder.pe", ("t_pos_encoder", "pe"))):
        if key in sdn:
            _set(tree["params"], path, sdn[key])
    for norm in ("sa_norm", "res_norm"):
        if f"{norm}.weight" in sdn:
            _set(tree["params"], (norm, "scale"), sdn[f"{norm}.weight"])
            _set(tree["params"], (norm, "bias"), sdn[f"{norm}.bias"])
    if "cls_pool_fc.weight" in sdn:
        _set(tree["params"], ("cls_pool_fc", "kernel"),
             linear_kernel(sdn["cls_pool_fc.weight"]))
        _set(tree["params"], ("cls_pool_fc", "bias"),
             sdn["cls_pool_fc.bias"])
    i = 0
    while f"t_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn:
        _transformer_layer(tree, sdn, f"t_trans_enc_layers.{i}",
                           (f"t_layer{i}",))
        i += 1
    i = 0
    while (f"s_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn
           or f"s_trans_enc_layers.{i}.subset0.self_attn."
              f"in_proj_weight" in sdn):
        if f"s_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn:
            _transformer_layer(tree, sdn, f"s_trans_enc_layers.{i}",
                               (f"s_layer{i}",))
        else:
            a = 0
            while f"s_trans_enc_layers.{i}.subset{a}.self_attn." \
                  f"in_proj_weight" in sdn:
                p = f"s_trans_enc_layers.{i}.subset{a}"
                _transformer_layer(tree, sdn, p,
                                   (f"s_layer{i}_subset{a}",))
                if f"{p}.PA" in sdn:
                    _set(tree["params"], (f"s_layer{i}_PA{a}",),
                         sdn[f"{p}.PA"])
                if f"{p}.alpha" in sdn:
                    _set(tree["params"], (f"s_layer{i}_alpha{a}",),
                         sdn[f"{p}.alpha"])
                a += 1
            if f"s_trans_enc_layers.{i}.sa_norm.weight" in sdn:  # v3
                _set(tree["params"], (f"sa_norm{i}", "scale"),
                     sdn[f"s_trans_enc_layers.{i}.sa_norm.weight"])
                _set(tree["params"], (f"sa_norm{i}", "bias"),
                     sdn[f"s_trans_enc_layers.{i}.sa_norm.bias"])
        i += 1
    return tree


def aagcn_v31_variables_from_torch(sd: Mapping[str, Any]
                                   ) -> Dict[str, Dict]:
    """Map reference aagcn_v31.py Model -> models/aagcn_versions.AAGCNv31."""
    tree = aagcn_variables_from_torch(sd)
    sdn = state_dict_to_numpy(sd)
    if "cls_token" in sdn:
        _set(tree["params"], ("cls_token",), sdn["cls_token"])
    if "t_pos_encoder.pe" in sdn:
        _set(tree["params"], ("t_pos_encoder", "pe"),
             sdn["t_pos_encoder.pe"])
    if "alpha" in sdn:
        _set(tree["params"], ("sa_alpha",), sdn["alpha"])
    for norm in ("sa_norm", "res_norm"):
        if f"{norm}.weight" in sdn:
            _set(tree["params"], (norm, "scale"), sdn[f"{norm}.weight"])
            _set(tree["params"], (norm, "bias"), sdn[f"{norm}.bias"])
    i = 0
    while f"t_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn:
        _transformer_layer(tree, sdn, f"t_trans_enc_layers.{i}",
                           (f"t_layer{i}",))
        i += 1
    i = 0
    while (f"s_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn
           or f"s_trans_enc_layers.{i}.subset0.self_attn."
              f"in_proj_weight" in sdn):
        if f"s_trans_enc_layers.{i}.self_attn.in_proj_weight" in sdn:
            _transformer_layer(tree, sdn, f"s_trans_enc_layers.{i}",
                               (f"s_layer{i}",))
        else:
            a = 0
            while f"s_trans_enc_layers.{i}.subset{a}.self_attn." \
                  f"in_proj_weight" in sdn:
                p = f"s_trans_enc_layers.{i}.subset{a}"
                _transformer_layer(tree, sdn, p,
                                   (f"s_layer{i}_subset{a}",))
                if f"{p}.PA" in sdn:
                    _set(tree["params"], (f"s_layer{i}_PA{a}",),
                         sdn[f"{p}.PA"])
                if f"{p}.alpha" in sdn:  # v32: per-layer alphas
                    _set(tree["params"], (f"s_layer{i}_alpha{a}",),
                         sdn[f"{p}.alpha"])
                a += 1
        i += 1
    return tree


def agcn_variables_from_torch(sd: Mapping[str, Any],
                              num_subset: int = 3) -> Dict[str, Dict]:
    """Map the reference AGCN state_dict (agcn.py Model) onto our AGCN."""
    sd = state_dict_to_numpy(sd)
    tree: Dict[str, Dict] = {"params": {}, "batch_stats": {}}

    _bn(tree, ("data_bn",), ("data_bn",), sd, "data_bn")
    _set(tree["params"], ("fc", "kernel"), linear_kernel(sd["fc.weight"]))
    _set(tree["params"], ("fc", "bias"), sd["fc.bias"])

    for key in sd:
        m = re.match(r"^(l\d+)\.", key)
        if not m:
            continue
        block = m.group(1)
        gcn = (block, "gcn1")
        if key == f"{block}.gcn1.PA":
            _set(tree["params"], gcn + ("PA",), sd[key])
        for k in range(num_subset):
            for role in ("a", "b", "d"):
                t_prefix = f"{block}.gcn1.conv_{role}.{k}"
                if key == f"{t_prefix}.weight":
                    _set(tree["params"],
                         gcn + (f"conv_{role}{k}_kernel",),
                         pointwise_kernel(sd[key]))
                elif key == f"{t_prefix}.bias":
                    _set(tree["params"],
                         gcn + (f"conv_{role}{k}_bias",), sd[key])

    for block in {k.split(".")[0] for k in sd if k.startswith("l")}:
        if f"{block}.gcn1.bn.weight" in sd:
            _bn(tree, (block, "gcn1", "bn"), (block, "gcn1", "bn"), sd,
                f"{block}.gcn1.bn")
        if f"{block}.gcn1.down.0.weight" in sd:
            _set(tree["params"],
                 (block, "gcn1", "down_conv", "conv", "kernel"),
                 pointwise_kernel(sd[f"{block}.gcn1.down.0.weight"]))
            _set(tree["params"], (block, "gcn1", "down_conv", "conv", "bias"),
                 sd[f"{block}.gcn1.down.0.bias"])
            _bn(tree, (block, "gcn1", "down_bn"), (block, "gcn1", "down_bn"),
                sd, f"{block}.gcn1.down.1")
        if f"{block}.tcn1.conv.weight" in sd:
            _set(tree["params"], (block, "tcn1", "conv", "conv", "kernel"),
                 conv_kernel(sd[f"{block}.tcn1.conv.weight"]))
            _set(tree["params"], (block, "tcn1", "conv", "conv", "bias"),
                 sd[f"{block}.tcn1.conv.bias"])
            _bn(tree, (block, "tcn1", "bn"), (block, "tcn1", "bn"), sd,
                f"{block}.tcn1.bn")
        if f"{block}.residual.conv.weight" in sd:
            _set(tree["params"], (block, "residual", "conv", "conv", "kernel"),
                 conv_kernel(sd[f"{block}.residual.conv.weight"]))
            _set(tree["params"], (block, "residual", "conv", "conv", "bias"),
                 sd[f"{block}.residual.conv.bias"])
            _bn(tree, (block, "residual", "bn"), (block, "residual", "bn"),
                sd, f"{block}.residual.bn")

    return tree


def sgn_original_variables_from_torch(sd: Mapping[str, Any]
                                      ) -> Dict[str, Dict]:
    """Map the ORIGINAL microsoft/SGN state_dict (reference
    model/architecture/sgn/archiv/sgn.py) onto models/sgn_original.py.

    Reference naming: embed blocks are Sequentials — with the input norm
    the convs sit at indices 1/3 (archiv/sgn.py:124-131), without it at
    0/2 (:133-139); gcn W/W1 are `cnn1x1` wrappers (:184-189); the
    frame-level convs live under `cnn.` (local, :155-163).
    """
    sd = state_dict_to_numpy(sd)
    tree: Dict[str, Dict] = {"params": {}, "batch_stats": {}}

    def dense(torch_prefix, flax_path):
        _set(tree["params"], flax_path + ("kernel",),
             pointwise_kernel(sd[f"{torch_prefix}.weight"]))
        if f"{torch_prefix}.bias" in sd:
            _set(tree["params"], flax_path + ("bias",),
                 sd[f"{torch_prefix}.bias"])

    for t_name, f_name, normed in (("joint_embed", "pos_embed", True),
                                   ("dif_embed", "dif_embed", True),
                                   ("spa_embed", "spa_embed", False),
                                   ("tem_embed", "tem_embed", False)):
        i = 0
        if normed:
            _bn(tree, (f_name, "in_norm"), (f_name, "in_norm"), sd,
                f"{t_name}.cnn.0.bn")
            i = 1
        dense(f"{t_name}.cnn.{i}.cnn", (f_name, "cnn1", "conv"))
        dense(f"{t_name}.cnn.{i + 2}.cnn", (f_name, "cnn2", "conv"))

    dense("compute_g1.g1.cnn", ("g1", "conv"))
    dense("compute_g1.g2.cnn", ("g2", "conv"))

    for i in (1, 2, 3):
        dense(f"gcn{i}.w.cnn", (f"gcn{i}", "w"))
        dense(f"gcn{i}.w1.cnn", (f"gcn{i}", "w1", "conv"))
        _bn(tree, (f"gcn{i}", "norm"), (f"gcn{i}", "norm"), sd,
            f"gcn{i}.bn")

    # local block: 1x3 temporal conv then 1x1 (archiv/sgn.py:155-163)
    _set(tree["params"], ("t_cnn1", "kernel"),
         np.transpose(sd["cnn.cnn1.weight"], (3, 2, 1, 0)))
    if "cnn.cnn1.bias" in sd:
        _set(tree["params"], ("t_cnn1", "bias"), sd["cnn.cnn1.bias"])
    _bn(tree, ("t_norm1",), ("t_norm1",), sd, "cnn.bn1")
    dense("cnn.cnn2", ("t_cnn2", "conv"))
    _bn(tree, ("t_norm2",), ("t_norm2",), sd, "cnn.bn2")

    _set(tree["params"], ("fc", "kernel"), linear_kernel(sd["fc.weight"]))
    _set(tree["params"], ("fc", "bias"), sd["fc.bias"])
    return tree


def sgn_transformer_variables_from_torch(
        sd: Mapping[str, Any]) -> Dict[str, Dict]:
    """Map the reference SGN v15 state_dict onto our SGNTransformer.

    Reference naming: model/architecture/sgn/sgn_v15.py (embeddings share
    the v14 Conv nesting) + the lucidrains transformer
    (model/layers/attention/crossattention.py:202-304): keys like
    'spatial_mha.transformer.layers.l1.attn.fn.to_q.weight' and the
    Normalize-wrapped norms at '...attn.norm.fn.*'.
    """
    sd = state_dict_to_numpy(sd)
    tree: Dict[str, Dict] = {"params": {}, "batch_stats": {}}

    def conv_block(torch_prefix, flax_path):
        w = sd[f"{torch_prefix}.block.conv.conv.weight"]
        k = w.shape[-1]
        conv = pointwise_kernel(w) if k == 1 else np.transpose(
            w, (3, 2, 1, 0))
        _set(tree["params"], flax_path + ("cnn", "conv", "kernel"), conv)
        if f"{torch_prefix}.block.conv.conv.bias" in sd:
            _set(tree["params"], flax_path + ("cnn", "conv", "bias"),
                 sd[f"{torch_prefix}.block.conv.conv.bias"])
        if f"{torch_prefix}.block.norm.weight" in sd:
            _bn(tree, flax_path + ("norm",), flax_path + ("norm",), sd,
                f"{torch_prefix}.block.norm")

    def embedding(torch_prefix, flax_name):
        if f"{torch_prefix}.norm.bn.weight" in sd:
            _bn(tree, (flax_name, "in_norm"), (flax_name, "in_norm"),
                sd, f"{torch_prefix}.norm.bn")
        i = 1
        while f"{torch_prefix}.cnn{i}.block.conv.conv.weight" in sd:
            conv_block(f"{torch_prefix}.cnn{i}", (flax_name, f"cnn{i}"))
            i += 1

    embedding("feature_extractor.pos_embed", "pos_embed")
    embedding("feature_extractor.vel_embed", "vel_embed")
    embedding("semantic_embedding.spa_embedding", "joint_embed")
    embedding("semantic_embedding.tem_embedding", "frame_embed")
    embedding("semantic_embedding.cls_embedding", "class_embed")

    def channel_norm(torch_prefix, flax_path):
        """Normalize-wrapped BN1d (running stats) or LayerNorm."""
        if f"{torch_prefix}.running_mean" in sd:
            _bn(tree, flax_path + ("norm",), flax_path + ("norm",), sd,
                torch_prefix)
        elif f"{torch_prefix}.weight" in sd:
            _set(tree["params"], flax_path + ("norm", "scale"),
                 sd[f"{torch_prefix}.weight"])
            _set(tree["params"], flax_path + ("norm", "bias"),
                 sd[f"{torch_prefix}.bias"])

    def dense(torch_prefix, flax_path):
        _set(tree["params"], flax_path + ("kernel",),
             linear_kernel(sd[f"{torch_prefix}.weight"]))
        if f"{torch_prefix}.bias" in sd:
            _set(tree["params"], flax_path + ("bias",),
                 sd[f"{torch_prefix}.bias"])

    for mha in ("spatial_mha", "temporal_mha"):
        i = 1
        while (f"{mha}.transformer.layers.l{i}.attn.fn.to_q.weight"
               in sd):
            base = f"{mha}.transformer.layers.l{i}"
            channel_norm(f"{base}.attn.norm.fn",
                         (mha, f"l{i}_attn_norm"))
            channel_norm(f"{base}.ffn.norm.fn", (mha, f"l{i}_ffn_norm"))
            at, fl = f"{base}.attn.fn", (mha, f"l{i}_attn")
            for lin in ("to_q", "to_k", "to_v"):
                dense(f"{at}.{lin}", fl + (lin,))
            dense(f"{at}.to_out.linear", fl + ("to_out",))
            if f"{at}.residual.weight" in sd:
                dense(f"{at}.residual", fl + ("residual",))
            ff, flf = f"{base}.ffn.fn", (mha, f"l{i}_ffn")
            dense(f"{ff}.net.linear1", flf + ("linear1",))
            dense(f"{ff}.net.linear2", flf + ("linear2",))
            if f"{ff}.residual.weight" in sd:
                dense(f"{ff}.residual", flf + ("residual",))
            i += 1
        channel_norm(f"{mha}.transformer.norm.fn", (mha, "global_norm"))

    _set(tree["params"], ("fc", "kernel"), linear_kernel(sd["fc.weight"]))
    _set(tree["params"], ("fc", "bias"), sd["fc.bias"])
    return tree
