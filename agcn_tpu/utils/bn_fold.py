"""Inference-time BatchNorm folding (exact at eval).

At eval our BatchNorm is a constant per-channel affine y = x*a + b with
a = scale*rsqrt(var+eps), b = bias - mean*a (ops/norm.py). For every
conv -> BN pair that affine can be absorbed into the conv's kernel/bias,
after which the BN is neutralized to the exact identity (scale=1,
bias=0, mean=0, var=1-eps => a=1, b=0) — XLA's algebraic simplifier
then erases the op from the compiled eval program entirely.

This is an eval-only lever the train-path ceiling study can't use
(VERDICT r4 next #4); training must keep live batch statistics.
Reference eval path: utils/processor.py:784-914 (torch never folds).

Covers the AGCN family layout (models/agcn.py) and the AAGCN layout
(models/aagcn.py): every block's aggregation BN, down BN, TCN BN and
residual BN. data_bn is left live — it precedes the first conv and
feeds the attention/residual paths, so it has no single adjacent conv
to absorb it. (GhostBN units fold identically: at eval GBN applies the
same running-stats affine as plain BN.)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np

_EPS = 1e-5


def _affine(bn_params: Mapping[str, Any],
            bn_stats: Mapping[str, Any]):
    a = np.asarray(bn_params["scale"], np.float32) / np.sqrt(
        np.asarray(bn_stats["var"], np.float32) + _EPS)
    b = np.asarray(bn_params["bias"], np.float32) - np.asarray(
        bn_stats["mean"], np.float32) * a
    return a, b


def _bcast(a: np.ndarray, ndim: int) -> np.ndarray:
    """Align a (..., C) per-channel vector to a (..., *, C) kernel:
    scanned-block checkpoints carry a leading stacked axis on BOTH, so
    insert the broadcast 1s BETWEEN the scan axes and the channel
    axis."""
    a = np.asarray(a)
    return a.reshape(a.shape[:-1] + (1,) * (ndim - a.ndim) + a.shape[-1:])


def _neutralize(bn_params: Dict[str, Any], bn_stats: Dict[str, Any]):
    shape = np.shape(bn_params["scale"])
    bn_params["scale"] = np.ones(shape, np.float32)
    bn_params["bias"] = np.zeros(shape, np.float32)
    bn_stats["mean"] = np.zeros(shape, np.float32)
    # var such that rsqrt(var + eps) == 1 exactly
    bn_stats["var"] = np.full(shape, 1.0 - _EPS, np.float32)


def _fold_conv(conv: Dict[str, Any], a: np.ndarray, b: np.ndarray):
    """conv kernel (..., out) and bias (..., out) absorb
    y = conv(x)*a + b."""
    kern = np.asarray(conv["kernel"], np.float32)
    conv["kernel"] = kern * _bcast(a, kern.ndim)
    bias = np.asarray(conv.get("bias", np.zeros_like(b)), np.float32)
    conv["bias"] = bias * a + b


def fold_agcn_bn_eval(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Return new AGCN variables with every block's BNs folded into the
    adjacent convs (exact at eval; do NOT train from the result)."""
    variables = jax.tree_util.tree_map(
        lambda x: np.array(x, np.float32), dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    for block in [k for k in params if k.startswith("l")]:
        bp, bs = params[block], stats[block]
        if "block" in bp:  # scan_blocks group (e.g. 'l2_4'): the per-
            bp, bs = bp["block"], bs["block"]  # block params carry a
            # leading stacked axis; _bcast handles the broadcast
        g, gs = bp["gcn1"], bs["gcn1"]
        a, b = _affine(g["bn"], gs["bn"])
        ks = sorted(k for k in g if k.startswith("conv_d")
                    and k.endswith("_kernel"))
        for i, kk in enumerate(ks):
            bias_name = kk.replace("_kernel", "_bias")
            kern = np.asarray(g[kk], np.float32)
            g[kk] = kern * _bcast(a, kern.ndim)
            g[bias_name] = np.asarray(g[bias_name], np.float32) * a
            if i == 0:  # the BN shift lands once in the summed bias
                g[bias_name] = g[bias_name] + b
        _neutralize(g["bn"], gs["bn"])
        if "down_conv" in g:
            a, b = _affine(g["down_bn"], gs["down_bn"])
            _fold_conv(g["down_conv"]["conv"], a, b)
            _neutralize(g["down_bn"], gs["down_bn"])
        a, b = _affine(bp["tcn1"]["bn"], bs["tcn1"]["bn"])
        _fold_conv(bp["tcn1"]["conv"]["conv"], a, b)
        _neutralize(bp["tcn1"]["bn"], bs["tcn1"]["bn"])
        if "residual" in bp:
            a, b = _affine(bp["residual"]["bn"], bs["residual"]["bn"])
            _fold_conv(bp["residual"]["conv"]["conv"], a, b)
            _neutralize(bp["residual"]["bn"], bs["residual"]["bn"])

    return {"params": params, "batch_stats": stats}


def fold_aagcn_bn_eval(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Return new AAGCN variables with every unit's BNs folded into the
    adjacent convs (exact at eval; do NOT train from the result). The
    conv_d projections live one level deeper than AGCN's (under the
    'agcn' sub-module); STC attention applies after the BN+ReLU and is
    untouched."""
    variables = jax.tree_util.tree_map(
        lambda x: np.array(x, np.float32), dict(variables))
    params, stats = variables["params"], variables["batch_stats"]

    for block in [k for k in params if k.startswith("l")]:
        bp, bs = params[block], stats[block]
        g, gs = bp["gcn1"], bs["gcn1"]
        a, b = _affine(g["bn"], gs["bn"])
        ag = g["agcn"]
        ks = sorted(k for k in ag if k.startswith("conv_d")
                    and k.endswith("_kernel"))
        for i, kk in enumerate(ks):
            bias_name = kk.replace("_kernel", "_bias")
            kern = np.asarray(ag[kk], np.float32)
            ag[kk] = kern * _bcast(a, kern.ndim)
            ag[bias_name] = np.asarray(ag[bias_name], np.float32) * a
            if i == 0:  # the BN shift lands once in the summed bias
                ag[bias_name] = ag[bias_name] + b
        _neutralize(g["bn"], gs["bn"])
        if "down_conv" in g:
            a, b = _affine(g["down_bn"], gs["down_bn"])
            _fold_conv(g["down_conv"]["conv"], a, b)
            _neutralize(g["down_bn"], gs["down_bn"])
        a, b = _affine(bp["tcn1"]["bn"], bs["tcn1"]["bn"])
        _fold_conv(bp["tcn1"]["conv"]["conv"], a, b)
        _neutralize(bp["tcn1"]["bn"], bs["tcn1"]["bn"])
        if "residual" in bp:
            a, b = _affine(bp["residual"]["bn"], bs["residual"]["bn"])
            _fold_conv(bp["residual"]["conv"]["conv"], a, b)
            _neutralize(bp["residual"]["bn"], bs["residual"]["bn"])

    return {"params": params, "batch_stats": stats}
