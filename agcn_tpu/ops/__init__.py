from agcn_tpu.ops.conv import PointwiseConv, TemporalConv
from agcn_tpu.ops.gcn import (
    aggregate,
    apply_fused_static,
    embedding_attention,
    frame_aggregate,
    frame_attention,
    fused_static_operator,
)
from agcn_tpu.ops.norm import BatchNorm, LayerNorm

__all__ = [
    "PointwiseConv", "TemporalConv", "aggregate", "apply_fused_static",
    "embedding_attention", "frame_aggregate", "frame_attention",
    "fused_static_operator", "BatchNorm", "LayerNorm",
]
