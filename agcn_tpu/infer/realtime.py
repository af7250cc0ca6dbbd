"""Real-time action recognition.

Parity target: reference infer/inference.py (ActionRecognition :47-113,
class-subset logit filtering :24-44, multi-crop averaging :103-106): a
streaming wrapper that appends per-frame skeletons, prepares model input,
runs the jitted forward, and emits (label, confidence).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agcn_tpu.data.sgn_collate import SegmentSampler
from agcn_tpu.infer.preprocess import InferencePreprocessor


def filter_logits(logits: np.ndarray,
                  allowed: Optional[Sequence[int]]) -> np.ndarray:
    """Mask logits outside an allowed class subset
    (reference inference.py:24-44)."""
    if not allowed:
        return logits
    mask = np.full(logits.shape[-1], -np.inf, dtype=logits.dtype)
    mask[list(allowed)] = 0.0
    return logits + mask


class ActionRecognition:
    """Streaming recognizer over a jitted model forward."""

    def __init__(self,
                 model,
                 variables,
                 kind: str = "dense",           # 'dense' | 'sgn'
                 num_joint: int = 25,
                 max_seq_length: int = 300,
                 max_person: int = 4,
                 moving_avg: int = 1,
                 num_skels: int = 2,
                 normalize: bool = True,
                 multi_test: int = 1,
                 allowed_classes: Optional[Sequence[int]] = None,
                 sgn_dataloader_args: Optional[Dict] = None,
                 expose_attention: bool = False):
        self.kind = kind
        self.num_skels = num_skels
        self.normalize = normalize
        self.multi_test = multi_test
        self.allowed_classes = allowed_classes
        sampler = None
        if kind == "sgn":
            # the recipe's test_dataloader_args carry multi_test too —
            # the explicit parameter wins (both at once would crash)
            extra = {k: v for k, v in (sgn_dataloader_args or {}).items()
                     if k != "multi_test"}
            sampler = SegmentSampler(multi_test=multi_test, **extra)
        self.preproc = InferencePreprocessor(
            num_joint=num_joint, max_seq_length=max_seq_length,
            max_person=max_person, moving_avg=moving_avg,
            sgn_sampler=sampler)
        self.variables = variables
        self.expose_attention = expose_attention
        if expose_attention:
            # collect the per-block combined adjacencies sown as
            # 'intermediates' (UnitGCN/AdaptiveGCN 'g')
            self._forward = jax.jit(
                lambda v, x: model.apply(v, x, train=False,
                                         mutable=["intermediates"]))
        else:
            self._forward = jax.jit(
                lambda v, x: model.apply(v, x, train=False))
        self.rng = np.random.default_rng(0)
        self.last_latency_ms = 0.0
        self.last_attention = None  # G matrices from the last predict

    def append_frame(self, frame: np.ndarray):
        """frame: (M, 1, V, C) joints for the current timestep."""
        self.preproc.append(frame)

    def predict(self) -> Tuple[int, np.ndarray]:
        """Run the model on the current buffer -> (label, probabilities)."""
        t0 = time.perf_counter()
        if self.kind == "sgn":
            x = self.preproc.sgn_input(self.num_skels,
                                       normalize=self.normalize,
                                       multi_crop=self.multi_test > 1,
                                       rng=self.rng)
        else:
            x = self.preproc.dense_input(self.num_skels,
                                         normalize=self.normalize)
        out = self._forward(self.variables, jnp.asarray(x))
        if self.expose_attention:
            out, inter = out
            gs = [np.asarray(leaf[0] if isinstance(leaf, tuple) else leaf)
                  for leaf in jax.tree_util.tree_leaves(
                      inter.get("intermediates", {}))]
            if gs:
                # (B, K, V, V) per block -> first sample; scanned block
                # groups (scan_blocks=True) carry a leading stacked axis
                # (n, B, K, V, V) that we split back into per-block maps
                flat = []
                for g in gs:
                    if g.ndim == 5:
                        flat.extend(gi[0] for gi in g)
                    else:
                        flat.append(g[0] if g.ndim == 4 else g)
                self.last_attention = flat
        if isinstance(out, tuple):
            logits = np.asarray(out[0])
            aux = out[1]
            # expose the spatial attention (G) for live visualization
            # (reference infer/inference_220802.py:518-560)
            if isinstance(aux, dict) and aux.get("g"):
                self.last_attention = [np.asarray(g[0])
                                       for g in aux["g"]]
        else:
            logits = np.asarray(out)
        if self.multi_test > 1:
            logits = logits.reshape(-1, self.multi_test,
                                    logits.shape[-1]).mean(axis=1)
        logits = filter_logits(logits[0], self.allowed_classes)
        probs = np.exp(logits - logits.max())
        probs = probs / probs.sum()
        self.last_latency_ms = (time.perf_counter() - t0) * 1e3
        return int(probs.argmax()), probs
