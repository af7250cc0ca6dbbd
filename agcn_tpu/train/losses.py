"""Loss functions. Parity targets: reference utils/loss.py
(LabelSmoothingLoss :25-39, CategorialFocalLoss :45-86,
MaximumMeanDiscrepancyLoss :90-106, CosineLoss :7-21).

All losses are pure jittable functions over logits/labels. The MMD loss
replaces the reference's boolean-mask class filtering with a weighted
formulation so shapes stay static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Standard mean CE over int labels (reference uses nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def label_smoothing_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                         smoothing: float = 0.1) -> jnp.ndarray:
    """SGN-style label smoothing (reference utils/loss.py:25-39).

    Off-target mass is smoothing/(C-1); target confidence is 1-smoothing
    (note: NOT the torch F.cross_entropy(label_smoothing=...) convention).
    """
    num_class = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    off = smoothing / (num_class - 1)
    true_dist = jnp.full_like(logp, off)
    true_dist = true_dist.at[
        jnp.arange(labels.shape[0]), labels].set(1.0 - smoothing)
    return jnp.mean(jnp.sum(-true_dist * logp, axis=-1))


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               smoothing: float = 0.0,
               alpha: Optional[jnp.ndarray] = None,
               gamma: float = 2.0) -> jnp.ndarray:
    """Categorical focal loss with smoothing + per-class alpha weights
    (reference utils/loss.py:45-86)."""
    num_class = logits.shape[-1]
    eps = smoothing / num_class
    confidence = 1.0 - smoothing + eps
    logp = jax.nn.log_softmax(logits, axis=-1)
    true_dist = jnp.full_like(logp, eps)
    true_dist = true_dist.at[
        jnp.arange(labels.shape[0]), labels].set(confidence)
    ce = jnp.sum(-true_dist * logp, axis=-1)
    if alpha is not None:
        ce = ce * jnp.asarray(alpha)[labels]
    probs = jax.nn.softmax(logits, axis=-1)
    pt = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    return jnp.mean((1.0 - pt) ** gamma * ce)


def mmd_loss(z: jnp.ndarray, z_prior: jnp.ndarray, labels: jnp.ndarray,
             num_class: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InfoGCN MMD loss (reference utils/loss.py:90-106 / InfoGCN 3.4).

    Returns (mmd, l2_z_mean): MSE between per-class latent means and the
    class priors (only over classes present in the batch), plus the L2
    norm of the batch-mean latent. Implemented with one-hot weighted
    means for static shapes.
    """
    onehot = jax.nn.one_hot(labels, num_class, dtype=z.dtype)  # (B, K)
    counts = onehot.sum(axis=0)  # (K,)
    class_sums = onehot.T @ z  # (K, D)
    class_means = class_sums / jnp.maximum(counts[:, None], 1.0)
    present = (counts > 0).astype(z.dtype)
    sq = jnp.sum((class_means - z_prior) ** 2, axis=-1)  # (K,)
    denom = jnp.maximum(present.sum() * z.shape[-1], 1.0)
    mmd = jnp.sum(sq * present) / denom
    l2_z_mean = jnp.linalg.norm(z.mean(axis=0), ord=2)
    return mmd, l2_z_mean


def cosine_loss(x1: jnp.ndarray, x2: jnp.ndarray, mode: int = 1,
                eps: float = 1e-8) -> jnp.ndarray:
    """Feature-similarity loss 1 - mean(cos) (reference utils/loss.py:7-21).

    mode 1: cosine over feature axis 1; mode 2: cosine of the L2-norm
    vectors along axis 1.
    """
    if mode == 2:
        x1 = jnp.linalg.norm(x1, ord=2, axis=1)
        x2 = jnp.linalg.norm(x2, ord=2, axis=1)
        axis = -1
    else:
        axis = 1
    num = jnp.sum(x1 * x2, axis=axis)
    den = jnp.maximum(
        jnp.linalg.norm(x1, axis=axis) * jnp.linalg.norm(x2, axis=axis), eps)
    return 1.0 - jnp.mean(num / den)


def fsim_pair_loss(branch_outputs, alphas, kernels: int, mode: int = 1):
    """Cosine feature-similarity loss with the reference's pairing
    (utils/processor.py:583-599): each level-i kernel-j temporal branch
    output is pulled toward the FINAL level's same-kernel-j output,
    weighted by fsim_alpha[i*kernels + j].

    Args:
      branch_outputs: the model's x_tem_list equivalents, (B, C, T)
        layout (None entries dropped).
      alphas: per-pair weights (reference indexes the flat pair index
        directly; extra pairs reuse the last alpha).
      kernels: len(multi_t[-1]) — branches per level.
      mode: CosineLoss mode (1 channel cosine, 2 norm-vector cosine).
    """
    outs = [o for o in branch_outputs if o is not None]
    kernels = max(int(kernels), 1)
    levels = len(outs) // kernels - 1
    alphas = list(alphas) or [1.0]
    total = 0.0
    for i in range(levels):
        for j in range(kernels):
            idx = i * kernels + j
            a = alphas[idx] if idx < len(alphas) else alphas[-1]
            total = total + a * cosine_loss(outs[idx], outs[-kernels + j],
                                            mode=mode)
    return total


def build_loss(name: str, num_class: int, smoothing: float = 0.0,
               alpha=None, gamma: float = 2.0):
    """Loss factory mirroring the reference's get_loss
    (utils/processor.py:298-327)."""
    if name in ("ce", "crossentropy"):
        if smoothing > 0.0:
            return lambda lg, lb: label_smoothing_loss(lg, lb, smoothing)
        return cross_entropy
    if name == "focal":
        a = None if alpha is None or len(alpha) == 0 else jnp.asarray(alpha)
        return lambda lg, lb: focal_loss(lg, lb, smoothing, a, gamma)
    raise ValueError(f"unknown loss {name!r}")
