"""Jitted train/eval steps and the train state.

Replaces the reference's Processor hot loop (utils/processor.py:604-778):
forward, loss, backward, clip, optimizer step, and metrics are ONE jitted
XLA program. Data parallelism is expressed with `jax.sharding` — the batch
axis is sharded over the mesh's 'data' axis and parameters are replicated;
XLA inserts the gradient all-reduce (the NCCL-DDP equivalent) and global
batch-norm statistics fall out of the sharded reductions automatically
(SyncBN semantics without explicit collectives).

SAM (processor.py:673-687) is folded into the same step as two grad
computations with a parameter perturbation in between.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agcn_tpu.train.optim import sam_perturbation


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   apply_fn=apply_fn, tx=tx)


def _forward(apply_fn, params, batch_stats, x, train, rng):
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng} if rng is not None else None
    if train:
        out, mutated = apply_fn(variables, x, train=True,
                                mutable=["batch_stats"], rngs=rngs)
        stats = mutated["batch_stats"]
    else:
        out = apply_fn(variables, x, train=False)
        stats = batch_stats
    if isinstance(out, tuple):
        logits, aux = out[0], out[1]
    else:
        logits, aux = out, None
    return logits, aux, stats


def make_train_step(loss_fn: Callable,
                    sam_rho: float = 0.0,
                    aux_loss_fn: Optional[Callable] = None,
                    grad_transform: Optional[Callable] = None):
    """Build a jittable train step.

    Args:
      loss_fn: (logits, labels) -> scalar.
      sam_rho: if > 0, SAM two-pass sharpness-aware update.
      aux_loss_fn: optional (aux, labels) -> (scalar, metrics dict) for
        auxiliary losses (MMD etc.).
      grad_transform: optional grads -> grads hook applied before the
        optimizer (used for the PA-freeze schedule,
        reference processor.py:612-616).
    """

    def compute_loss(params, state, x, y, rng):
        logits, aux, stats = _forward(state.apply_fn, params,
                                      state.batch_stats, x, True, rng)
        loss = loss_fn(logits, y)
        metrics = {}
        if aux_loss_fn is not None:
            extra, extra_metrics = aux_loss_fn(aux, y)
            loss = loss + extra
            metrics.update(extra_metrics)
        return loss, (logits, stats, metrics)

    def train_step(state: TrainState, x, y, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)
        (loss, (logits, stats, metrics)), grads = grad_fn(
            state.params, state, x, y, rng)
        if sam_rho > 0.0:
            # SAM second pass at the perturbed point; BN stats from the
            # first pass are kept (reference runs the first pass under
            # no_sync and BN-stat bypass, processor.py:673-687).
            perturbed = sam_perturbation(grads, state.params, sam_rho)
            (_, (_, _, _)), grads = grad_fn(perturbed, state, x, y, rng)
        if grad_transform is not None:
            grads = grad_transform(grads)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=stats, opt_state=opt_state)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        metrics = {"loss": loss, "acc": acc, **metrics}
        return new_state, metrics

    return train_step


def make_multi_train_step(loss_fn: Callable, steps_per_call: int,
                          **step_kwargs):
    """K optimizer steps in ONE jitted program via `lax.scan`.

    The reference (and our single-step path) dispatches one XLA program
    per optimizer step; on fast models (SGN: ~2 ms compute) the ~1.4 ms
    host-dispatch floor dominates. Scanning K steps amortizes dispatch
    to 1/K per step with EXACTLY sequential semantics: the train step
    derives its per-step RNG as fold_in(rng, state.step), so passing
    the same key to every scanned iteration reproduces the sequential
    loop bit for bit (same grads, same BN-stat updates, same optimizer
    chain).

    Returns step(state, xs, ys, rng) -> (state, stacked_metrics) where
    xs/ys carry a leading (steps_per_call,) axis and every metric in
    stacked_metrics has one too (per-step values, so logging cadence is
    preserved by the caller).
    """
    step = make_train_step(loss_fn, **step_kwargs)

    def multi_step(state: TrainState, xs, ys, rng):
        def body(st, batch):
            x, y = batch
            return step(st, x, y, rng)

        return jax.lax.scan(body, state, (xs, ys),
                            length=steps_per_call)

    return multi_step


def make_eval_step(loss_fn: Optional[Callable] = None,
                   multi_crop: int = 1,
                   aux_loss_fn: Optional[Callable] = None):
    """Build an eval step; multi_crop > 1 averages logits over crops that
    were flattened into the batch axis (reference processor.py:546-548).
    With aux_loss_fn, auxiliary (MMD/fsim) eval metrics are computed on
    the crop-AVERAGED latent z (reference processor.py:563-567)."""

    def eval_step(state: TrainState, x, y):
        logits, aux, _ = _forward(state.apply_fn, state.params,
                                  state.batch_stats, x, False, None)
        if multi_crop > 1:
            logits = logits.reshape(-1, multi_crop,
                                    logits.shape[-1]).mean(axis=1)
            if aux is not None and isinstance(aux, dict) and "z" in aux:
                z = aux["z"]
                aux = dict(aux, z=z.reshape(-1, multi_crop,
                                            z.shape[-1]).mean(axis=1))
        metrics = {}
        if loss_fn is not None and y is not None:
            metrics["loss"] = loss_fn(logits, y)
            metrics["acc"] = jnp.mean(
                (jnp.argmax(logits, -1) == y).astype(jnp.float32))
            if aux_loss_fn is not None:
                extra, extra_metrics = aux_loss_fn(aux, y)
                metrics["loss"] = metrics["loss"] + extra
                metrics.update(extra_metrics)
        return logits, metrics

    return eval_step
