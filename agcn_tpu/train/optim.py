"""Optimizers and LR schedules.

Parity targets: reference utils/processor.py:349-473 (SGD+nesterov 0.9
momentum, Adam/AdamW, warmup + step decay, cyclic/onecycle schedulers) and
the SAM two-pass optimizer (processor.py:673-687, davda54/sam semantics),
re-expressed as optax transforms so the whole update is one jitted step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_step_schedule(base_lr: float, steps_per_epoch: int,
                         decay_epochs: Sequence[int],
                         warm_up_epoch: int = 0,
                         gamma: float = 0.1) -> optax.Schedule:
    """Per-epoch warmup + multiplicative step decay.

    lr(e) = base * (e+1)/warmup           e < warmup
          = base * gamma^(#decay_epochs <= e)   otherwise
    (reference utils/processor.py:349-371, applied per epoch)
    """
    decay = jnp.asarray(sorted(decay_epochs), jnp.int32) \
        if len(decay_epochs) else jnp.zeros((0,), jnp.int32)

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        warm = base_lr * (epoch + 1) / max(warm_up_epoch, 1)
        n_decays = jnp.sum(epoch >= decay) if decay.size else 0
        stepped = base_lr * (gamma ** n_decays)
        return jnp.where(epoch < warm_up_epoch, warm, stepped)

    return schedule


def onecycle_schedule(base_lr: float, steps_per_epoch: int, num_epoch: int,
                      warm_up_epoch: int = 0,
                      initial_lr: Optional[float] = None,
                      final_lr: Optional[float] = None,
                      anneal_strategy: str = "cos") -> optax.Schedule:
    """OneCycle (reference utils/processor.py:458-470)."""
    total = steps_per_epoch * num_epoch
    pct_start = warm_up_epoch / max(num_epoch, 1)
    div = base_lr / (initial_lr if initial_lr else base_lr / 25)
    final_div = base_lr / (final_lr if final_lr else base_lr / 1e4)
    return optax.cosine_onecycle_schedule(
        transition_steps=total, peak_value=base_lr,
        pct_start=max(pct_start, 1e-3), div_factor=div,
        final_div_factor=final_div / div)


def cyclic_schedule(base_lr: float, steps_per_epoch: int,
                    mode: str = "triangular") -> optax.Schedule:
    """CyclicLR triangular/triangular2 (reference processor.py:434-457)."""
    up = max(steps_per_epoch // 2, 1)
    down = max(steps_per_epoch - up, 1)
    lo, hi = base_lr * 1e-2, base_lr

    def schedule(count):
        cycle_len = up + down
        cycle = count // cycle_len
        pos = count % cycle_len
        frac = jnp.where(pos < up, pos / up, 1.0 - (pos - up) / down)
        amp = hi - lo
        if mode == "triangular2":
            amp = amp * (0.5 ** cycle)
        return lo + amp * frac

    return schedule


def sgd_nesterov(learning_rate, weight_decay: float = 1e-4,
                 momentum: float = 0.9, nesterov: bool = True,
                 grad_clip: Optional[float] = 1.0):
    """SGD + nesterov momentum + L2 weight decay + grad-norm clip 1.0
    (reference processor.py:397-403 and :698)."""
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate, momentum=momentum,
                           nesterov=nesterov))
    return optax.chain(*parts)


def adam(learning_rate, weight_decay: float = 0.0,
         grad_clip: Optional[float] = 1.0):
    """torch.optim.Adam semantics: weight_decay is L2 added to grads
    (reference processor.py:405-408)."""
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam())
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def adamw(learning_rate, weight_decay: float = 0.0, eps: float = 1e-8,
          grad_clip: Optional[float] = 1.0):
    """AdamW: decoupled weight decay (reference processor.py:410-414)."""
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(learning_rate, eps=eps,
                             weight_decay=weight_decay))
    return optax.chain(*parts)


def build_optimizer(name: str, learning_rate, weight_decay: float = 1e-4,
                    nesterov: bool = True, eps: float = 1e-8,
                    grad_clip: Optional[float] = 1.0):
    """Optimizer factory mirroring reference load_optimizer
    (processor.py:395-430). SAM variants are handled in the train step
    (see sam_rho/make_train_step), not as an optax wrapper."""
    name = name.lower().replace("_sgd", "").replace("sam", "sgd") \
        if name.lower().startswith("sam") else name.lower()
    if name in ("sgd", "sgd-llrd"):
        return sgd_nesterov(learning_rate, weight_decay, nesterov=nesterov,
                            grad_clip=grad_clip)
    if name == "adam":
        return adam(learning_rate, weight_decay, grad_clip=grad_clip)
    if name in ("adamw", "adamw-llrd"):
        return adamw(learning_rate, weight_decay, eps=eps,
                     grad_clip=grad_clip)
    raise ValueError(f"Unknown optimizer {name!r}")


def llrd_scale_tree(params, factor: float):
    """Per-leaf LR multipliers for layer-wise LR decay.

    Reference semantics (utils/processor.py:373-393): parameters under
    transformer layers are grouped by layer index; the deepest layer keeps
    the base LR and each shallower layer is scaled by `factor` once more;
    all other parameters keep the base LR.
    """
    import re

    flat = jax.tree_util.tree_flatten_with_path(params)
    ids = set()
    paths = []
    for path, _ in flat[0]:
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        m = re.search(r"layer(\d+)", names)
        paths.append((names, int(m.group(1)) if m else None))
        if m:
            ids.add(int(m.group(1)))
    order = sorted(ids, reverse=True)  # deepest first
    rank = {i: r for r, i in enumerate(order)}
    mults = [1.0 if lid is None else factor ** rank[lid]
             for _, lid in paths]
    return jax.tree_util.tree_unflatten(
        flat[1], [jnp.asarray(m, jnp.float32) for m in mults])


def with_llrd(tx: optax.GradientTransformation, params, factor: float
              ) -> optax.GradientTransformation:
    """Wrap an optimizer with per-leaf LLRD update scaling."""
    scales = llrd_scale_tree(params, factor)

    def init(params_):
        return tx.init(params_)

    def update(updates, state, params_=None):
        updates, state = tx.update(updates, state, params_)
        updates = jax.tree_util.tree_map(lambda u, s: u * s, updates,
                                         scales)
        return updates, state

    return optax.GradientTransformation(init, update)


def sam_perturbation(grads, params, rho: float = 0.05):
    """First SAM step: eps = rho * g / ||g|| (davda54/sam, used by the
    reference via processor.py:673-687). Returns perturbed params."""
    gnorm = optax.global_norm(grads)
    scale = rho / (gnorm + 1e-12)
    return jax.tree_util.tree_map(lambda p, g: p + g * scale, params, grads)
