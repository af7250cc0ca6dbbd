"""Discriminative learning test: the model must separate genuinely
temporal motion patterns (still / oscillating / rotating skeletons),
not just static offsets — a miniature accuracy-regression oracle in the
spirit of the reference's end-to-end ledger (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models.aagcn import AAGCN
from agcn_tpu.train import TrainState, losses, make_train_step, optim


def motion_dataset(n_per_class=8, t=24, v=25, m=2, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    # the skeleton shape is shared across train/holdout (like a dataset's
    # subjects); only noise and motion phases vary with the seed
    base = np.random.default_rng(42).standard_normal((v, 3)) * 0.3
    for label in range(3):
        for _ in range(n_per_class):
            pose = base + rng.standard_normal((v, 3)) * 0.02
            frames = np.zeros((t, v, 3), np.float32)
            phase = rng.uniform(0, np.pi)
            for ti in range(t):
                if label == 0:          # still
                    frames[ti] = pose
                elif label == 1:        # oscillate along x
                    frames[ti] = pose + np.array(
                        [0.3 * np.sin(0.8 * ti + phase), 0, 0])
                else:                   # rotate about z
                    a = 0.15 * ti
                    rot = np.array([[np.cos(a), -np.sin(a), 0],
                                    [np.sin(a), np.cos(a), 0],
                                    [0, 0, 1]])
                    frames[ti] = pose @ rot.T
            sample = np.zeros((3, t, v, m), np.float32)
            sample[:, :, :, 0] = frames.transpose(2, 0, 1)
            xs.append(sample)
            ys.append(label)
    order = rng.permutation(len(ys))
    return (np.stack(xs)[order].astype(np.float32),
            np.asarray(ys)[order].astype(np.int64))


def test_model_learns_motion_classes():
    x, y = motion_dataset()
    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=3, adj=adj, model_layers=3, attention=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]),
                           train=False)
    tx = optim.sgd_nesterov(
        optim.warmup_step_schedule(0.05, 1, [100]), weight_decay=1e-4)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy))
    rng = jax.random.PRNGKey(0)
    xb, yb = jnp.asarray(x), jnp.asarray(y)
    for _ in range(30):
        state, metrics = step(state, xb, yb, rng)
    final_acc = float(metrics["acc"])
    assert final_acc >= 0.9, f"train acc {final_acc}"

    # refresh BN running statistics at the converged parameters (30 fast
    # steps leave them lagging; real recipes burn them in over epochs)
    refresh = {"params": state.params, "batch_stats": state.batch_stats}
    for _ in range(15):
        _, mut = model.apply(refresh, xb, train=True,
                             mutable=["batch_stats"])
        refresh = {"params": state.params,
                   "batch_stats": mut["batch_stats"]}
    state = state.replace(batch_stats=refresh["batch_stats"])

    # held-out set from a different seed must also beat chance by a wide
    # margin (patterns, not memorized offsets)
    x2, y2 = motion_dataset(seed=7)
    logits, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x2), train=False)
    test_acc = float((jnp.argmax(logits, -1) == jnp.asarray(y2)).mean())
    # 2x chance on unseen phases/noise: the model transfers the temporal
    # patterns, not memorized frames
    assert test_acc >= 0.6, f"holdout acc {test_acc}"
