"""steps_per_call: K optimizer steps per XLA dispatch via lax.scan.

The scanned multi-step must be EXACTLY the sequential loop: the train
step derives its per-step RNG as fold_in(rng, state.step), so the same
base key drives identical dropout masks, grads, BN-stat updates and
optimizer chains (steps.make_multi_train_step).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import yaml
from flax import linen as nn

from agcn_tpu.train import (TrainState, losses, make_multi_train_step,
                            make_train_step)


class TinyNet(nn.Module):
    """Dense -> BN -> dropout -> Dense: exercises batch_stats + rng."""
    classes: int = 5

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(16)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        return nn.Dense(self.classes)(x)


def _make_state():
    model = TinyNet()
    x0 = jnp.zeros((4, 8))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    tx = optax.sgd(0.1, momentum=0.9)
    return TrainState.create(model.apply, variables["params"],
                             variables["batch_stats"], tx)


def test_multi_step_equals_sequential():
    rng = np.random.default_rng(0)
    n, b = 6, 4
    xs = jnp.asarray(rng.standard_normal((n, b, 8)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 5, (n, b)))
    key = jax.random.PRNGKey(7)

    step = jax.jit(make_train_step(losses.cross_entropy))
    seq_state = _make_state()
    seq_losses = []
    for i in range(n):
        seq_state, m = step(seq_state, xs[i], ys[i], key)
        seq_losses.append(float(m["loss"]))

    multi = jax.jit(make_multi_train_step(losses.cross_entropy, n))
    scan_state, ms = multi(_make_state(), xs, ys, key)

    # per-step losses match the sequential trace
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses,
                               rtol=1e-6, atol=1e-6)
    assert int(scan_state.step) == n
    # final params, BN stats and optimizer state match
    for name, tree_a, tree_b in (
            ("params", seq_state.params, scan_state.params),
            ("stats", seq_state.batch_stats, scan_state.batch_stats),
            ("opt", seq_state.opt_state, scan_state.opt_state)):
        for (pa, a), (_, b_) in zip(
                jax.tree_util.tree_leaves_with_path(tree_a),
                jax.tree_util.tree_leaves_with_path(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"{name}:{pa}")


@pytest.mark.slow
def test_trainer_steps_per_call_end_to_end(tmp_path):
    """steps_per_call: 3 through the Trainer (8 batches/epoch -> two
    scanned groups + a 2-step remainder) reproduces the steps_per_call: 1
    run: same final eval top-1 and matching final train loss."""
    from agcn_tpu.train.trainer import Trainer
    from agcn_tpu.utils.config import load_config

    rng = np.random.default_rng(0)
    n, c, t, v, m, k = 32, 3, 16, 25, 2, 4
    data = rng.standard_normal((n, c, t, v, m)).astype(np.float32) * 0.1
    labels = list(np.arange(n) % k)
    for i, l in enumerate(labels):
        data[i, 0] += l * 0.5
    np.save(tmp_path / "data.npy", data)
    import pickle
    with open(tmp_path / "label.pkl", "wb") as f:
        pickle.dump(([f"s{i}" for i in range(n)], labels), f)

    def run(spc, tag):
        cfg = dict(
            work_dir=str(tmp_path / tag),
            model="agcn",
            model_args={"num_class": k, "graph": "ntu_rgb_d"},
            train_feeder_args={"data_path": str(tmp_path / "data.npy"),
                               "label_path": str(tmp_path / "label.pkl"),
                               "window_size": t},
            test_feeder_args={"data_path": str(tmp_path / "data.npy"),
                              "label_path": str(tmp_path / "label.pkl"),
                              "window_size": t},
            batch_size=4, test_batch_size=8, num_epoch=2,
            eval_interval=1, save_interval=5, base_lr=0.05,
            log_interval=1, device="cpu", mesh_data=1,
            steps_per_call=spc, seed=3)
        path = tmp_path / f"{tag}.yaml"
        path.write_text(yaml.safe_dump(cfg))
        Trainer(load_config(str(path))).start()
        log = (tmp_path / tag / "metrics.jsonl").read_text().splitlines()
        recs = [r for r in map(__import__("json").loads, log)]
        import re
        steps = [float(m.group(1)) for line in
                 (tmp_path / tag / "log.txt").read_text().splitlines()
                 if (m := re.search(r"step \d+/\d+ loss ([\d.]+)", line))]
        return recs, steps

    seq, seq_steps = run(1, "seq")
    scan, scan_steps = run(3, "scan")
    # per-step loss traces (log_interval=1 exercises the stacked-metrics
    # logging): step 1 runs identical params on an identical batch, so
    # it must agree tightly; later steps may drift at fp32 rounding scale
    # (the scanned body and the inline program fuse/reassociate
    # differently — semantic exactness is proven by the unit test above)
    assert len(scan_steps) == len(seq_steps) == 16  # 8 steps x 2 epochs
    np.testing.assert_allclose(scan_steps[0], seq_steps[0], rtol=1e-4)
    # first epoch: tracks within fp32 rounding drift (later steps of this
    # deliberately chaotic toy problem amplify the rounding differences —
    # observed identical to 5 digits at step 2, ~0.3% by step 8)
    np.testing.assert_allclose(scan_steps[:8], seq_steps[:8], rtol=1e-2,
                               err_msg="train loss trace diverged")
    # both runs learn and land on the same eval accuracy
    assert scan_steps[-1] < 1.0 and seq_steps[-1] < 1.0
    seq_eval = [r for r in seq if r["kind"] == "eval"]
    scan_eval = [r for r in scan if r["kind"] == "eval"]
    assert [r["top1"] for r in seq_eval] == [r["top1"] for r in scan_eval]
