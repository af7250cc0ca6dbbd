#!/usr/bin/env python
"""steps_per_call (scan-K) measurement table (VERDICT r4 next #6).

K optimizer steps per XLA dispatch amortize the ~1.4 ms host-dispatch
floor — a claimed win that round 4 could not demonstrate above jitter.
This measures a K x batch grid with long windows (several seconds each)
so the spread falls under a few percent and the effect (or its absence)
is above noise.

    python tools/bench_scan_k.py            # K in {1,8,32} x batch {64,256}
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._common import setup_backend

setup_backend()

import jax

import jax.numpy as jnp
import numpy as np
import optax

from agcn_tpu.models import SGN
from agcn_tpu.train import (TrainState, losses, make_multi_train_step,
                            make_train_step)

NUM_CLASS = 60


def measure(batch: int, k: int, window_steps: int = 800, repeats: int = 5):
    model = SGN(num_class=NUM_CLASS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 20, 75)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (batch,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], optax.adam(1e-3))
    key = jax.random.PRNGKey(0)
    if k > 1:
        multi = jax.jit(make_multi_train_step(losses.cross_entropy, k),
                        donate_argnums=0)
        xs = jnp.broadcast_to(x, (k,) + x.shape)
        ys = jnp.broadcast_to(y, (k,) + y.shape)
        step = lambda s: multi(s, xs, ys, key)
    else:
        single = jax.jit(make_train_step(losses.cross_entropy),
                         donate_argnums=0)
        step = lambda s: single(s, x, y, key)
    calls = max(1, window_steps // k)
    holder = {"state": state}

    def window():
        s = holder["state"]
        for _ in range(calls):
            s, m = step(s)
        _ = float(jnp.sum(m["loss"]))
        holder["state"] = s

    window()  # compile + warm
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        window()
        rates.append(batch * calls * k / (time.perf_counter() - t0))
    med = statistics.median(rates)
    spread = (max(rates) - min(rates)) / med * 100.0
    return med, spread


if __name__ == "__main__":
    base = {}
    for batch in (64, 256):
        for k in (1, 8, 32):
            med, spread = measure(batch, k)
            if k == 1:
                base[batch] = med
            gain = med / base[batch] - 1
            print(f"batch={batch:4d} K={k:3d}  {med:10.0f} seq/s "
                  f"±{spread:4.1f}%   vs K=1 {gain:+6.1%}", flush=True)
