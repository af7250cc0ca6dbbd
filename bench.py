#!/usr/bin/env python
"""Benchmark: AGCN training throughput (sequences/sec/chip).

Measures the jitted train step of the flagship 10-block AGCN at the
reference production shape (NTU-60: C=3, T=300, V=25, M=2, batch 64) on
the default JAX platform (the TPU chip under the driver).

vs_baseline: ratio against the PyTorch reference implementation
(/root/reference model/architecture/aagcn/agcn.py) running the equivalent
train step on this host's CPU at batch 8 (BASELINE.json config #1 — the
only reference configuration measurable in this environment; the A100
baseline is not available here). The torch number is cached in
.bench_cache.json after the first run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache.json")

BATCH, C, T, V, M, NUM_CLASS = 64, 3, 300, 25, 2, 60


def bench_ours(steps: int = 20) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.train import TrainState, losses, make_train_step, optim

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, T, V, M)),
                    dtype=jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30, 40]))
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)

    # warmup / compile; the scalar host fetch (not block_until_ready,
    # which can report dispatch time on this backend — PERF.md) forces
    # real completion of the state-chained step sequence
    state, m = step(state, x, y, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def bench_aagcn(steps: int = 15) -> float:
    """AAGCN 10-layer (adaptive + STC attention) train step, bf16."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AAGCN
    from agcn_tpu.train import TrainState, losses, make_train_step, optim

    adj = build_adjacency("ntu_rgb_d")
    model = AAGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, T, V, M)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [30, 40]))
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    state, m = step(state, x, y, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, key)
    _ = float(m["loss"])
    return BATCH * steps / (time.perf_counter() - t0)


def bench_sgn(steps: int = 30) -> float:
    """SGN (v14 defaults, seg=20) train step with Adam, batch 64."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from agcn_tpu.models import SGN
    from agcn_tpu.train import TrainState, losses, make_train_step

    model = SGN(num_class=NUM_CLASS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 20, 75)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    state, m = step(state, x, y, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, key)
    _ = float(m["loss"])
    return BATCH * steps / (time.perf_counter() - t0)


def bench_torch_baseline(steps: int = 2) -> float:
    """Reference PyTorch AGCN train step on CPU, batch 8 (cached)."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["torch_cpu_seq_per_sec"]
    try:
        from agcn_tpu.utils.reference_stubs import install

        install()
        import torch
        from model.architecture.aagcn.agcn import Model as TorchAGCN

        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.manual_seed(0)
        model = TorchAGCN(num_class=NUM_CLASS, num_point=V, num_person=M,
                          graph="graph.ntu_rgb_d.Graph",
                          graph_args={"labeling_mode": "spatial"}).train()
        opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9,
                              nesterov=True, weight_decay=1e-4)
        lossf = torch.nn.CrossEntropyLoss()
        b = 8
        x = torch.randn(b, C, T, V, M)
        y = torch.randint(0, NUM_CLASS, (b,))

        def one_step():
            opt.zero_grad()
            loss = lossf(model(x), y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()

        one_step()  # warmup
        t0 = time.perf_counter()
        for _ in range(steps):
            one_step()
        dt = time.perf_counter() - t0
        rate = b * steps / dt
        with open(CACHE, "w") as f:
            json.dump({"torch_cpu_seq_per_sec": rate}, f)
        return rate
    except Exception as e:
        print(f"# torch baseline unavailable: {e}", file=sys.stderr)
        return 0.0


def _ensure_platform() -> str:
    """The axon TPU backend blocks INDEFINITELY at init when the tunnel
    is down (observed: backend init UNAVAILABLE after a 30-min hang).
    Probe it in a subprocess with a timeout so an outage degrades to a
    CPU-labelled measurement instead of a bench that never returns."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print(jax.default_backend())"],
            timeout=300, capture_output=True, text=True)
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    print("# TPU backend unavailable; falling back to CPU",
          file=sys.stderr)
    import jax
    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def main():
    platform = _ensure_platform()
    fallback = platform == "cpu-fallback"
    # fallback numbers are diagnostic only — keep the run short so the
    # driver's own timeout can't kill it before the JSON line appears
    ours = bench_ours(steps=3 if fallback else 20)
    base = bench_torch_baseline()
    vs = ours / base if base > 0 else 0.0
    # secondary family metrics so per-family regressions are visible in
    # BENCH_r*.json (PERF.md tracks all four)
    extras = {}
    for name, fn, quick in (("aagcn_seq_per_sec", bench_aagcn, 3),
                            ("sgn_seq_per_sec", bench_sgn, 10)):
        try:
            extras[name] = round(fn(steps=quick) if fallback else fn(), 2)
        except Exception as e:  # a family bench must not sink the headline
            print(f"# {name} failed: {e}", file=sys.stderr)
    # semantic edge-message rate, derived from the AGCN step rate:
    # 73 directed edges (incl. self loops) x 4200 frame-aggregations/seq
    # (sum of per-block strided frame counts x 2 persons;
    # tools/bench_edges.py)
    extras["agcn_medges_per_sec"] = round(ours * 73 * 4200 / 1e6, 2)
    print(json.dumps({
        "metric": "agcn_train_seq_per_sec_per_chip",
        "value": round(ours, 2),
        "unit": "seq/s",
        "vs_baseline": round(vs, 2),
        "vs_baseline_kind": "vs_torch_cpu",
        "platform": platform,
        **extras,
    }))


if __name__ == "__main__":
    main()
