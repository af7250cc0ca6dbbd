#!/usr/bin/env python
"""Benchmark: AGCN training throughput (sequences/sec/chip).

Measures the jitted train step of the flagship 10-block AGCN at the
reference production shape (NTU-60: C=3, T=300, V=25, M=2, batch 64) on
the default JAX platform (the TPU chip under the driver).

Every family metric is the MEDIAN of `repeats` timed windows (VERDICT r3
weak #2: single-window numbers through the tunneled chip are jitter-
dominated for fast steps); the spread (max-min)/median is reported so a
regression is distinguishable from noise. The headline also carries
step_ms and mfu_pct against the CALIBRATED 123.5 TFLOP/s bf16 GEMM peak
measured on this chip (PERF.md round 3) so the recorded ceiling claim is
auditable.

vs_baseline: ratio against the PyTorch reference implementation
(/root/reference model/architecture/aagcn/agcn.py) running the equivalent
train step on this host's CPU at batch 8 (BASELINE.json config #1 — the
only reference configuration measurable in this environment; the A100
baseline is not available here). The torch number is cached in
.bench_cache.json after the first run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache.json")

BATCH, C, T, V, M, NUM_CLASS = 64, 3, 300, 25, 2, 60

# calibrated bf16 GEMM peak on THIS tunneled chip (amortized 4096^3
# fori_loop chain, PERF.md round 3) — NOT nominal v5e peak (197)
CALIBRATED_PEAK_TFLOPS = 123.5


def _median_rate(run_window, n_seq_per_window, repeats, warmup=1):
    """Median seq/s over `repeats` timed windows. run_window() must end
    in a real host fetch (on this backend block_until_ready can return
    at dispatch time — PERF.md)."""
    for _ in range(warmup):
        run_window()
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_window()
        dt = time.perf_counter() - t0
        rates.append(n_seq_per_window / dt)
    med = statistics.median(rates)
    spread = (max(rates) - min(rates)) / med * 100.0
    return med, spread


def _common_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_ours(steps: int = 20, repeats: int = 5):
    """Headline: AGCN train step. Returns (median seq/s, spread %,
    step_ms, mfu_pct vs the calibrated chip peak)."""
    import jax

    _common_setup()
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

    # step FLOPs from the compiled program's own cost model where
    # available (fallback: fwd 2.24 TFLOP x3, PERF.md step anatomy)
    flops_per_step = 3 * 2.24e12
    try:
        cost = step.lower(state, x, y, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops", 0) > 0:
            flops_per_step = float(cost["flops"])
    except Exception:
        pass

    holder = {"state": state}

    def window():
        s = holder["state"]
        for _ in range(steps):
            s, m = step(s, x, y, key)
        _ = float(m["loss"])
        holder["state"] = s

    med, spread = _median_rate(window, BATCH * steps, repeats)
    step_ms = BATCH / med * 1e3
    mfu_pct = (flops_per_step * med / BATCH) / (
        CALIBRATED_PEAK_TFLOPS * 1e12) * 100.0
    return med, spread, step_ms, mfu_pct


def bench_aagcn(steps: int = 15, repeats: int = 5):
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
    holder = {"state": state}

    def window():
        s = holder["state"]
        for _ in range(steps):
            s, m = step(s, x, y, key)
        _ = float(m["loss"])
        holder["state"] = s

    return _median_rate(window, BATCH * steps, repeats)


def bench_kinetics(steps: int = 15, repeats: int = 5):
    """Kinetics-Skeleton AGCN train step (BASELINE config #5 shape:
    V=18 openpose graph, 400 classes, window T=150, reference
    config/kinetics-skeleton/train_joint.yaml) at batch 64, bf16 —
    tracks the V=18 padding geometry's single-chip perf
    (VERDICT r4 next #7)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN
    from agcn_tpu.train import TrainState, losses, make_train_step, optim

    adj = build_adjacency("kinetics")
    model = AGCN(num_class=400, adj=adj, num_point=18,
                 dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, C, 150, 18, M)),
                    jnp.float32)
    y = jnp.asarray(rng.integers(0, 400, (BATCH,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optim.sgd_nesterov(optim.warmup_step_schedule(0.1, 1, [45, 55]))
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(make_train_step(losses.cross_entropy), donate_argnums=0)
    key = jax.random.PRNGKey(0)
    holder = {"state": state}

    def window():
        s = holder["state"]
        for _ in range(steps):
            s, m = step(s, x, y, key)
        _ = float(m["loss"])
        holder["state"] = s

    return _median_rate(window, BATCH * steps, repeats)


def bench_sgn(steps: int = 800, repeats: int = 5,
              steps_per_call: int = 1):
    """SGN (v14 defaults, seg=20) train step with Adam, batch 64.

    steps=800 per window: at ~3.4 ms/step short windows are tunnel-
    jitter-dominated (the BENCH_r03 15k-vs-19k discrepancy, VERDICT r3
    weak #2; 200-step windows still spread 9-17% in round 5). ~2.7 s
    windows + median settle it — the round-5 scan-K grid at this window
    length measured spreads <=0.6% (tools/bench_scan_k.py, PERF.md).

    steps_per_call > 1 measures the product's scanned multi-step path
    (Trainer `steps_per_call`, steps.make_multi_train_step): K optimizer
    steps per dispatch amortize the ~1.4 ms host-dispatch floor that
    dominates this fast model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from agcn_tpu.models import SGN
    from agcn_tpu.train import (TrainState, losses, make_multi_train_step,
                                make_train_step)

    model = SGN(num_class=NUM_CLASS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 20, 75)), jnp.float32)
    y = jnp.asarray(rng.integers(0, NUM_CLASS, (BATCH,)))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    key = jax.random.PRNGKey(0)
    spc = max(1, steps_per_call)
    if spc > 1:
        multi = jax.jit(make_multi_train_step(losses.cross_entropy, spc),
                        donate_argnums=0)
        xs = jnp.broadcast_to(x, (spc,) + x.shape)
        ys = jnp.broadcast_to(y, (spc,) + y.shape)
        step = lambda s, x, y, k: multi(s, xs, ys, k)
    else:
        step = jax.jit(make_train_step(losses.cross_entropy),
                       donate_argnums=0)
    holder = {"state": state}
    calls = max(1, steps // spc)

    def window():
        s = holder["state"]
        for _ in range(calls):
            s, m = step(s, x, y, key)
        _ = float(jnp.sum(m["loss"]))
        holder["state"] = s

    return _median_rate(window, BATCH * calls * spc, repeats)


def bench_infer(steps: int = 10, repeats: int = 5, batch: int = 256):
    """Serving-path forward: AGCN eval (project-first formulation) at
    batch 256 — the single-chip inference figure the serving engine's
    batched multiplexing builds on (VERDICT r3 next #5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.models import AGCN

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, C, T, V, M)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    holder = {}

    def window():
        for _ in range(steps):
            out = fwd(variables, x)
        holder["sum"] = float(out.sum())

    return _median_rate(window, batch * steps, repeats)


def bench_serving(n_streams: int = 16, ticks: int = 120, repeats: int = 5,
                  pipeline: bool = True, normalize: bool = False):
    """Serving-engine tick rate: N live streams answered by ONE batched
    fixed-shape forward per tick (infer/serving.py), end-to-end with
    host-side ring-buffer preprocessing and one new frame per stream per
    tick (a live workload). pipeline=True uses the double-buffered
    predict_async path (host prep of tick t+1 overlaps device compute of
    tick t) — the product's recommended serving mode.
    Units: stream-predictions/s."""
    import jax
    import numpy as np

    from agcn_tpu.graph import build_adjacency
    from agcn_tpu.infer.serving import BatchedStreamServer
    from agcn_tpu.models import AGCN

    t_ring = 64
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj)
    x0 = np.zeros((1, 3, t_ring, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    server = BatchedStreamServer(model, variables, max_streams=n_streams,
                                 kind="dense", max_seq_length=t_ring,
                                 normalize=normalize)
    rng = np.random.default_rng(0)
    frame = rng.standard_normal(
        (n_streams, t_ring + 1, 1, 1, 25, 3)).astype(np.float32) * 0.2
    for s in range(n_streams):
        sid = server.add_stream()
        for t in range(t_ring):
            server.append_frame(sid, frame[s, t])
    server.predict()  # warmup/compile

    def window():
        if pipeline:
            for _ in range(ticks):
                for s in range(n_streams):
                    server.append_frame(s, frame[s, t_ring])
                server.predict_async()
            server.flush()
        else:
            for _ in range(ticks):
                for s in range(n_streams):
                    server.append_frame(s, frame[s, t_ring])
                server.predict()

    return _median_rate(window, n_streams * ticks, repeats, warmup=2)


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
    if fallback:
        ours, spread, step_ms, mfu = bench_ours(steps=3, repeats=2)
    else:
        ours, spread, step_ms, mfu = bench_ours()
    base = bench_torch_baseline()
    vs = ours / base if base > 0 else 0.0
    # secondary family metrics so per-family regressions are visible in
    # BENCH_r*.json (PERF.md tracks all four)
    extras = {}
    fams = (("aagcn_seq_per_sec", bench_aagcn, dict(steps=3, repeats=2)),
            ("sgn_seq_per_sec", bench_sgn, dict(steps=20, repeats=2)),
            ("sgn_scan8_seq_per_sec",
             lambda **kw: bench_sgn(steps_per_call=8, **kw),
             dict(steps=16, repeats=2)),
            ("kinetics_seq_per_sec", bench_kinetics,
             dict(steps=3, repeats=2)),
            ("agcn_infer_seq_per_sec", bench_infer,
             dict(steps=2, repeats=2, batch=64)),
            ("serving_preds_per_sec", bench_serving,
             dict(n_streams=4, ticks=3, repeats=2)))
    for name, fn, quick in fams:
        try:
            med, sp = fn(**quick) if fallback else fn()
            extras[name] = round(med, 2)
            extras[name.replace("_seq_per_sec", "_spread_pct").replace(
                "_preds_per_sec", "_spread_pct")] = round(sp, 1)
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
        "repeats": 2 if fallback else 5,
        "agcn_spread_pct": round(spread, 1),
        "agcn_step_ms": round(step_ms, 1),
        "agcn_mfu_pct": round(mfu, 1),
        "mfu_peak_ref_tflops": CALIBRATED_PEAK_TFLOPS,
        **extras,
    }))


if __name__ == "__main__":
    main()
