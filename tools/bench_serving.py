#!/usr/bin/env python
"""Multi-stream serving: batched engine vs per-stream dispatch.

Measures end-to-end tick throughput (preprocessing on host + forward on
device + host fetch) for N live camera streams, comparing the
reference-style one-forward-per-stream loop against the batched
fixed-shape engine (infer/serving.py). Usage:

    python tools/bench_serving.py [n_streams ...]   # default: 8 16 64
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tools._common import setup_backend

setup_backend()

import numpy as np

from agcn_tpu.graph import build_adjacency
from agcn_tpu.infer.realtime import ActionRecognition
from agcn_tpu.infer.serving import BatchedStreamServer
from agcn_tpu.models.agcn import AGCN

T = 64  # ring-buffer length per stream (demo-scale window)


def _fill(append, seed, n=T):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        append(rng.standard_normal((1, 1, 25, 3)).astype(np.float32) * 0.2)


def bench(n_streams: int, ticks: int = 40, repeats: int = 5,
          normalize: bool = False):
    """One row of the round-5 A/B: sequential (reference-style, one
    forward per stream) vs batched sync vs batched pipelined, plus the
    host-prep / device-forward split. All rates are medians over
    `repeats` windows with (max-min)/median spread."""
    import statistics

    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=60, adj=adj)
    x0 = np.zeros((1, 3, T, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    kwargs = dict(kind="dense", max_seq_length=T, normalize=normalize)

    server = BatchedStreamServer(model, variables,
                                 max_streams=n_streams, **kwargs)
    frame = np.random.default_rng(7).standard_normal(
        (n_streams, 1, 1, 25, 3)).astype(np.float32) * 0.2
    singles = []
    for i in range(n_streams):
        sid = server.add_stream()
        _fill(lambda f, s=sid: server.append_frame(s, f), i)
        single = ActionRecognition(model, variables, **kwargs)
        _fill(single.append_frame, i)
        singles.append(single)

    def median_rate(window, n_preds):
        window()  # warmup
        rates = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            window()
            rates.append(n_preds / (time.perf_counter() - t0))
        med = statistics.median(rates)
        return med, (max(rates) - min(rates)) / med * 100.0

    def live_append(target):
        for s in range(n_streams):
            target(s, frame[s])

    server.predict()  # compile

    def w_sync():
        for _ in range(ticks):
            live_append(server.append_frame)
            server.predict()

    def w_pipe():
        for _ in range(ticks):
            live_append(server.append_frame)
            server.predict_async()
        server.flush()

    batched, sp_b = median_rate(w_sync, n_streams * ticks)
    pipelined, sp_p = median_rate(w_pipe, n_streams * ticks)

    # split: host prep time vs device-only forward on the same batch
    preps, h2ds = [], []
    for _ in range(12):
        live_append(server.append_frame)
        sids, per, x = server._prepare()
        preps.append(server.last_prep_ms - server.last_h2d_ms)
        h2ds.append(server.last_h2d_ms)
    dev = []
    for _ in range(12):
        t0 = time.perf_counter()
        out = server._forward(server.variables, x)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        dev.append((time.perf_counter() - t0) * 1e3)
    prep_ms = statistics.median(preps)
    h2d_ms = statistics.median(h2ds)
    dev_ms = statistics.median(dev)

    singles[0].predict()  # compile
    seq_ticks = max(1, ticks // 8)

    def w_seq():
        for s in range(n_streams):
            singles[s].append_frame(frame[s])
        for _ in range(seq_ticks):
            for s in singles:
                s.predict()

    sequential, sp_s = median_rate(w_seq, n_streams * seq_ticks)
    tag = " (normalize)" if normalize else ""
    print(f"streams={n_streams:4d}{tag}  sequential {sequential:8.1f} "
          f"preds/s ±{sp_s:4.1f}%  batched {batched:8.1f} ±{sp_b:4.1f}%  "
          f"pipelined {pipelined:8.1f} ±{sp_p:4.1f}%  "
          f"[tick split: host prep {prep_ms:.1f} ms | h2d "
          f"{h2d_ms:.1f} ms | device {dev_ms:.1f} ms]",
          flush=True)
    return dict(streams=n_streams, sequential=sequential,
                batched=batched, pipelined=pipelined,
                prep_ms=prep_ms, h2d_ms=h2d_ms, device_ms=dev_ms)


if __name__ == "__main__":
    norm = "--normalize" in sys.argv[1:]
    rest = [a for a in sys.argv[1:] if a != "--normalize"]
    for n in [int(a) for a in rest] or (4, 16, 64):
        bench(n, normalize=norm)
