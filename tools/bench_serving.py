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

import subprocess

import jax

# the axon tunnel can hang indefinitely at backend init; probe it in a
# subprocess and fall back to CPU (same pattern as bench.py)
try:
    _r = subprocess.run(
        [sys.executable, "-c", "import jax; jax.devices()"],
        timeout=300, capture_output=True)
    if _r.returncode != 0:
        raise RuntimeError
except Exception:
    print("# TPU backend unavailable; falling back to CPU", flush=True)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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


def bench(n_streams: int, ticks: int = 20):
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=60, adj=adj)
    x0 = np.zeros((1, 3, T, 25, 2), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    kwargs = dict(kind="dense", max_seq_length=T, normalize=False)

    server = BatchedStreamServer(model, variables,
                                 max_streams=n_streams, **kwargs)
    singles = []
    for i in range(n_streams):
        sid = server.add_stream()
        _fill(lambda f, s=sid: server.append_frame(s, f), i)
        single = ActionRecognition(model, variables, **kwargs)
        _fill(single.append_frame, i)
        singles.append(single)

    server.predict()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(ticks):
        server.predict()
    batched = n_streams * ticks / (time.perf_counter() - t0)

    singles[0].predict()  # warmup/compile
    seq_ticks = max(1, ticks // 4)
    t0 = time.perf_counter()
    for _ in range(seq_ticks):
        for s in singles:
            s.predict()
    sequential = n_streams * seq_ticks / (time.perf_counter() - t0)
    print(f"streams={n_streams:4d}  batched {batched:8.1f} ticks/s  "
          f"sequential {sequential:8.1f} ticks/s  "
          f"speedup {batched / sequential:5.1f}x", flush=True)


if __name__ == "__main__":
    for n in [int(a) for a in sys.argv[1:]] or (8, 16, 64):
        bench(n)
