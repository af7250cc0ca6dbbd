#!/usr/bin/env python
"""Eval-path ceiling study (VERDICT r4 next #4).

The train path got a three-round op-attributed MFU analysis; this gives
the forward-only path the same rigor: a batch sweep (256/512/1024)
through the relay, a BN-fold A/B (utils/bn_fold.py — exact at eval,
erases every per-block BN from the compiled program), and the compiled
program's own FLOPs so each point carries an MFU estimate against the
calibrated chip peak.

    python tools/bench_eval_study.py [batch ...]   # default 256 512 1024
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

from agcn_tpu.graph import build_adjacency
from agcn_tpu.models import AGCN
from agcn_tpu.utils.bn_fold import fold_agcn_bn_eval

C, T, V, M, NUM_CLASS = 3, 300, 25, 2, 60
PEAK_TFLOPS = 123.5  # calibrated bf16 GEMM peak on this chip (PERF.md r3)


def _rate(fwd, variables, x, batch, steps, repeats=5):
    out = fwd(variables, x)
    float(np.asarray(out).sum())  # compile + warm
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(variables, x)
        float(np.asarray(out).sum())
        rates.append(batch * steps / (time.perf_counter() - t0))
    med = statistics.median(rates)
    return med, (max(rates) - min(rates)) / med * 100.0


def study(batch: int, steps: int = 10):
    adj = build_adjacency("ntu_rgb_d")
    model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, C, T, V, M)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN stats so the fold A/B is honest
    _, upd = model.apply(variables, x[:8], train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0])
    flops = 0.0
    try:
        cost = fwd.lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        pass

    base, sp_base = _rate(fwd, variables, x, batch, steps)
    folded_vars = jax.tree_util.tree_map(
        jnp.asarray, fold_agcn_bn_eval(variables))
    fold_model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16,
                      fold_bn=True)
    ffwd = jax.jit(lambda v, x: fold_model.apply(v, x, train=False)[0])
    fold, sp_fold = _rate(ffwd, folded_vars, x, batch, steps)

    mfu = (flops * base / batch) / (PEAK_TFLOPS * 1e12) * 100 if flops \
        else 0.0
    print(f"batch={batch:5d}  base {base:8.1f} seq/s ±{sp_base:4.1f}%  "
          f"bn-folded {fold:8.1f} ±{sp_fold:4.1f}%  "
          f"({fold / base - 1:+.1%})  fwd_mfu {mfu:4.1f}%", flush=True)
    return dict(batch=batch, base=base, folded=fold, mfu=mfu)


def forms_sweep(batch: int = 256, steps: int = 10):
    """Eval-formulation A/B at the serving shape: the xplane trace shows
    42% of eval device time in relayout copies around the 'pf' form's
    aggregation (ops/gcn.py:122) — do any of the other formulations
    compile to a cheaper eval schedule?"""
    adj = build_adjacency("ntu_rgb_d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, C, T, V, M)), jnp.float32)
    base = base_form = None
    for form in ("pf", "pf_packed", "agg", "agg_packed", "agg_packed2",
                 "custom", "fused_dyn", "hybrid"):
        model = AGCN(num_class=NUM_CLASS, adj=adj, dtype=jnp.bfloat16,
                     eval_formulation=form)
        variables = model.init(jax.random.PRNGKey(0), x[:8], train=False)
        fwd = jax.jit(lambda v, x, m=model: m.apply(v, x, train=False)[0])
        try:
            med, sp = _rate(fwd, variables, x, batch, steps, repeats=3)
        except Exception as e:
            print(f"  eval form {form:12s} failed: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        if base is None:
            base, base_form = med, form  # first SUCCEEDING form
        print(f"  eval form {form:12s} {med:8.1f} seq/s ±{sp:4.1f}%  "
              f"(vs {base_form} {med / base - 1:+.1%})", flush=True)


if __name__ == "__main__":
    if "--forms" in sys.argv[1:]:
        rest = [a for a in sys.argv[1:] if a != "--forms"]
        forms_sweep(batch=int(rest[0]) if rest else 256)
        sys.exit(0)
    for b in [int(a) for a in sys.argv[1:]] or (256, 512, 1024):
        try:
            study(b)
        except Exception as e:  # batch 512+ RESOURCE_EXHAUSTs this chip
            print(f"batch={b:5d}  {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
