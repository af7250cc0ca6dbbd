#!/usr/bin/env python
"""CLI entry point.

Parity target: reference main.py (train/test driver). Where the reference
spawns one process per GPU with NCCL (main.py:20-55), this runs one
process per host: all local chips join the mesh via `jax.sharding`, and
multi-host runs call `jax.distributed.initialize` before building the
trainer.

Usage:
    python main.py --config configs/ntu60_xview/train_joint.yaml
    python main.py --config ... --phase test --weights work_dir/.../epoch_50
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from agcn_tpu.utils.config import config_from_cli

    cfg = config_from_cli(argv)
    import jax

    # --device cpu|tpu selects the JAX platform explicitly (the config
    # update wins even where a site plugin rewrites JAX_PLATFORMS)
    if str(cfg.device).lower() in ("cpu", "tpu", "gpu"):
        jax.config.update("jax_platforms", str(cfg.device).lower())
    # persistent compilation cache: repeat runs skip the (minutes-long)
    # TPU compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if cfg.world_size > 1:
        # cloud TPU pods auto-detect; elsewhere (e.g. a CPU/GPU cluster
        # or the 2-process CPU test) pass the rendezvous explicitly via
        # env — the role of the reference's MASTER_ADDR/port 8020
        # (reference main.py:21-22), without the hardcoding
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES",
                                                 cfg.world_size)),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
    from agcn_tpu.train.trainer import Trainer

    Trainer(cfg).start()


if __name__ == "__main__":
    main()
