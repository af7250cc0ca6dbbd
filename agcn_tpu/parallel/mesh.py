"""Device mesh and sharding helpers.

The distributed layer of the framework: where the reference drives NCCL
through torch DDP (main.py:20-41, utils/processor.py:286-296), we lay out
a `jax.sharding.Mesh` and annotate shardings; XLA emits the ICI/DCN
collectives. Axes:

- 'data': batch-parallel axis (DDP equivalent). Gradients all-reduce and
  global BatchNorm statistics both fall out of GSPMD sharding propagation.
- 'edge': model-side axis for edge-partitioned graph aggregation
  (see agcn_tpu/parallel/edge_partition.py).

Multi-host: `jax.distributed.initialize` + the same mesh over all
processes; per-host data loading covers the DistributedSampler role.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, edge: int = 1,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Create a (data, edge) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // edge
    assert data * edge <= n, f"{data}x{edge} mesh > {n} devices"
    dev_array = np.asarray(devices[: data * edge]).reshape(data, edge)
    return Mesh(dev_array, ("data", "edge"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over 'data'.

    Multi-process: each process holds only ITS shard of the batch (the
    host-sharded iterator), so the global array is assembled from the
    process-local pieces — global batch = local batch x process_count,
    matching the reference's per-GPU DataLoader batch_size semantics."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        out = tuple(jax.make_array_from_process_local_data(
            sh, np.asarray(a)) for a in arrays)
    else:
        out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def jit_data_parallel(step_fn, mesh: Mesh, donate_state: bool = True):
    """Jit a (state, x, y, ...) step with state replicated and batch
    sharded over 'data'. XLA inserts the gradient psum over ICI."""
    rep = replicated(mesh)
    bat = batch_sharding(mesh)

    return jax.jit(
        step_fn,
        in_shardings=(rep, bat, bat, rep),
        donate_argnums=(0,) if donate_state else (),
    )
