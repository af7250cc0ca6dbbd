"""Edge-partitioned graph aggregation over the 'edge' mesh axis.

The skeleton graph is tiny (V <= 25) but the batched edge set is huge:
every (batch, frame) instance applies the same K x E edges. We partition
the edge set across the 'edge' mesh axis: each device owns a contiguous
slice of each subset's edge list (agcn_tpu.graph.EdgeSet.partition),
aggregates only its local edges as a dense masked matmul (dense is the
MXU-native form at V <= 25), and the destination-side partial features are
combined with an all-reduce over ICI — the "boundary joint feature
exchange" of the design brief expressed as XLA collectives.

Two combiners are provided:
- psum: one fused all-reduce (XLA overlaps it with surrounding compute),
- ppermute ring: explicit neighbor exchange accumulating partials hop by
  hop, the building block for overlap-with-compute pipelining.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from agcn_tpu.graph import EdgeSet, dense_to_edges


def partitioned_adjacency(adj: np.ndarray, num_parts: int) -> np.ndarray:
    """Split a (K, V, V) adjacency stack into per-device masked stacks.

    Returns (num_parts, K, V, V): part p holds only its edge slice of each
    subset; summing over parts recovers the full adjacency.
    """
    k, v, _ = adj.shape
    out = np.zeros((num_parts, k, v, v), dtype=adj.dtype)
    for ki in range(k):
        for p, es in enumerate(dense_to_edges(adj[ki]).partition(num_parts)):
            out[p, ki] = es.to_dense()
    return out


def local_aggregate(x: jnp.ndarray, local_adj: jnp.ndarray) -> jnp.ndarray:
    """Aggregate the locally-owned edges: (B, T, V, C) x (K, V, V) ->
    (K, B, T, V, C) partial destination features."""
    return jnp.einsum("btvc,kvw->kbtwc", x, local_adj)


def edge_partitioned_aggregate(x: jnp.ndarray, adj: np.ndarray, mesh: Mesh,
                               combiner: str = "psum") -> jnp.ndarray:
    """Full K-subset aggregation with edges sharded over mesh axis 'edge'.

    Args:
      x: (B, T, V, C) replicated over 'edge' (typically sharded over
        'data' on the batch axis).
      adj: full (K, V, V) stack (host numpy).
      mesh: mesh with an 'edge' axis.
      combiner: 'psum' | 'ppermute'.
    Returns:
      (K, B, T, V, C) aggregated features (replicated over 'edge').
    """
    n_edge = mesh.shape["edge"]
    parts = jnp.asarray(partitioned_adjacency(adj, n_edge))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("edge")),
        out_specs=P(),
        check_vma=combiner == "psum",
    )
    def run(xl, adj_local):
        partial = local_aggregate(xl, adj_local[0])
        if combiner == "psum":
            return jax.lax.psum(partial, "edge")
        # ring all-reduce via ppermute: accumulate neighbors' partials
        acc = partial
        buf = partial
        for _ in range(n_edge - 1):
            buf = jax.lax.ppermute(
                buf, "edge",
                [(i, (i + 1) % n_edge) for i in range(n_edge)])
            acc = acc + buf
        return acc

    return run(x, parts)


def make_hybrid_partitioned_gcn(adj: np.ndarray, mesh: Mesh) -> Callable:
    """Subset x output-channel hybrid partitioning with real work division.

    Dense-masked edge slices cannot shrink a V<=25 dense matmul, so pure
    edge sharding replicates compute (see bench_scaling.py). Instead the
    'edge' axis is split into (subset, output) factors: each device owns
    ceil(K/ks) adjacency subsets and a 1/os slice of the output channels —
    per-device FLOPs are ~(1/P) of the total. Partials combine with a
    psum over the subset factor and an all-gather over the output factor,
    both emitted by XLA from one shard_map.

    Returns (fn, adj_parts) with fn(x (B,T,V,C), adj_parts, w (K,C,Co))
    -> (B,T,V,Co).
    """
    p = mesh.shape["edge"]
    k, v, _ = adj.shape
    # largest divisor of p that fits the subset count
    ks = max(d for d in range(1, p + 1) if p % d == 0 and d <= k)
    os_ = p // ks            # output-channel factor
    # pad K to a multiple of ks with zero subsets
    k_pad = -k % ks
    adj_padded = np.concatenate(
        [adj, np.zeros((k_pad, v, v), adj.dtype)]) if k_pad else adj
    per = (k + k_pad) // ks
    # device d = (s, o): owns subsets [s*per, (s+1)*per)
    parts = np.stack([adj_padded[s * per:(s + 1) * per]
                      for s in range(ks) for _ in range(os_)])

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("edge"), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(xl, adj_local, w):
        d = jax.lax.axis_index("edge")
        s = d // os_
        o = d % os_
        co = w.shape[-1]
        chunk = co // os_
        w_pad = jnp.concatenate(
            [w, jnp.zeros((k_pad,) + w.shape[1:], w.dtype)]) if k_pad \
            else w
        # my subset slice of the weights, my output-channel slice
        w_local = jax.lax.dynamic_slice(
            w_pad, (s * per, 0, 0), (per, w.shape[1], co))
        w_local = jax.lax.dynamic_slice(
            w_local, (0, 0, o * chunk), (per, w.shape[1], chunk))
        partial = jnp.einsum("btvc,kvw->kbtwc", xl, adj_local[0])
        z = jnp.einsum("kbtwc,kco->btwo", partial, w_local)  # (..., chunk)
        # place my output slice at its channel offset and psum: slices are
        # disjoint across the output factor and summed across the subset
        # factor, so ONE all-reduce assembles the full output
        full = jnp.zeros(z.shape[:-1] + (co,), z.dtype)
        full = jax.lax.dynamic_update_slice(
            full, z, (0, 0, 0, o * chunk))
        return jax.lax.psum(full, "edge")

    return run, jnp.asarray(parts)


def make_edge_partitioned_gcn(adj: np.ndarray, mesh: Mesh,
                              combiner: str = "psum") -> Callable:
    """Build y = sum_k (x @ A_k) @ W_k with edge-sharded aggregation.

    Returns f(x (B,T,V,C), weights (K,Cin,Cout)) -> (B,T,V,Cout). The
    projection happens on the partial (local-edge) features BEFORE the
    all-reduce, so the collective moves Cout-sized activations and the
    matmul runs fully parallel across the edge axis.
    """
    n_edge = mesh.shape["edge"]
    parts = jnp.asarray(partitioned_adjacency(adj, n_edge))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("edge"), P()),
        out_specs=P(),
        check_vma=combiner == "psum",
    )
    def run(xl, adj_local, weights):
        partial = local_aggregate(xl, adj_local[0])  # (K, B, T, V, C)
        z = jnp.einsum("kbtwc,kco->btwo", partial, weights)
        if combiner == "psum":
            return jax.lax.psum(z, "edge")
        acc = z
        buf = z
        for _ in range(n_edge - 1):
            buf = jax.lax.ppermute(
                buf, "edge",
                [(i, (i + 1) % n_edge) for i in range(n_edge)])
            acc = acc + buf
        return acc

    return run, parts
