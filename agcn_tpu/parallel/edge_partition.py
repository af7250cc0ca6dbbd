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
    'edge' axis is split into (subset, output) factors chosen to MINIMIZE
    padded per-device work — ceil(K/ks)/K * 1/os — and the two einsums
    run PROJECT-FIRST (x @ W commutes with the aggregation) so both the
    projection and the V x V aggregation carry only the device's
    (subset, output-chunk) share: per-device FLOPs are ~1/P of the total
    (verified by the compiled cost model in SCALING_r*.json). Partials
    combine with a psum over the subset factor and an all-gather over
    the output factor, both emitted by XLA from one shard_map.

    Returns (fn, adj_parts) with fn(x (B,T,V,C), adj_parts, w (K,C,Co))
    -> (B,T,V,Co).
    """
    p = mesh.shape["edge"]
    k, v, _ = adj.shape
    # choose the (subset, output) factorization minimizing padded
    # per-device work; with project-first both factors divide real FLOPs,
    # so for small K (3 spatial subsets) pure output sharding wins
    best = None
    for ks in (d for d in range(1, p + 1) if p % d == 0 and d <= k):
        os_c = p // ks
        per_c = -(-k // ks)
        ratio = per_c / k / os_c
        if best is None or ratio < best[0]:
            best = (ratio, ks, os_c, per_c)
    _, ks, os_, per = best
    # pad K to ks * per with zero subsets
    k_pad = ks * per - k
    adj_padded = np.concatenate(
        [adj, np.zeros((k_pad, v, v), adj.dtype)]) if k_pad else adj
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
        co_pad = -co % os_   # pad channels so every device gets a chunk
        chunk = (co + co_pad) // os_
        w_pad = w
        if k_pad:
            w_pad = jnp.concatenate(
                [w_pad, jnp.zeros((k_pad,) + w.shape[1:], w.dtype)])
        if co_pad:
            w_pad = jnp.concatenate(
                [w_pad, jnp.zeros(w_pad.shape[:-1] + (co_pad,), w.dtype)],
                axis=-1)
        # my subset slice of the weights, my output-channel slice
        w_local = jax.lax.dynamic_slice(
            w_pad, (s * per, 0, 0), (per, w.shape[1], co + co_pad))
        w_local = jax.lax.dynamic_slice(
            w_local, (0, 0, o * chunk), (per, w.shape[1], chunk))
        # PROJECT-FIRST: the C -> chunk projection shrinks the feature
        # dim BEFORE the V x V aggregation, so both einsums do only this
        # device's share of the FLOPs
        proj = jnp.einsum("btvc,kco->kbtvo", xl, w_local)
        z = jnp.einsum("kbtvo,kvw->btwo", proj, adj_local[0])
        # place my output slice at its channel offset and psum: slices are
        # disjoint across the output factor and summed across the subset
        # factor, so ONE all-reduce assembles the full output
        full = jnp.zeros(z.shape[:-1] + (co + co_pad,), z.dtype)
        full = jax.lax.dynamic_update_slice(
            full, z, (0, 0, 0, o * chunk))
        return jax.lax.psum(full, "edge")[..., :co]

    return run, jnp.asarray(parts)


def model_edge_gcn(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray,
                   mesh: Mesh) -> jnp.ndarray:
    """In-model edge-partitioned adaptive GCN with compute/comm overlap.

    This is the training-path version of the north star: the model's own
    batched aggregation y = sum_k (x @ A1_k) @ W_k runs with the K
    adjacency subsets partitioned across the 'edge' mesh axis (each
    device owns ceil(K/P) subsets -> ~1/P of the FLOPs) and the partial
    destination features combined by a time-chunked ring:

      reduce-scatter phase: at ring hop h each device ppermutes its
      accumulated time-chunk while COMPUTING the partial for the chunk
      arriving next — the collective rides ICI concurrently with the
      einsum (explicit double-buffer overlap, not one blocking psum);
      all-gather phase: P-1 further hops circulate the finished chunks.

    Args:
      x: (B, T, V, C) — replicated over 'edge' (shard batch over 'data').
      a1: (B, K, V, V) combined data-dependent adjacency (replicated).
      w: (K, C, Co) per-subset projection kernels (replicated).
      mesh: mesh with an 'edge' axis of size P (T is zero-padded
        internally to a multiple of P when needed).
    Returns:
      (B, T, V, Co), replicated over 'edge'; numerically identical to
      ops/gcn.apply_gcn(x, a1, w).
    """
    p = mesh.shape["edge"]
    if p == 1:
        partial = jnp.einsum("btvc,bkvw->kbtwc", x, a1)
        return jnp.einsum("kbtwc,kco->btwo", partial, w)
    k = a1.shape[1]
    k_pad = -k % p
    per = (k + k_pad) // p
    t_in = x.shape[1]
    # time is batch-like in the aggregation, so ragged chunks are handled
    # by zero-padding T up to a multiple of P and slicing the pad back
    # off (stride-2 stages make T=300 -> 75, not divisible by P=2)
    t_pad = -t_in % p
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
    t_total = x.shape[1]
    tc = t_total // p
    fwd = [(i, (i + 1) % p) for i in range(p)]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(xl, a1l, wl):
        d = jax.lax.axis_index("edge")
        if k_pad:
            a1l = jnp.concatenate(
                [a1l, jnp.zeros(a1l.shape[:1] + (k_pad,) + a1l.shape[2:],
                                a1l.dtype)], axis=1)
            wl = jnp.concatenate(
                [wl, jnp.zeros((k_pad,) + wl.shape[1:], wl.dtype)])
        my_a1 = jax.lax.dynamic_slice_in_dim(a1l, d * per, per, axis=1)
        my_w = jax.lax.dynamic_slice_in_dim(wl, d * per, per, axis=0)

        def chunk_partial(c):
            """Local (owned-subsets) output partial for time chunk c."""
            xc = jax.lax.dynamic_slice_in_dim(xl, c * tc, tc, axis=1)
            agg = jnp.einsum("btvc,bkvw->kbtwc", xc, my_a1)
            return jnp.einsum("kbtwc,kco->btwo", agg, my_w)

        # reduce-scatter with overlap: the ppermute of the accumulated
        # buffer and the einsum for the arriving chunk have no data
        # dependence, so the compiler runs them concurrently
        buf = chunk_partial(d)
        for h in range(1, p):
            sent = jax.lax.ppermute(buf, "edge", fwd)
            mine = chunk_partial((d - h) % p)
            buf = sent + mine
        # device d now holds the fully-reduced chunk (d + 1) % p
        # all-gather phase: circulate finished chunks
        chunks = [(buf, (d + 1) % p)]
        for _ in range(p - 1):
            buf = jax.lax.ppermute(buf, "edge", fwd)
            chunks.append((buf, None))
        # chunk received at gather-hop g is chunk (d - g + 1) % p; place
        # every chunk at its static slot via one-hot masking over a
        # symmetric index (avoids gather with traced indices)
        out = jnp.zeros(xl.shape[:1] + (t_total,) + xl.shape[2:-1]
                        + (wl.shape[-1],), buf.dtype)
        for g, (cbuf, _) in enumerate(chunks):
            idx = ((d - g + 1) % p) * tc
            out = jax.lax.dynamic_update_slice_in_dim(out, cbuf, idx,
                                                      axis=1)
        return out

    out = run(x, a1, w)
    return out[:, :t_in] if t_pad else out


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
