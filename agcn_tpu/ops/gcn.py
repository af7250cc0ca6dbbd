"""Graph-convolution compute primitives (channels-last, MXU-shaped).

Semantics match the reference's adaptive graph convolution (reference
model/architecture/aagcn/agcn.py:92-109, aagcn.py:164-177), re-expressed as
einsums over the TPU-native (batch, time, joint, channel) layout:

  aggregate:            y[b,t,w,c] = sum_v x[b,t,v,c] * A[v,w]
  embedding attention:  att[b,v,w] = softmax_v( sum_{t,c} th[b,t,v,c]
                                                * ph[b,t,w,c] / (C*T) )

All contraction shapes are static; V <= 25 keeps every adjacency resident
in VMEM, and the (V*Cin, V*Cout) fused operator turns the whole K-subset
aggregate+project+sum into a single large MXU matmul (see
`fused_static_operator`). A Pallas fully-fused kernel for the adaptive path
lives in agcn_tpu/ops/pallas/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def aggregate(x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """Graph aggregation y = x @ A over the joint axis.

    Args:
      x: (..., V, C) joint features (typically (B, T, V, C)).
      adj: (V, V) static, (B, V, V) per-sample, or (B, T, V, V) per-frame
        adjacency with A[source, dest] layout.
    Returns:
      Same shape as x, with joint axis aggregated.
    """
    if adj.ndim == 2:
        return jnp.einsum("...vc,vw->...wc", x, adj)
    if adj.ndim == 3:
        return jnp.einsum("btvc,bvw->btwc", x, adj)
    if adj.ndim == 4:
        return jnp.einsum("btvc,btvw->btwc", x, adj)
    raise ValueError(f"bad adjacency rank {adj.ndim}")


def embedding_attention(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Per-sample data-dependent adjacency C = softmax(theta^T phi / d).

    Contraction over (time, channel) jointly and softmax over the *source*
    joint axis, matching reference agcn.py:99-101 (softmax dim=-2, divisor
    inter_c * T).

    Args:
      theta, phi: (B, T, V, Ce) embedded features.
    Returns:
      (B, V, V) attention adjacency, columns summing to 1.
    """
    b, t, v, ce = theta.shape
    logits = jnp.einsum("btvc,btwc->bvw", theta, phi) / (ce * t)
    return jax.nn.softmax(logits, axis=-2)


def frame_attention(g1: jnp.ndarray, g2: jnp.ndarray,
                    activation: str = "softmax") -> jnp.ndarray:
    """Per-frame dense attention G = act(g1 g2^T) (SGN style).

    Matches reference sgn blocks/spatial.py:230-240: for each frame t,
    G[t] = softmax_w(g1[t] @ g2[t]^T) — softmax over the *last* axis.

    Args:
      g1, g2: (B, T, V, Ce).
    Returns:
      (B, T, V, V) attention, G[b,t,v,w] = weight of source w for dest v.
    """
    logits = jnp.einsum("btvc,btwc->btvw", g1, g2)
    if activation == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if activation == "sigmoid":
        return jax.nn.sigmoid(logits)
    if activation == "identity":
        return logits
    raise ValueError(f"unknown activation {activation!r}")


def frame_aggregate(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """SGN-style per-frame aggregation x2[b,t,v,:] = sum_w G[b,t,v,w] x[b,t,w,:].

    Matches reference blocks/spatial.py:800-801 (g.matmul(x1) with x1 in
    (n,t,v,c)): destination is the row index of G.
    """
    return jnp.einsum("btvw,btwc->btvc", g, x)


@jax.custom_vjp
def adaptive_gcn(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray
                 ) -> jnp.ndarray:
    """K-subset adaptive graph conv, project-first with a hand-tuned VJP.

      y[b,t,w,o] = sum_{k,v,c} x[b,t,v,c] * w[k,c,o] * a1[b,k,v,w]

    Equivalent to the reference's aggregate-then-project loop
    (agcn.py:92-109, aagcn.py:164-177) by commutativity, but computed
    project-FIRST: one wide (B*T*V, C)@(C, K*Co) GEMM followed by a single
    joint (k,v) contraction — 2.6x faster forward than
    aggregate-then-project on TPU (PERF.md). Autodiff of this form has a
    slow backward (it materializes dp[b,t,v,k,o] through a V=25-bound
    einsum); the custom VJP below instead picks the cheap einsum order for
    each cotangent, so the fast form is trainable.

    Args:
      x: (B, T, V, C) features.
      a1: (B, K, V, V) combined adjacency (static + learned + attention),
        layout A[source, dest].
      w: (K, C, Co) per-subset projection kernels.
    Returns:
      (B, T, V, Co).
    """
    return _adaptive_gcn_fwd_impl(x, a1, w)


def _adaptive_gcn_fwd_impl(x, a1, w):
    b, t, v, c = x.shape
    k, _, co = w.shape
    wc = jnp.transpose(w, (1, 0, 2)).reshape(c, k * co)
    p = (x @ wc).reshape(b, t, v, k, co)
    return jnp.einsum("btvko,bkvw->btwo", p, a1)


def _adaptive_gcn_fwd(x, a1, w):
    return _adaptive_gcn_fwd_impl(x, a1, w), (x, a1, w)


def _adaptive_gcn_bwd(res, g):
    # Each cotangent uses the einsum order with the largest contraction
    # dims (joint (k,v)/(k,w) contractions of size K*V, or huge
    # batch-time reductions) — never the V=25-only contraction with a
    # (B,T,V,K,Co)-sized output that autodiff would pick.
    x, a1, w = res
    b, t, v, c = x.shape
    k, _, co = w.shape
    wc = jnp.transpose(w, (1, 0, 2)).reshape(c, k * co)
    p = (x @ wc).reshape(b, t, v, k, co)  # recomputed: cheap wide GEMM
    da1 = jnp.einsum("btvko,btwo->bkvw", p, g)
    u = jnp.einsum("btwo,kco->btwkc", g, w)
    dx = jnp.einsum("btwkc,bkvw->btvc", u, a1)
    agg = jnp.einsum("btvc,bkvw->btwkc", x, a1)
    dw = jnp.einsum("btwkc,btwo->kco", agg, g)
    return dx, da1, dw


adaptive_gcn.defvjp(_adaptive_gcn_fwd, _adaptive_gcn_bwd)


def adaptive_gcn_reference(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray
                           ) -> jnp.ndarray:
    """Naive aggregate-then-project form of `adaptive_gcn` (for tests)."""
    b, t, v, c = x.shape
    k = a1.shape[1]
    agg = jnp.einsum("btvc,bkvw->btwkc", x, a1).reshape(b, t, v, k * c)
    return agg @ w.reshape(k * c, -1)


def adaptive_gcn_pf_packed(x, a1, w):
    """Project-first with (k,v) packed as one explicit contraction axis
    (tools/bench_agg_forms.py 'pf-packed')."""
    b, t, v, c = x.shape
    k, _, co = w.shape
    wc = jnp.transpose(w, (1, 0, 2)).reshape(c, k * co)
    p = (x @ wc).reshape(b, t, v, k, co)
    p2 = jnp.transpose(p, (0, 1, 4, 3, 2)).reshape(b, t * co, k * v)
    a2 = a1.reshape(b, k * v, v)
    y = jnp.einsum("bmx,bxw->bmw", p2, a2)
    return jnp.transpose(y.reshape(b, t, co, v), (0, 1, 3, 2))


def adaptive_gcn_agg_packed(x, a1, w):
    """Aggregate-then-project with the aggregation as an explicit
    (T*C, V) x (V, K*V) batched matmul ('agg-packed')."""
    b, t, v, c = x.shape
    k = a1.shape[1]
    x2 = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t * c, v)
    a2 = jnp.transpose(a1, (0, 2, 1, 3)).reshape(b, v, k * v)
    z = jnp.einsum("bmv,bvn->bmn", x2, a2)  # (B, T*C, K*V)
    z = z.reshape(b, t, c, k, v)
    z = jnp.transpose(z, (0, 1, 4, 3, 2)).reshape(b, t, v, k * c)
    return z @ w.reshape(k * c, -1)


def adaptive_gcn_agg_packed2(x, a1, w):
    """agg_packed with the contraction (V) axis placed second on BOTH
    matmul operands — layout-assignment experiment."""
    b, t, v, c = x.shape
    k = a1.shape[1]
    x2 = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, v, t * c)
    a2 = jnp.transpose(a1, (0, 2, 1, 3)).reshape(b, v, k * v)
    z = jnp.einsum("bvm,bvn->bmn", x2, a2)  # (B, T*C, K*V)
    z = z.reshape(b, t, c, k, v)
    z = jnp.transpose(z, (0, 1, 4, 3, 2)).reshape(b, t, v, k * c)
    return z @ w.reshape(k * c, -1)


def adaptive_gcn_agg_dp(x, a1, w):
    """agg_packed aggregation, but the projection contracts the packed
    (c, k) axes of z DIRECTLY via dot_general — no explicit
    (b,t,c,k,v) -> (b,t,v,k*c) transpose between the two GEMMs (the
    dominant layout-copy bucket in the round-3 profile)."""
    b, t, v, c = x.shape
    k = a1.shape[1]
    x2 = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t * c, v)
    a2 = jnp.transpose(a1, (0, 2, 1, 3)).reshape(b, v, k * v)
    z = jnp.einsum("bmv,bvn->bmn", x2, a2)  # (B, T*C, K*V)
    z = z.reshape(b, t, c, k, v)
    return jnp.einsum("btckv,kco->btvo", z, w)


def attention_logits(emb: jnp.ndarray, num_subset: int, inter_c: int,
                     form: str = "transposed") -> jnp.ndarray:
    """Per-subset embedding-attention logits from the fused theta|phi
    embedding GEMM output (reference agcn.py:99-101 semantics: divisor
    Ce * T; softmax applied by the caller).

    Args:
      emb: (B, T, V, 2*K*Ce) — [theta_0..theta_{K-1}, phi_0..phi_{K-1}].
    Returns:
      (B, K, V, V) scaled logits.
    """
    b, t, v, _ = emb.shape
    k, ce = num_subset, inter_c
    e = emb.reshape(b, t, v, 2, k, ce)
    if form == "transposed":
        # round-2 winner: pack (T, Ce) per (B, K) batch element
        theta, phi = e[..., 0, :, :], e[..., 1, :, :]
        th = jnp.transpose(theta, (0, 3, 2, 1, 4)).reshape(b, k, v, t * ce)
        ph = jnp.transpose(phi, (0, 3, 2, 1, 4)).reshape(b, k, v, t * ce)
        return jnp.einsum("bkvx,bkwx->bkvw", th, ph) / (ce * t)
    if form == "transposed_tl":
        # pack (Ce, T) instead of (T, Ce): the packed axis ends in T
        # (full 128-lane occupancy vs Ce=16..64) — same sum, different
        # relayout pattern
        theta, phi = e[..., 0, :, :], e[..., 1, :, :]
        th = jnp.transpose(theta, (0, 3, 2, 4, 1)).reshape(b, k, v, ce * t)
        ph = jnp.transpose(phi, (0, 3, 2, 4, 1)).reshape(b, k, v, ce * t)
        return jnp.einsum("bkvx,bkwx->bkvw", th, ph) / (ce * t)
    if form == "onepack":
        # ONE transpose of the combined tensor; theta/phi become
        # leading-axis views
        e2 = jnp.transpose(e, (0, 3, 4, 2, 1, 5)).reshape(
            b, 2, k, v, t * ce)
        return jnp.einsum("bkvx,bkwx->bkvw", e2[:, 0], e2[:, 1]) / (ce * t)
    if form == "blockdiag":
        # one (K*V, K*V) bilinear GEMM, take the K block diagonal
        # (round-2 exploration, now with backward via the same path)
        e2 = jnp.transpose(e, (0, 3, 4, 2, 1, 5)).reshape(
            b, 2, k * v, t * ce)
        big = jnp.einsum("bux,bwx->buw", e2[:, 0], e2[:, 1])
        diag = jnp.einsum("bkvkw->bkvw", big.reshape(b, k, v, k, v))
        return diag / (ce * t)
    if form == "naive":
        theta, phi = e[..., 0, :, :], e[..., 1, :, :]
        return jnp.einsum("btvkc,btwkc->bkvw", theta, phi) / (ce * t)
    raise ValueError(f"unknown attention form {form!r}")


def adaptive_gcn_fused_dyn(x, a1, w):
    """Fold the K-subset aggregate+project into ONE per-sample
    (V*Cin, V*Cout) operator — the dynamic-adjacency analogue of
    `fused_static_operator`:

      y[b,t,(w,o)] = x[b,t,(v,c)] @ M[b],
      M[b][(v,c),(w,o)] = sum_k a1[b,k,v,w] * w[k,c,o]

    x reshapes (B,T,V,C) -> (B,T,V*C) for FREE (v,c are adjacent), the
    output reshapes back for free, and the GEMM contracts V*C (>= 128)
    instead of V=25 — no layout transposes and no sublane padding, at
    the price of (C*Co/ (K*C + ...)) extra FLOPs. Wins for small C;
    dispatch via 'hybrid'."""
    b, t, v, c = x.shape
    k, _, co = w.shape
    op = jnp.einsum("bkvw,kco->bvcwo", a1, w).reshape(b, v * c, v * co)
    y = jnp.einsum("btm,bmn->btn", x.reshape(b, t, v * c), op)
    return y.reshape(b, t, v, co)


# hybrid dispatch: fused_dyn's operator is (V*C, V*Co) per sample; cap
# its footprint so the big-channel blocks keep the packed two-GEMM form
_FUSED_DYN_MAX_OPERATOR = 1600 * 1600


def apply_gcn(x: jnp.ndarray, a1: jnp.ndarray, w: jnp.ndarray,
              formulation: str = "agg") -> jnp.ndarray:
    """Dispatch between GCN formulations. Full-train-step ranking on TPU
    (tools/bench_full_forms.py, batch 64, with the transposed logits):
    agg_packed 279 > agg ~248 > pf_packed 251 > pf 178 > custom 173
    seq/s. Isolated micro-benches rank differently (pf wins) — only the
    full step decides, because XLA's cross-op fusion dominates. Models
    default to 'agg_packed' for training and 'pf' at inference (fastest
    forward-only, 2.6x)."""
    if formulation == "pf":
        return _adaptive_gcn_fwd_impl(x, a1, w)
    if formulation == "custom":
        return adaptive_gcn(x, a1, w)
    if formulation == "agg":
        return adaptive_gcn_reference(x, a1, w)
    if formulation == "pf_packed":
        return adaptive_gcn_pf_packed(x, a1, w)
    if formulation == "agg_packed":
        return adaptive_gcn_agg_packed(x, a1, w)
    if formulation == "agg_packed2":
        return adaptive_gcn_agg_packed2(x, a1, w)
    if formulation == "agg_dp":
        return adaptive_gcn_agg_dp(x, a1, w)
    if formulation == "fused_dyn":
        return adaptive_gcn_fused_dyn(x, a1, w)
    if formulation in ("pallas", "pallas_hybrid"):
        # fused TPU kernels (ops/pallas/gcn_fused.py): 'pallas' = fwd+bwd
        # kernels, 'pallas_hybrid' = pallas fwd + tuned XLA cotangents.
        # Mosaic cannot lay out a minor-dim-3 dot operand (the C=3 entry
        # layer) — that layer's aggregation intermediate is 21x smaller
        # than the steady-state blocks', so it keeps the XLA form.
        # interpret mode keeps the path testable on CPU.
        if x.shape[-1] < 8:
            return adaptive_gcn_agg_packed(x, a1, w)
        from agcn_tpu.ops.pallas import gcn_fused

        fn = (gcn_fused.adaptive_gcn_pallas if formulation == "pallas"
              else gcn_fused.adaptive_gcn_pallas_hybrid)
        return fn(x, a1, w, jax.default_backend() == "cpu")
    if formulation == "hybrid":
        v, c = x.shape[-2], x.shape[-1]
        co = w.shape[-1]
        if (v * c) * (v * co) <= _FUSED_DYN_MAX_OPERATOR:
            return adaptive_gcn_fused_dyn(x, a1, w)
        return adaptive_gcn_agg_packed(x, a1, w)
    raise ValueError(f"unknown GCN formulation {formulation!r}")


def fused_static_operator(adj: jnp.ndarray, weights: jnp.ndarray,
                          ) -> jnp.ndarray:
    """Fold K-subset aggregation + per-subset 1x1 projections into one matmul.

    z = sum_k (x @ A_k) @ W_k  ==  x_flat @ M,
    M[(v,ci),(w,co)] = sum_k A_k[v,w] * W_k[ci,co]

    Args:
      adj: (K, V, V).
      weights: (K, Cin, Cout).
    Returns:
      (V*Cin, V*Cout) dense operator — a single large MXU matmul replaces
      K tiny V-by-V aggregations plus K projections.
    """
    k, v, _ = adj.shape
    _, ci, co = weights.shape
    m = jnp.einsum("kvw,kio->viwo", adj, weights)
    return m.reshape(v * ci, v * co)


def apply_fused_static(x: jnp.ndarray, operator: jnp.ndarray,
                       num_joints: int) -> jnp.ndarray:
    """Apply a fused (V*Cin, V*Cout) operator to (..., V, Cin) features."""
    *lead, v, ci = x.shape
    y = x.reshape(*lead, v * ci) @ operator
    return y.reshape(*lead, num_joints, -1)
