"""Attention layers: multi-head attention, transformer encoder blocks,
positional encodings.

Parity targets: reference model/layers/attention/multiheadattention.py
(forked nn.MultiheadAttention returning per-head weights, optional
relative position bias and alpha-scaling), model/layers/embedding/
{pos_embedding,rel_embedding}.py, and the TransformerEncoderLayerExt used
by the AAGCN v29-v37 and SGN v15 variants (torch
nn.TransformerEncoderLayer semantics with pre-LN option).

TPU notes: heads ride a leading batch-like axis so QK^T / AV are large
batched MXU matmuls; softmax and bias adds fuse into the matmul epilogues
under XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agcn_tpu.ops import initializers as init


class PositionalEncoding(nn.Module):
    """Learned (BERT-style) positional embedding
    (reference pos_embedding.py)."""

    max_len: int = 600

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        table = self.param("embedding", nn.initializers.normal(0.02),
                           (self.max_len, d))
        return x + table[: x.shape[1]][None]


class CosSinPositionalEncoding(nn.Module):
    """Fixed sinusoidal positional encoding (reference pos_embedding.py)."""

    max_len: int = 600

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        pos = np.arange(self.max_len)[:, None]
        div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
        table = np.zeros((self.max_len, d), np.float32)
        table[:, 0::2] = np.sin(pos * div)
        table[:, 1::2] = np.cos(pos * div[: (d + 1) // 2][:d // 2]) \
            if d % 2 else np.cos(pos * div)
        return x + jnp.asarray(table[: x.shape[1]])[None]


class RelPosEmb1D(nn.Module):
    """1D relative position bias via the skew trick
    (reference rel_embedding.py)."""

    max_len: int
    dim_head: int

    @nn.compact
    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        """q: (B, H, T, Dh) -> (B, H, T, T) relative logits."""
        t = q.shape[2]
        scale = self.dim_head ** -0.5
        emb = self.param("rel_pos_emb", nn.initializers.normal(0.02),
                         (2 * self.max_len - 1, self.dim_head))
        start = self.max_len - t
        rel = jnp.einsum("bhtd,rd->bhtr", q * scale,
                         emb[start:start + 2 * t - 1])
        # skew: (T, 2T-1) -> (T, T) absolute
        b, h = rel.shape[:2]
        pad = jnp.pad(rel, ((0, 0), (0, 0), (0, 0), (0, 1)))
        flat = pad.reshape(b, h, t * 2 * t)
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, t - 1)))
        final = flat.reshape(b, h, t + 1, 2 * t - 1)
        return final[:, :, :t, t - 1:]


class MultiheadAttention(nn.Module):
    """MHA returning per-head attention weights.

    torch nn.MultiheadAttention parameterization (packed in_proj,
    out_proj) so reference checkpoints transplant directly; optional
    relative position bias (reference multiheadattention.py:19-60).
    """

    num_heads: int
    dim: Optional[int] = None
    use_bias: bool = True
    rel_pos_len: int = 0
    rel_scale_q: bool = True  # reference fork applies q/sqrt(d) to the
    # rel-pos product too (multiheadattention.py:33-40); keep True
    dropout: float = 0.0  # attention-weight dropout at train time
    # (reference multiheadattention.py:57-58, p = layer dropout)

    @nn.compact
    def __call__(self, query, key=None, value=None,
                 mask: Optional[jnp.ndarray] = None,
                 additive_mask: Optional[jnp.ndarray] = None,
                 alpha: Optional[jnp.ndarray] = None,
                 global_attn: Optional[jnp.ndarray] = None,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        key = query if key is None else key
        value = key if value is None else value
        d = self.dim or query.shape[-1]
        h = self.num_heads
        dh = d // h
        assert dh * h == d

        in_w = self.param("in_proj_kernel", init.xavier_normal, (query.shape[-1], 3 * d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,)) \
            if self.use_bias else 0.0

        def proj(x, offset):
            w = in_w[:, offset * d:(offset + 1) * d]
            b = in_b[offset * d:(offset + 1) * d] if self.use_bias else 0.0
            y = x @ w + b
            bsz, t, _ = y.shape
            return y.reshape(bsz, t, self.num_heads, dh).transpose(0, 2, 1, 3)

        q = proj(query, 0)
        k = proj(key, 1)
        v = proj(value, 2)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh)
        if self.rel_pos_len:
            logits = logits + RelPosEmb1D(self.rel_pos_len, dh,
                                          name="rel_pos")(q)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        if additive_mask is not None:
            # torch attn_mask semantics: float mask ADDED to the logits
            # ((L, L) or (B, H, L, L)); -inf is clamped for softmax safety
            logits = logits + jnp.maximum(additive_mask, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        # post-softmax attention injection (reference forked MHA,
        # multiheadattention.py:49-54): the APPLIED weights are
        # softmax(..)*alpha + global_attn; the RETURNED weights stay the
        # plain softmax (attn_i in the reference)
        applied = attn
        if alpha is not None:
            applied = applied * alpha
        if global_attn is not None:
            applied = applied + global_attn
        if self.dropout > 0.0:
            # applied AFTER the alpha/global_attn injection, before the
            # AV matmul (reference multiheadattention.py:57-60)
            applied = nn.Dropout(self.dropout, deterministic=not train,
                                 name="attn_drop")(applied)
        out = jnp.einsum("bhqk,bhkd->bhqd", applied, v)
        bsz, _, t, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(bsz, t, d)
        out = nn.Dense(d, use_bias=self.use_bias,
                       kernel_init=init.xavier_normal,
                       name="out_proj")(out)
        return out, attn


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer semantics with pre-LN option
    (the AAGCN variants' TransformerEncoderLayerExt)."""

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    # v32's layers accidentally construct torch's TransformerEncoderLayer
    # with bias=False for the linears AND LayerNorms (positional-arg slip,
    # aagcn_v32.py:77-78); bias=False reproduces that
    bias: bool = True
    attn_bias: bool = True    # MHA in/out projection bias (the same slip
    # also strips it when the PLAIN torch MHA survives, as in v34's
    # non-v2/v3 modes)
    rel_pos_len: int = 0      # shared 1D relative position bias length

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 additive_mask: Optional[jnp.ndarray] = None,
                 alpha: Optional[jnp.ndarray] = None,
                 global_attn: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        act = nn.relu if self.activation == "relu" else nn.gelu

        def drop(y):
            if self.dropout > 0.0:
                return nn.Dropout(self.dropout,
                                  deterministic=not train)(y)
            return y

        # NOTE the reference's pre-norm variant REASSIGNS src = norm(src),
        # so the residual adds onto the normed tensor, not the raw input
        # (aagcn_v29.py:86-97 / v17's TransformerEncoderLayerExt) — kept
        # for checkpoint parity.
        LN = lambda name: nn.LayerNorm(use_bias=self.bias, name=name)
        if self.pre_norm:
            x = LN("norm1")(x)
        attn_out, attn = MultiheadAttention(
            self.num_heads, use_bias=self.attn_bias,
            rel_pos_len=self.rel_pos_len, dropout=self.dropout,
            name="self_attn")(
            x, additive_mask=additive_mask, alpha=alpha,
            global_attn=global_attn, train=train)
        x = x + drop(attn_out)
        if not self.pre_norm:
            x = LN("norm1")(x)

        if self.pre_norm:
            x = LN("norm2")(x)
        y = nn.Dense(self.dim_feedforward, use_bias=self.bias,
                     name="linear1")(x)
        y = drop(act(y))
        y = nn.Dense(x.shape[-1], use_bias=self.bias, name="linear2")(y)
        x = x + drop(y)
        if not self.pre_norm:
            x = LN("norm2")(x)
        return x, attn


class CrossAttention(nn.Module):
    """Cross-attention: queries from one stream attend over another
    (reference crossattention.py Attention with context)."""

    num_heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, q_tokens: jnp.ndarray, kv_tokens: jnp.ndarray
                 ) -> jnp.ndarray:
        d = self.num_heads * self.dim_head
        q = nn.Dense(d, use_bias=False, name="to_q")(q_tokens)
        k = nn.Dense(d, use_bias=False, name="to_k")(kv_tokens)
        v = nn.Dense(d, use_bias=False, name="to_v")(kv_tokens)

        def split(x):
            b, t, _ = x.shape
            return x.reshape(b, t, self.num_heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            / jnp.sqrt(self.dim_head), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        b, _, t, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(q_tokens.shape[-1], name="to_out")(out)


class CrossTransformer(nn.Module):
    """CrossViT-style dual-stream fusion (reference crossattention.py
    CrossTransformer): each stream's CLS token attends over the OTHER
    stream's patch tokens, then returns to its stream."""

    num_heads: int = 8
    dim_head: int = 64
    depth: int = 1

    @nn.compact
    def __call__(self, a_tokens: jnp.ndarray, b_tokens: jnp.ndarray):
        """a_tokens/b_tokens: (B, 1+T, D) sequences with CLS at index 0."""
        for i in range(self.depth):
            a_cls, a_rest = a_tokens[:, :1], a_tokens[:, 1:]
            b_cls, b_rest = b_tokens[:, :1], b_tokens[:, 1:]
            a_cls = a_cls + CrossAttention(
                self.num_heads, self.dim_head,
                name=f"a_attends_b{i + 1}")(
                nn.LayerNorm(name=f"norm_a{i + 1}")(a_cls),
                jnp.concatenate([a_cls, b_rest], axis=1))
            b_cls = b_cls + CrossAttention(
                self.num_heads, self.dim_head,
                name=f"b_attends_a{i + 1}")(
                nn.LayerNorm(name=f"norm_b{i + 1}")(b_cls),
                jnp.concatenate([b_cls, a_rest], axis=1))
            a_tokens = jnp.concatenate([a_cls, a_rest], axis=1)
            b_tokens = jnp.concatenate([b_cls, b_rest], axis=1)
        return a_tokens, b_tokens


class _ChannelNorm(nn.Module):
    """Normalize tokens (B, N, C) over the channel axis with BN or LN.

    'bn' reproduces the reference's Normalize wrapper
    (crossattention.py:37-43): transpose to (B, C, N), BatchNorm1d, back
    — i.e. per-channel statistics over (batch, tokens). Our BatchNorm
    already reduces over every leading axis, so no transpose is needed.
    """

    norm: str = "ln"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.norm == "bn":
            from agcn_tpu.ops.norm import BatchNorm

            return BatchNorm(name="norm")(x, train)
        return nn.LayerNorm(name="norm")(x)


class LucidAttention(nn.Module):
    """lucidrains-style attention (reference crossattention.py:104-198):
    separate bias-free q/k/v projections of `heads * dim_head`, an output
    projection to `output_dim` + dropout, and a residual branch that is a
    Linear whenever dims differ (or res_proj forces one). `dim` is the
    input feature size (known at init, as in torch)."""

    dim: int
    heads: int
    dim_head: int
    output_dim: int
    dropout: float = 0.0
    res_proj: bool = False

    def setup(self):
        inner = self.heads * self.dim_head
        dense = dict(kernel_init=init.torch_default_kernel)
        self.to_q = nn.Dense(inner, use_bias=False, name="to_q", **dense)
        self.to_k = nn.Dense(inner, use_bias=False, name="to_k", **dense)
        self.to_v = nn.Dense(inner, use_bias=False, name="to_v", **dense)
        self.to_out = nn.Dense(self.output_dim, name="to_out",
                               bias_init=init.torch_default_bias(inner),
                               **dense)
        self.out_drop = nn.Dropout(self.dropout, name="out_drop")
        if self.res_proj or self.dim != self.output_dim:
            self.residual = nn.Dense(
                self.output_dim, name="residual",
                kernel_init=init.torch_default_kernel,
                bias_init=init.torch_default_bias(self.dim))
        else:
            self.residual = None

    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, n, _ = x.shape

        def head_split(t):
            return t.reshape(b, n, self.heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = (head_split(p(x))
                   for p in (self.to_q, self.to_k, self.to_v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        out = self.out_drop(self.to_out(out), deterministic=not train)
        return out, attn

    def res(self, x: jnp.ndarray):
        return x if self.residual is None else self.residual(x)


class LucidFeedForward(nn.Module):
    """lucidrains FFN (crossattention.py:74-100): Linear -> act -> drop ->
    Linear(-> output_dim) -> drop, residual Linear when dims change."""

    dim: int
    hidden_dim: int
    output_dim: int = 0
    dropout: float = 0.0
    activation: str = "gelu"

    def setup(self):
        out_dim = self.output_dim or self.dim
        dense = dict(kernel_init=init.torch_default_kernel)
        self.linear1 = nn.Dense(
            self.hidden_dim, name="linear1",
            bias_init=init.torch_default_bias(self.dim), **dense)
        self.linear2 = nn.Dense(
            out_dim, name="linear2",
            bias_init=init.torch_default_bias(self.hidden_dim), **dense)
        self.drop = nn.Dropout(self.dropout)
        if self.dim != out_dim:
            self.residual = nn.Dense(
                out_dim, name="residual",
                kernel_init=init.torch_default_kernel,
                bias_init=init.torch_default_bias(self.dim))
        else:
            self.residual = None

    def __call__(self, x: jnp.ndarray, train: bool = False):
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        y = self.drop(act(self.linear1(x)), deterministic=not train)
        return self.drop(self.linear2(y), deterministic=not train)

    def res(self, x: jnp.ndarray):
        return x if self.residual is None else self.residual(x)


class LucidTransformer(nn.Module):
    """The reference's CrossViT-derived encoder (crossattention.py:202-304)
    used by SGN v15 and the transformer AAGCN variants' `norm` mode:
    per-layer dim lists, separate attention output dim (d_out) and FFN
    output dim (mlp_out_dim), pre- or post-norm with BN or LN channel
    normalization, optional global norm.

    forward (crossattention.py:297-304):
        x = attn(norm(x)) + attn.res(x)      # pre-norm shown
        x = ffn(norm(x)) + ffn.res(x)
    """

    depth: int
    dims: Tuple[int, ...]          # attention input dim per layer
    heads: Tuple[int, ...]
    dim_heads: Tuple[int, ...]
    mlp_dims: Tuple[int, ...]
    mlp_out_dims: Tuple[int, ...]
    out_dims: Tuple[int, ...]      # attention output dim per layer (d_out)
    dropouts: Tuple[float, ...]
    activation: str = "gelu"
    norm: str = "ln"
    global_norm: bool = True
    post_norm: bool = False
    res_proj: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        attn_list = []
        for i in range(self.depth):
            attn = LucidAttention(dim=self.dims[i], heads=self.heads[i],
                                  dim_head=self.dim_heads[i],
                                  output_dim=self.out_dims[i],
                                  dropout=self.dropouts[i],
                                  res_proj=self.res_proj,
                                  name=f"l{i + 1}_attn")
            ffn = LucidFeedForward(dim=self.out_dims[i],
                                   hidden_dim=self.mlp_dims[i],
                                   output_dim=self.mlp_out_dims[i],
                                   dropout=self.dropouts[i],
                                   activation=self.activation,
                                   name=f"l{i + 1}_ffn")
            if self.post_norm:
                y, a = attn(x, train)
                y = _ChannelNorm(self.norm, name=f"l{i + 1}_attn_norm")(
                    y, train)
                x = y + attn.res(x)
                x = _ChannelNorm(self.norm, name=f"l{i + 1}_ffn_norm")(
                    ffn(x, train), train) + ffn.res(x)
            else:
                y, a = attn(_ChannelNorm(
                    self.norm, name=f"l{i + 1}_attn_norm")(x, train), train)
                x = y + attn.res(x)
                x = ffn(_ChannelNorm(
                    self.norm, name=f"l{i + 1}_ffn_norm")(x, train),
                    train) + ffn.res(x)
            attn_list.append(a)
        if self.global_norm:
            x = _ChannelNorm(self.norm, name="global_norm")(x, train)
        return x, attn_list

    @staticmethod
    def from_mha_kwargs(kwargs, name: str) -> "LucidTransformer":
        """Build from the reference's *_mha_kwargs dict
        (sgn_v15.py:444-457): d_model/nhead/d_head/dim_feedforward/
        dim_feedforward_output as per-layer lists, d_out defaulting to
        d_model (crossattention.py:240)."""
        depth = kwargs["num_layers"]

        def as_list(v, default=None):
            v = kwargs.get(v, default)
            if isinstance(v, (int, float)):
                v = [v] * depth
            return tuple(v)

        dims = as_list("d_model")
        return LucidTransformer(
            depth=depth,
            dims=dims,
            heads=as_list("nhead"),
            dim_heads=as_list("d_head"),
            mlp_dims=as_list("dim_feedforward"),
            mlp_out_dims=as_list("dim_feedforward_output", 0),
            out_dims=as_list("d_out", kwargs["d_model"]),
            dropouts=as_list("dropout", 0.0),
            activation=kwargs.get("activation", "gelu"),
            norm=kwargs.get("norm", "ln"),
            global_norm=kwargs.get("global_norm", True),
            post_norm=kwargs.get("post_norm", False),
            res_proj=kwargs.get("res_proj", False),
            name=name)


class TransformerEncoder(nn.Module):
    """Stack of encoder layers; returns (output, [per-layer attention])."""

    num_layers: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False
    # v32's layers accidentally construct torch's TransformerEncoderLayer
    # with bias=False for the linears AND LayerNorms (positional-arg slip,
    # aagcn_v32.py:77-78); bias=False reproduces that
    bias: bool = True
    attn_bias: bool = True    # MHA in/out projection bias (the same slip
    # also strips it when the PLAIN torch MHA survives, as in v34's
    # non-v2/v3 modes)
    rel_pos_len: int = 0      # shared 1D relative position bias length
    pos_enc: Optional[str] = None  # None | 'abs' | 'cos'
    max_len: int = 600

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.pos_enc == "abs":
            x = PositionalEncoding(self.max_len, name="pos_enc")(x)
        elif self.pos_enc == "cos":
            x = CosSinPositionalEncoding(self.max_len, name="pos_enc")(x)
        attns = []
        for i in range(self.num_layers):
            x, a = TransformerEncoderLayer(
                self.num_heads, self.dim_feedforward, self.dropout,
                self.activation, self.pre_norm, bias=self.bias,
                attn_bias=self.attn_bias, rel_pos_len=self.rel_pos_len,
                name=f"layer{i + 1}")(x, train)
            attns.append(a)
        return x, attns
