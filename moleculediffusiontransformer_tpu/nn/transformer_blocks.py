"""Building blocks of the transformer model zoo
(reference `transformer.py:36-529,1251-1470,4798-4863` — parti-pytorch
lineage).

Distinct from `nn/attention.py` (the UNet's attention): this family uses
multi-query attention (single shared KV head), a learned null KV for
classifier-free guidance, gamma-only LayerNorm, and bias-free projections.

TPU-native decode: every attention module exposes a ``step``/``kv``
method pair so autoregressive generation runs as a ``lax.scan`` with
fixed-size KV caches (the reference re-runs the full prefix per token —
no cache, SURVEY §3.4).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .embeddings import positional_encoding_1d
from .primitives import Dense, Dtype, GroupNorm, gelu, mm_precision

NEG_INF = -jnp.finfo(jnp.float32).max


# ------------------------------------------------------------- sampling ----

def log_eps(t: jax.Array, eps: float = 1e-20) -> jax.Array:
    return jnp.log(t + eps)


def gumbel_noise(key: jax.Array, shape) -> jax.Array:
    u = jax.random.uniform(key, shape)
    return -log_eps(-log_eps(u))


def gumbel_sample(key: jax.Array, logits: jax.Array,
                  temperature: float = 1.0, axis: int = -1) -> jax.Array:
    """Gumbel-max sampling (reference `transformer.py:43-44`)."""
    return jnp.argmax(logits / temperature + gumbel_noise(key, logits.shape),
                      axis=axis)


def top_k_filter(logits: jax.Array, thres: float = 0.9) -> jax.Array:
    """Keep the top ``(1-thres)`` fraction of the vocab, -inf the rest
    (reference `transformer.py:46-52`)."""
    num_logits = logits.shape[-1]
    k = max(int((1 - thres) * num_logits), 1)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def prob_mask_like(key: jax.Array, shape, prob: float) -> jax.Array:
    """CFG keep-mask (reference `transformer.py:56-62`)."""
    if prob == 1:
        return jnp.ones(shape, bool)
    if prob == 0:
        return jnp.zeros(shape, bool)
    return jax.random.uniform(key, shape) < prob


# ---------------------------------------------------------------- norms ----

class LNGamma(nn.Module):
    """LayerNorm with learned gamma and a fixed zero beta
    (reference `transformer.py:66-73`).  Param 'gamma'."""
    dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)
                * gamma).astype(self.dtype)


class TorchLayerNorm(nn.Module):
    """Standard affine LayerNorm with torch names (weight->scale, bias)."""
    dtype: Dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps) * scale
                + bias).astype(self.dtype)


# ---------------------------------------------------------- feedforward ----

def feed_forward_parti(x: jax.Array, dim: int, mult: int = 4, *,
                       name: str, dtype: Dtype = jnp.float32) -> jax.Array:
    """LN -> Linear -> GELU -> LN -> Linear, all bias-free
    (reference `transformer.py:104-112`).  Child names follow the torch
    Sequential: {name}_0 LN, {name}_1 Linear, {name}_3 LN, {name}_4 Linear."""
    hidden = int(dim * mult)
    x = LNGamma(dtype=dtype, name=f"{name}_0")(x)
    x = Dense(hidden, use_bias=False, dtype=dtype, name=f"{name}_1")(x)
    x = gelu(x)
    x = LNGamma(dtype=dtype, name=f"{name}_3")(x)
    return Dense(dim, use_bias=False, dtype=dtype, name=f"{name}_4")(x)


def relu_squared(x: jax.Array) -> jax.Array:
    return jnp.square(jax.nn.relu(x))


class GLU(nn.Module):
    """Gated linear unit (reference `transformer.py:120-128`)."""
    dim_out: int
    activation: Any = gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xg = Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * self.activation(gate)


class _DepthwiseKernel(nn.Module):
    """Holds the depthwise kernel under the torch child name 'ds_conv'.
    Param 'kernel' (k, 1, c) — matches torch Conv1d(groups=c) weight
    (c, 1, k) under the standard (2,1,0) conversion."""
    kernel_size: int

    @nn.compact
    def __call__(self, channels: int) -> jax.Array:
        bound = 1.0 / math.sqrt(self.kernel_size)  # torch fan_in = 1*k

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return self.param("kernel", init, (self.kernel_size, 1, channels))


class CausalDSConv(nn.Module):
    """Causal depthwise conv over (b, n, c)
    (reference `transformer.py:131-145`): left-pad (k-1)*dilation, groups=c.
    Lowered as k shift-multiply-adds — pure VPU elementwise work, exact
    fp32, no conv op."""
    kernel_size: int = 3
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        k = self.kernel_size
        kernel = _DepthwiseKernel(k, name="ds_conv")(c)   # (k, 1, c)
        length = x.shape[1]
        pad = (k - 1) * self.dilation
        x = jnp.pad(x.astype(self.dtype), ((0, 0), (pad, 0), (0, 0)))
        out = jnp.zeros_like(x[:, :length])
        for w in range(k):
            out = out + x[:, w * self.dilation:
                          w * self.dilation + length] * kernel[w, 0]
        return out


class FeedForwardCNN(nn.Module):
    """FF with optional GLU and causal depthwise-conv resnet sandwiches
    (reference `FeedForward_CNN`, `transformer.py:146-235`)."""
    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = False
    swish: bool = False
    use_relu_squared: bool = False
    conv_kernel_ff: int = 0
    ff_inner_conv: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.dim * self.mult)
        dim_out = self.dim_out if self.dim_out is not None else self.dim
        act = (relu_squared if self.use_relu_squared
               else jax.nn.silu if self.swish else gelu)

        if self.conv_kernel_ff > 0:
            h = CausalDSConv(self.conv_kernel_ff, dtype=self.dtype,
                             name="resnetblock1_0")(x)
            h = act(h)
            h = CausalDSConv(self.conv_kernel_ff, dtype=self.dtype,
                             name="resnetblock1_2")(h)
            x = h + x

        if self.glu:
            x = GLU(inner, activation=act, dtype=self.dtype,
                    name="project_in")(x)
        else:
            x = Dense(inner, dtype=self.dtype, name="project_in_0")(x)
            x = act(x)

        if self.ff_inner_conv > 0:
            h = CausalDSConv(self.ff_inner_conv, dtype=self.dtype,
                             name="inner_conv_resnetblock1_0")(x)
            h = act(h)
            h = CausalDSConv(self.ff_inner_conv, dtype=self.dtype,
                             name="inner_conv_resnetblock1_2")(h)
            x = h + x

        x = Dense(dim_out, dtype=self.dtype, name="ff_2")(x)

        if self.conv_kernel_ff > 0:
            h = CausalDSConv(self.conv_kernel_ff, dtype=self.dtype,
                             name="resnetblock2_0")(x)
            h = act(h)
            h = CausalDSConv(self.conv_kernel_ff, dtype=self.dtype,
                             name="resnetblock2_2")(h)
            x = h + x
        return x


# ------------------------------------------------------------ attention ----

def packed_shared_kv_sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: Optional[jax.Array],
                          dtype: Dtype) -> Optional[jax.Array]:
    """Block-diagonal MXU packing for the multi-query attention cores.

    In cached decode the per-batch GEMM is (h*n, d) x (d, j) with h*n as
    small as 8 — a sliver of one 128x128 MXU pass.  Packing G = 128//(h*n)
    batch elements into one ((G*h*n), d) x (d, (G*j)) product and masking
    to the pack diagonal computes EXACTLY the same attention (masked
    entries are exp(-inf) = 0 and contribute exact zeros to the PV
    contraction) while MXU passes drop ~G-fold.  Same trick as
    ``nn.attention.packed_sdpa`` (2.05x per UNet layer, PERF.md), extended
    to the shared-KV layout where kv has no head axis.

    q (b, h, n, d); k, v (b, j, d); mask (b, 1, n, j) True=keep.
    Returns (b, h, n, d), or None when packing would not help (caller
    falls back to the plain batched einsum).
    """
    b, h, n, d = q.shape
    j = k.shape[1]
    rows = h * n
    g = math.gcd(max(1, 128 // rows), b)
    if g <= 1:
        return None
    prec = mm_precision(dtype)
    bg = b // g
    q2 = q.reshape(bg, g * rows, d)
    k2 = k.reshape(bg, g * j, d)
    v2 = v.reshape(bg, g * j, d)
    sim = jnp.einsum("gRd,gJd->gRJ", q2, k2,
                     preferred_element_type=jnp.float32, precision=prec)
    row_pack = np.repeat(np.arange(g), rows)
    col_pack = np.repeat(np.arange(g), j)
    big = jnp.asarray(row_pack[:, None] == col_pack[None, :])  # (gR, gJ)
    big = jnp.broadcast_to(big[None], (bg,) + big.shape)
    if mask is not None:
        m = jnp.broadcast_to(mask, (b, 1, n, j))[:, 0]         # (b, n, j)
        m = jnp.tile(m, (1, h, 1)).reshape(bg, g, rows, j)
        # one-shot block-diagonal scatter: entry [b, gi*rows+r, gj*j+c] is
        # m[b, gi, r, c] & (gi == gj) — diagonal blocks carry the user mask,
        # off-diagonal blocks are False (subsumes the pack-diagonal `big`)
        eye = jnp.eye(g, dtype=bool)
        big = (m[:, :, :, None, :]
               & eye[None, :, None, :, None]).reshape(bg, g * rows, g * j)
    sim = jnp.where(big, sim, NEG_INF)
    att = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
    out = jnp.einsum("gRJ,gJd->gRd", att.astype(dtype), v2,
                     preferred_element_type=dtype, precision=prec)
    return out.reshape(b, h, n, d)

class RelPosBias2d(nn.Module):
    """2-D relative bias (parti heritage, reference `transformer.py:77-100`);
    unused by the molecule models but kept for API parity."""
    size: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, i: int, j: int) -> jax.Array:
        size = self.size
        table = self.param("pos_bias", nn.initializers.normal(1.0),
                           ((2 * size - 1) ** 2, self.heads))
        pos = np.stack(np.meshgrid(np.arange(size), np.arange(size),
                                   indexing="ij"), axis=-1).reshape(-1, 2)
        rel = pos[:, None] - pos[None, :] + size - 1
        idx = rel[..., 0] * (2 * size - 1) + rel[..., 1]
        bias = jnp.take(table, jnp.asarray(idx[:i, :j - 1]), axis=0)
        bias = jnp.transpose(bias, (2, 0, 1))
        return jnp.pad(bias, ((0, 0), (0, 0), (j - bias.shape[-1], 0)))


class MQAttention(nn.Module):
    """Multi-query attention with a single shared KV projection that serves
    as both keys AND values, plus a learned null KV prepended for CFG
    (reference `Attention`, `transformer.py:239-335`).

    q is scaled before the QK product; softmax in fp32; causal masking uses
    ``triu(j - i + 1)`` offset so the null position is always visible.
    """
    dim: int
    context_dim: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    norm_context: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.dim_head
        self.norm = LNGamma(dtype=self.dtype)
        if self.norm_context:
            self.norm_context_mod = LNGamma(dtype=self.dtype)
        self.to_q_1 = Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_kv_1 = Dense(self.dim_head, use_bias=False, dtype=self.dtype)
        self.to_out_1 = Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.to_out_2 = LNGamma(dtype=self.dtype)
        self.null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                                  (self.dim_head,))

    def kv(self, context: jax.Array) -> jax.Array:
        """Project context to the shared KV track and prepend the null KV.
        Returns (b, 1 + m, dim_head)."""
        if self.norm_context:
            context = self.norm_context_mod(context)
        kv = self.to_kv_1(context)
        null = jnp.broadcast_to(self.null_kv[None, None].astype(kv.dtype),
                                (kv.shape[0], 1, self.dim_head))
        return jnp.concatenate([null, kv], axis=1)

    def _attend(self, q: jax.Array, kv: jax.Array,
                mask: Optional[jax.Array]) -> jax.Array:
        """q (b, h, n, d); kv (b, j, d); mask (b, 1, n, j) True=keep."""
        out = packed_shared_kv_sdpa(q, kv, kv, mask, self.dtype)
        if out is None:
            sim = jnp.einsum("bhnd,bjd->bhnj", q, kv,
                             preferred_element_type=jnp.float32,
                             precision=mm_precision(self.dtype))
            if mask is not None:
                sim = jnp.where(mask, sim, NEG_INF)
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhnj,bjd->bhnd", attn.astype(self.dtype), kv,
                             preferred_element_type=self.dtype,
                             precision=mm_precision(self.dtype))
        b, h, n, d = out.shape
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)
        return self.to_out_2(self.to_out_1(out))

    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None,
                 context_mask: Optional[jax.Array] = None) -> jax.Array:
        b, n, _ = x.shape
        x = self.norm(x)
        q = self.to_q_1(x) * (self.dim_head ** -0.5)
        q = jnp.transpose(q.reshape(b, n, self.heads, self.dim_head),
                          (0, 2, 1, 3))
        kv = self.kv(context if context is not None else x)
        j = kv.shape[1]
        mask = None
        if context_mask is not None:
            cm = jnp.pad(context_mask, ((0, 0), (1, 0)),
                         constant_values=True)
            mask = cm[:, None, None, :]
        if self.causal:
            causal = ~jnp.triu(jnp.ones((n, j), bool), k=j - n + 1)
            causal = causal[None, None]
            mask = causal if mask is None else (mask & causal)
        return self._attend(q, kv, mask)

    def step(self, x_t: jax.Array, cache: jax.Array, pos: jax.Array
             ) -> Tuple[jax.Array, jax.Array]:
        """One causal decode step with a fixed-size KV cache.

        x_t (b, 1, dim) — current position (pre-norm applied here);
        cache (b, T, dim_head) — shared KV cache; pos scalar index.
        Returns (out (b, 1, dim), updated cache).
        """
        b = x_t.shape[0]
        x_t = self.norm(x_t)
        q = self.to_q_1(x_t) * (self.dim_head ** -0.5)
        q = jnp.transpose(q.reshape(b, 1, self.heads, self.dim_head),
                          (0, 2, 1, 3))
        kv_t = self.to_kv_1(x_t)[:, 0]                    # (b, d)
        cache = jax.lax.dynamic_update_index_in_dim(cache, kv_t, pos, axis=1)
        null = jnp.broadcast_to(self.null_kv[None, None].astype(kv_t.dtype),
                                (b, 1, self.dim_head))
        kv = jnp.concatenate([null, cache], axis=1)       # (b, 1+T, d)
        t_idx = jnp.arange(cache.shape[1])
        mask = jnp.pad(t_idx <= pos, (1, 0), constant_values=True)
        mask = mask[None, None, None, :]
        return self._attend(q, kv, mask), cache

    def cross_step(self, x_t: jax.Array, kv: jax.Array,
                   context_mask: Optional[jax.Array]) -> jax.Array:
        """Cross-attention decode step against precomputed ``kv`` (from
        :meth:`kv`, already null-prepended).  context_mask (b, m)."""
        b = x_t.shape[0]
        x_t = self.norm(x_t)
        q = self.to_q_1(x_t) * (self.dim_head ** -0.5)
        q = jnp.transpose(q.reshape(b, 1, self.heads, self.dim_head),
                          (0, 2, 1, 3))
        mask = None
        if context_mask is not None:
            cm = jnp.pad(context_mask, ((0, 0), (1, 0)), constant_values=True)
            mask = cm[:, None, None, :]
        return self._attend(q, kv, mask)


class GCNLayer(nn.Module):
    """Dense-adjacency GCN layer (reference `transformer.py:4798-4824`):
    ``adj @ proj(x) / num_neighbors``."""
    c_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, node_feats: jax.Array,
                 adj_matrix: jax.Array) -> jax.Array:
        num_neighbours = jnp.sum(adj_matrix, axis=-1, keepdims=True)
        node_feats = Dense(self.c_out, dtype=self.dtype,
                           name="projection")(node_feats)
        node_feats = jnp.einsum("bij,bjc->bic", adj_matrix, node_feats,
                                preferred_element_type=self.dtype,
                                precision=mm_precision(self.dtype))
        return node_feats / num_neighbours


class GraphConvLayers(nn.Module):
    """Stack of GCNLayers + output Linear (reference
    `transformer.py:4826-4863`).  Dropout(0.1) before the output linear is
    train-time only (deterministic flag)."""
    hidden_channels: int
    num_node_features_out: int
    depth: int
    have_skip: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, adj_matrix: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        for i in range(self.depth):
            h = GCNLayer(self.hidden_channels, dtype=self.dtype,
                         name=f"layers_{i}")(x, adj_matrix)
            x = gelu(h + x * (1.0 if self.have_skip else 0.0))
        if not deterministic:
            x = nn.Dropout(rate=0.1, deterministic=False)(x)
        return Dense(self.num_node_features_out, dtype=self.dtype,
                     name="lin")(x)


class AttentionQKV(nn.Module):
    """Attention with separate q/k/v projections, optional multi-query
    (one KV head), optional null KV, optional dense-GCN message passing on
    the post-softmax attention matrix (reference `transformer.py:1251-1470`).
    """
    dim: int
    context_dim: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    norm_context: bool = False
    one_kv_head: bool = True
    use_null_kv: bool = True
    gnn_layers: int = 0
    gnn_have_skip: bool = True
    gnn_att_threshold_min: float = 0.0
    gnn_att_threshold_max: float = 1.0
    gnn_add_identity: bool = True
    gnn_clamp_att_after_identity: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.dim_head
        k_dim = v_dim = self.dim_head if self.one_kv_head else inner
        out_dim = (self.dim_head * self.heads if self.one_kv_head else inner)
        self.norm = LNGamma(dtype=self.dtype)
        if self.norm_context:
            self.norm_context_mod = LNGamma(dtype=self.dtype)
        self.to_q_1 = Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_k_1 = Dense(k_dim, use_bias=False, dtype=self.dtype)
        self.to_v_1 = Dense(v_dim, use_bias=False, dtype=self.dtype)
        self.to_out_1 = Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.to_out_2 = LNGamma(dtype=self.dtype)
        self.null_k = self.param("null_k", nn.initializers.normal(1.0),
                                 (k_dim,))
        self.null_v = self.param("null_v", nn.initializers.normal(1.0),
                                 (v_dim,))
        if self.gnn_layers > 0:
            self.GNN_net = GraphConvLayers(
                hidden_channels=self.dim_head,
                num_node_features_out=self.dim_head,
                depth=self.gnn_layers, have_skip=self.gnn_have_skip,
                dtype=self.dtype)

    def kv(self, context: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.norm_context:
            context = self.norm_context_mod(context)
        b = context.shape[0]
        k, v = self.to_k_1(context), self.to_v_1(context)
        if self.use_null_kv:
            nk = jnp.broadcast_to(self.null_k[None, None].astype(k.dtype),
                                  (b, 1, k.shape[-1]))
            nv = jnp.broadcast_to(self.null_v[None, None].astype(v.dtype),
                                  (b, 1, v.shape[-1]))
            k = jnp.concatenate([nk, k], axis=1)
            v = jnp.concatenate([nv, v], axis=1)
        return k, v

    def _attend(self, q, k, v, mask):
        """q (b,h,n,d); one_kv_head: k/v (b,j,d) else (b,h,j,d)."""
        if self.one_kv_head and self.gnn_layers == 0:
            packed = packed_shared_kv_sdpa(q, k, v, mask, self.dtype)
            if packed is not None:
                b, h, n, d = packed.shape
                out = jnp.transpose(packed, (0, 2, 1, 3)).reshape(b, n,
                                                                  h * d)
                return self.to_out_2(self.to_out_1(out))
        eq_in = "bjd" if self.one_kv_head else "bhjd"
        sim = jnp.einsum(f"bhnd,{eq_in}->bhnj", q, k,
                         preferred_element_type=jnp.float32,
                         precision=mm_precision(self.dtype))
        if mask is not None:
            sim = jnp.where(mask, sim, NEG_INF)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        out = jnp.einsum(f"bhnj,{eq_in}->bhnd", attn.astype(self.dtype), v,
                         preferred_element_type=self.dtype,
                         precision=mm_precision(self.dtype))

        if self.gnn_layers > 0:
            # attention matrix as dense adjacency over v node features
            # (reference `transformer.py:1418-1461`; requires square attn,
            # i.e. self-attention without null kv)
            b, h, n, j = attn.shape
            adj = attn.reshape(b * h, n, j).astype(self.dtype)
            if self.gnn_add_identity:
                adj = adj + jnp.eye(n, j, dtype=adj.dtype)[None]
                if self.gnn_clamp_att_after_identity:
                    adj = jnp.clip(adj, 0.0, 1.0)
            if self.gnn_att_threshold_min > 0:
                adj = jnp.where(adj < self.gnn_att_threshold_min, 0.0, adj)
            if self.gnn_att_threshold_max < 1:
                adj = jnp.where(adj > self.gnn_att_threshold_max, 1.0, adj)
            if self.one_kv_head:
                v_nodes = jnp.broadcast_to(v[:, None], (b, h) + v.shape[1:])
            else:
                v_nodes = v
            v_nodes = v_nodes.reshape(b * h, j, -1)
            gnn_out = self.GNN_net(v_nodes, adj)
            out = out + gnn_out.reshape(b, h, j, -1)[:, :, :n]

        b, h, n, d = out.shape
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)
        return self.to_out_2(self.to_out_1(out))

    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None,
                 context_mask: Optional[jax.Array] = None) -> jax.Array:
        b, n, _ = x.shape
        x = self.norm(x)
        q = self.to_q_1(x) * (self.dim_head ** -0.5)
        q = jnp.transpose(q.reshape(b, n, self.heads, self.dim_head),
                          (0, 2, 1, 3))
        k, v = self.kv(context if context is not None else x)
        if not self.one_kv_head:
            j = k.shape[1]
            k = jnp.transpose(k.reshape(b, j, self.heads, self.dim_head),
                              (0, 2, 1, 3))
            v = jnp.transpose(v.reshape(b, j, self.heads, self.dim_head),
                              (0, 2, 1, 3))
        j = k.shape[-2] if not self.one_kv_head else k.shape[1]
        mask = None
        if context_mask is not None:
            cm = context_mask
            if self.use_null_kv:
                cm = jnp.pad(cm, ((0, 0), (1, 0)), constant_values=True)
            mask = cm[:, None, None, :]
        if self.causal:
            causal = ~jnp.triu(jnp.ones((n, j), bool), k=j - n + 1)
            causal = causal[None, None]
            mask = causal if mask is None else (mask & causal)
        return self._attend(q, k, v, mask)

    def step(self, x_t: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
             pos: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Causal decode step with fixed-size caches (one_kv_head layout:
        caches (b, T, dim_head))."""
        assert self.one_kv_head, "cached decode implemented for MQA layout"
        b = x_t.shape[0]
        x_t = self.norm(x_t)
        q = self.to_q_1(x_t) * (self.dim_head ** -0.5)
        q = jnp.transpose(q.reshape(b, 1, self.heads, self.dim_head),
                          (0, 2, 1, 3))
        k_t = self.to_k_1(x_t)[:, 0]
        v_t = self.to_v_1(x_t)[:, 0]
        k_cache = jax.lax.dynamic_update_index_in_dim(k_cache, k_t, pos, 1)
        v_cache = jax.lax.dynamic_update_index_in_dim(v_cache, v_t, pos, 1)
        k, v = k_cache, v_cache
        t_idx = jnp.arange(k_cache.shape[1])
        mask = t_idx <= pos
        if self.use_null_kv:
            nk = jnp.broadcast_to(self.null_k[None, None].astype(k.dtype),
                                  (b, 1, k.shape[-1]))
            nv = jnp.broadcast_to(self.null_v[None, None].astype(v.dtype),
                                  (b, 1, v.shape[-1]))
            k = jnp.concatenate([nk, k], axis=1)
            v = jnp.concatenate([nv, v], axis=1)
            mask = jnp.pad(mask, (1, 0), constant_values=True)
        return (self._attend(q, k, v, mask[None, None, None, :]),
                k_cache, v_cache)
