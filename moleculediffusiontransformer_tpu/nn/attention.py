"""Attention and transformer blocks inside the UNet
(reference `modules.py:265-524`).

Channels-last; softmax in fp32.  The attention math is expressed so XLA can
fuse the whole block; a Pallas flash-attention kernel can be swapped in via
``ops.attention`` for long sequences (QM9 lengths are 8-64, where the fused
XLA einsum path is already MXU-bound).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .primitives import (Conv1d, Dense, Dtype, GroupNorm, LayerNorm,
                         gelu, mm_precision)


def relative_position_bucket(relative_position: np.ndarray, num_buckets: int,
                             max_distance: int) -> np.ndarray:
    """T5 bucketing (reference `modules.py:273-297`).  Host-side numpy —
    positions are static under jit."""
    num_buckets //= 2
    ret = (relative_position >= 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = (max_exact
                    + (np.log(np.maximum(n, 1).astype(np.float32) / max_exact)
                       / math.log(max_distance / max_exact)
                       * (num_buckets - max_exact)).astype(np.int64))
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """T5-style bucketed relative bias (reference `modules.py:265-311`)."""
    num_buckets: int
    max_distance: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, num_queries: int, num_keys: int) -> jax.Array:
        i, j = num_queries, num_keys
        q_pos = np.arange(j - i, j, dtype=np.int64)
        k_pos = np.arange(j, dtype=np.int64)
        rel_pos = k_pos[None, :] - q_pos[:, None]
        buckets = relative_position_bucket(rel_pos, self.num_buckets,
                                           self.max_distance)
        from .primitives import Embed
        bias = Embed(self.num_buckets, self.num_heads, dtype=jnp.float32,
                     name="relative_attention_bias")(
            jnp.asarray(buckets))                             # (i, j, h)
        return jnp.transpose(bias, (2, 0, 1))[None].astype(self.dtype)


def feed_forward(x: jax.Array, features: int, multiplier: int,
                 name: str = "feed_forward",
                 dtype: Dtype = jnp.float32) -> jax.Array:
    """Linear-GELU-Linear (reference `modules.py:314-320`); inlined with
    torch-Sequential child names ``{name}_0`` / ``{name}_2``."""
    x = Dense(features * multiplier, dtype=dtype, name=f"{name}_0")(x)
    x = gelu(x)
    return Dense(features, dtype=dtype, name=f"{name}_2")(x)


def packed_sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                dtype: Dtype) -> jax.Array:
    """Scaled-dot-product attention with MXU block-diagonal packing.

    At this framework's sequence lengths (4-64) each (batch, head) GEMM is a
    16x64x16-class matrix that occupies a fraction of one 128x128 MXU pass.
    Packing G = 128//max(n, m) head-batches into one (G*n, d) x (d, G*m)
    product and masking to the block diagonal cuts MXU passes by G while
    computing EXACTLY the same attention (masked entries are exp(-inf)=0 and
    contribute exact zeros to the PV contraction).  Falls back to the plain
    batched einsum when packing doesn't divide.

    q, k, v: (b, h, n|m, d) -> (b, h, n, d).
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    g = math.gcd(max(1, 128 // max(n, m)), bh)
    prec = mm_precision(dtype)

    if g <= 1:
        from ..ops.flash_attention import (LONG_SEQ_THRESHOLD, _on_tpu,
                                           flash_attention, flash_enabled,
                                           flash_interpret)
        interp = flash_interpret()
        if (flash_enabled() and (_on_tpu() or interp)
                and min(n, m) >= LONG_SEQ_THRESHOLD
                and n % 128 == 0 and m % 128 == 0):
            # audio-lineage long sequences: stream K/V blockwise (forward
            # and backward Pallas kernels) instead of materializing the
            # (n, m) score matrix in HBM
            out = flash_attention(q.reshape(bh, n, d), k.reshape(bh, m, d),
                                  v.reshape(bh, m, d), scale=scale,
                                  interpret=interp)
            return out.reshape(b, h, n, d)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32,
                         precision=prec) * scale
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(dtype), v,
                          preferred_element_type=dtype, precision=prec)

    q2 = q.reshape(bh // g, g * n, d)
    k2 = k.reshape(bh // g, g * m, d)
    v2 = v.reshape(bh // g, g * m, d)
    sim = jnp.einsum("gnd,gmd->gnm", q2, k2,
                     preferred_element_type=jnp.float32,
                     precision=prec) * scale
    block_q = np.repeat(np.arange(g), n)
    block_k = np.repeat(np.arange(g), m)
    mask = jnp.asarray(block_q[:, None] == block_k[None, :])
    sim = jnp.where(mask[None], sim, -jnp.inf)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
    out = jnp.einsum("gnm,gmd->gnd", attn.astype(dtype), v2,
                     preferred_element_type=dtype, precision=prec)
    return out.reshape(b, h, n, d)


class AttentionBase(nn.Module):
    """Multi-head SDPA core + output projection
    (reference `modules.py:323-364`).  Note the reference adds the relative
    bias BEFORE applying the 1/sqrt(d) scale; mirrored exactly."""
    features: int
    head_features: int
    num_heads: int
    use_rel_pos: bool = False
    rel_pos_num_buckets: Optional[int] = None
    rel_pos_max_distance: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        b, n, _ = q.shape
        m = k.shape[1]
        h, d = self.num_heads, self.head_features

        def split_heads(t):
            return jnp.transpose(t.reshape(b, -1, h, d), (0, 2, 1, 3))

        q, k, v = map(split_heads, (q, k, v))
        if self.use_rel_pos:
            sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                             preferred_element_type=jnp.float32,
                             precision=mm_precision(self.dtype))
            sim = sim + RelativePositionBias(
                self.rel_pos_num_buckets, self.rel_pos_max_distance,
                h, dtype=jnp.float32, name="rel_pos")(n, m)
            sim = sim * (d ** -0.5)
            attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v,
                             preferred_element_type=self.dtype,
                             precision=mm_precision(self.dtype))
        else:
            out = packed_sdpa(q, k, v, d ** -0.5, self.dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, h * d)
        return Dense(self.features, dtype=self.dtype, name="to_out")(out)


class Attention(nn.Module):
    """Pre-LN attention with fused KV projection; cross-attention when
    ``context_features`` is set (reference `modules.py:367-410`)."""
    features: int
    head_features: int
    num_heads: int
    context_features: Optional[int] = None
    use_rel_pos: bool = False
    rel_pos_num_buckets: Optional[int] = None
    rel_pos_max_distance: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 context: Optional[jax.Array] = None) -> jax.Array:
        assert not (self.context_features and context is None), \
            "You must provide a context when using context_features"
        context = context if context is not None else x
        mid = self.head_features * self.num_heads
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        context = LayerNorm(dtype=self.dtype, name="norm_context")(context)
        q = Dense(mid, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = Dense(mid * 2, use_bias=False, dtype=self.dtype,
                   name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        return AttentionBase(self.features, head_features=self.head_features,
                             num_heads=self.num_heads,
                             use_rel_pos=self.use_rel_pos,
                             rel_pos_num_buckets=self.rel_pos_num_buckets,
                             rel_pos_max_distance=self.rel_pos_max_distance,
                             dtype=self.dtype, name="attention")(q, k, v)


class TransformerBlock(nn.Module):
    """Self-attn [+ cross-attn] + FF, all residual
    (reference `modules.py:418-461`)."""
    features: int
    num_heads: int
    head_features: int
    multiplier: int
    use_rel_pos: bool = False
    rel_pos_num_buckets: Optional[int] = None
    rel_pos_max_distance: Optional[int] = None
    context_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 context: Optional[jax.Array] = None) -> jax.Array:
        use_cross = (self.context_features is not None
                     and self.context_features > 0)
        x = Attention(self.features, head_features=self.head_features,
                      num_heads=self.num_heads, use_rel_pos=self.use_rel_pos,
                      rel_pos_num_buckets=self.rel_pos_num_buckets,
                      rel_pos_max_distance=self.rel_pos_max_distance,
                      dtype=self.dtype, name="attention")(x) + x
        if use_cross:
            x = Attention(self.features, head_features=self.head_features,
                          num_heads=self.num_heads,
                          context_features=self.context_features,
                          use_rel_pos=self.use_rel_pos,
                          rel_pos_num_buckets=self.rel_pos_num_buckets,
                          rel_pos_max_distance=self.rel_pos_max_distance,
                          dtype=self.dtype,
                          name="cross_attention")(x, context=context) + x
        x = feed_forward(x, self.features, self.multiplier,
                         dtype=self.dtype) + x
        return x


class Transformer1d(nn.Module):
    """Stack of TransformerBlocks wrapped in GroupNorm(32, eps 1e-6) + 1x1
    convs (reference `modules.py:469-524`).  Channels-last makes the
    reference's b c t <-> b t c transposes no-ops here.

    When ``ops.transformer_fusion.enable_fusion()`` is on (and the config
    is fusable), the WHOLE stack executes as one Pallas megakernel —
    identical param tree, same math, one HBM round-trip (see that module's
    docstring for the measured rationale).  ``disable_fusion`` pins this
    instance to the reference composition (used for the fused path's
    backward and for parity tests)."""
    num_layers: int
    channels: int
    num_heads: int
    head_features: int
    multiplier: int
    use_rel_pos: bool = False
    rel_pos_num_buckets: Optional[int] = None
    rel_pos_max_distance: Optional[int] = None
    context_features: Optional[int] = None
    dtype: Dtype = jnp.float32
    disable_fusion: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 context: Optional[jax.Array] = None) -> jax.Array:
        from ..ops import transformer_fusion as tf
        if (tf.fusion_enabled() and not self.disable_fusion
                and not self.is_initializing()
                and tf.fusable(x, context, self.use_rel_pos,
                               self.context_features, dtype=self.dtype,
                               num_layers=self.num_layers,
                               heads=self.num_heads,
                               head_dim=self.head_features,
                               multiplier=self.multiplier)):
            ctx = None if not self.context_features else context
            kw = dict(num_layers=self.num_layers, heads=self.num_heads,
                      head_dim=self.head_features,
                      multiplier=self.multiplier,
                      context_features=self.context_features)
            if (ctx is not None and tf.cfg_null_half_active()
                    and x.shape[0] % 2 == 0 and x.shape[0] >= 2):
                # batched CFG: [conditioned; null] halves, and the null
                # half's context is one shared FixedEmbedding table —
                # run it through the dense shared-KV kernel variant.
                # The uniformity is VERIFIED at runtime (the flag is a
                # process-global set by cfg_forward; a future caller whose
                # null half is NOT batch-uniform must get the exact packed
                # path, not silently wrong outputs).  The fallback branch
                # reuses the conditioned half's program shape, so the
                # lax.cond costs no extra kernel compile.
                params = self.variables["params"]
                b2 = x.shape[0] // 2
                x_n, ctx_n = x[b2:], ctx[b2:]
                out_c = tf.transformer1d_fused(params, x[:b2], ctx[:b2],
                                               **kw)
                out_n = jax.lax.cond(
                    jnp.all(ctx_n == ctx_n[:1]),
                    lambda: tf.transformer1d_fused(
                        params, x_n, ctx_n[:1], uniform_ctx=True, **kw),
                    lambda: tf.transformer1d_fused(params, x_n, ctx_n,
                                                   **kw))
                return jnp.concatenate([out_c, out_n], axis=0)
            return tf.transformer1d_fused(self.variables["params"], x, ctx,
                                          **kw)
        x = GroupNorm(32, eps=1e-6, dtype=self.dtype, name="to_in_0")(x)
        x = Conv1d(self.channels, kernel_size=1, padding=0, dtype=self.dtype,
                   name="to_in_1")(x)
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.channels, num_heads=self.num_heads,
                head_features=self.head_features, multiplier=self.multiplier,
                use_rel_pos=self.use_rel_pos,
                rel_pos_num_buckets=self.rel_pos_num_buckets,
                rel_pos_max_distance=self.rel_pos_max_distance,
                context_features=self.context_features,
                dtype=self.dtype, name=f"blocks_{i}")(x, context=context)
        return Conv1d(self.channels, kernel_size=1, padding=0,
                      dtype=self.dtype, name="to_out_1")(x)
