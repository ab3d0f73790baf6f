"""Pallas TPU attention kernel + jnp fallback.

Design for THIS workload (SURVEY §7.4.6): sequence lengths are 4-64 tokens
and head dims 8-64, so K/V always fit in VMEM — the win is fusing
QK^T -> softmax -> PV into one kernel (one HBM round-trip for the block
instead of materializing the (n, m) attention matrix in HBM), not
asymptotic flash-attention streaming.  The kernel therefore keeps the whole
K/V block VMEM-resident per (batch*head) grid step and does a numerically
stable single-pass softmax in fp32.  Shapes are padded to the fp32 tile
(8 sublanes x 128 lanes) by Mosaic automatically.

Dispatch: ``attention(q, k, v)`` uses the Pallas kernel on TPU backends and
the jnp composition elsewhere (virtual CPU meshes, tests).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _attention_jnp(q: jax.Array, k: jax.Array, v: jax.Array,
                   scale: float) -> jax.Array:
    from ..nn.primitives import mm_precision
    prec = mm_precision(q.dtype)
    sim = jnp.einsum("bnd,bmd->bnm", q, k,
                     preferred_element_type=jnp.float32,
                     precision=prec) * scale
    p = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(q.dtype)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      exact: bool):
    prec = jax.lax.Precision.HIGHEST if exact else None
    q = q_ref[0].astype(jnp.float32)          # (n, d)
    k = k_ref[0].astype(jnp.float32)          # (m, d)
    v = v_ref[0]                              # (m, d)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                precision=prec) * scale
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot((p / denom).astype(v.dtype), v,
                preferred_element_type=jnp.float32, precision=prec)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                      scale: float) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    bh, n, d = q.shape
    m = k.shape[1]
    kernel = functools.partial(_attention_kernel, scale=scale,
                               exact=(q.dtype == jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (n * m * d * 2),
            bytes_accessed=4 * bh * (n * d * 2 + 2 * m * d),
            transcendentals=bh * n * m),
    )(q, k, v)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
              scale: Optional[float] = None,
              force_jnp: bool = False) -> jax.Array:
    """Fused softmax attention over flattened batch*heads.

    q (bh, n, d); k, v (bh, m, d).  Returns (bh, n, d) in q.dtype.
    """
    scale = float(q.shape[-1] ** -0.5 if scale is None else scale)
    if force_jnp or jax.default_backend() != "tpu":
        return _attention_jnp(q, k, v, scale)
    return _attention_pallas(q, k, v, scale)


def _packed_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                             g: int, n: int, m: int, exact: bool):
    """Block-diagonal packed attention, fully VMEM-resident: one
    (g*n, d) x (d, g*m) MXU product, mask to the g diagonal (n, m) blocks,
    softmax, PV — the packed fp32 scores never touch HBM."""
    prec = jax.lax.Precision.HIGHEST if exact else None
    q = q_ref[0].astype(jnp.float32)          # (g*n, d)
    k = k_ref[0].astype(jnp.float32)          # (g*m, d)
    v = v_ref[0]                              # (g*m, d)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                precision=prec) * scale
    row_block = jax.lax.broadcasted_iota(jnp.int32, (g * n, g * m), 0) // n
    col_block = jax.lax.broadcasted_iota(jnp.int32, (g * n, g * m), 1) // m
    s = jnp.where(row_block == col_block, s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                precision=prec)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "g", "n", "m"))
def _packed_attention_pallas(q2: jax.Array, k2: jax.Array, v2: jax.Array,
                             scale: float, g: int, n: int,
                             m: int) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    groups = q2.shape[0]
    d = q2.shape[-1]
    kernel = functools.partial(_packed_attention_kernel, scale=scale, g=g,
                               n=n, m=m, exact=(q2.dtype == jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((groups, g * n, d), q2.dtype),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((1, g * n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g * n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * groups * (g * n * g * m * d * 2),
            bytes_accessed=4 * groups * g * (n * d * 2 + 2 * m * d),
            transcendentals=groups * g * n * g * m),
    )(q2, k2, v2)


def packed_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     scale: Optional[float] = None,
                     force_jnp: bool = False) -> jax.Array:
    """Block-diagonal packed attention for micro-shapes (n, m <= 64):
    q (bh, n, d); k, v (bh, m, d) -> (bh, n, d).

    Packs G = 128//max(n, m) head-batches per MXU product inside ONE Pallas
    kernel (scores stay in VMEM).  Exact: masked entries are exp(-inf)=0.
    Falls back to the plain jnp path off-TPU or when packing doesn't divide.
    """
    import math as _math
    bh, n, d = q.shape
    m = k.shape[1]
    scale = float(d ** -0.5 if scale is None else scale)
    g = _math.gcd(max(1, 128 // max(n, m)), bh)
    if force_jnp or g <= 1 or jax.default_backend() != "tpu":
        return _attention_jnp(q, k, v, scale)
    q2 = q.reshape(bh // g, g * n, d)
    k2 = k.reshape(bh // g, g * m, d)
    v2 = v.reshape(bh // g, g * m, d)
    out = _packed_attention_pallas(q2, k2, v2, scale, g, n, m)
    return out.reshape(bh, n, d)
