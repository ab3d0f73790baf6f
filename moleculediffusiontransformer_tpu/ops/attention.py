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
