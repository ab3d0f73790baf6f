"""Blockwise flash attention (Pallas TPU, forward + backward) for LONG
sequences.

``ops/attention.py`` keeps the whole K/V block VMEM-resident — right for
the QM9 molecule tracks (L = 4-64, reference `modules.py:356-362`), but the
audio-lineage assemblies (``models/audio.py``, reference `model.py:1-210`)
inherit 2**15-sample sequences from archinetai/audio-diffusion-pytorch,
where the (n, m) score matrix neither fits VMEM nor should ever be
materialized in HBM.  This module is the classic streaming formulation
(SURVEY §5 "long-context" row: blockwise so longer ``max_length`` scales):

  * forward: grid (batch*heads, n/block_q, m/block_kv), KV innermost —
    online softmax with running row-max ``m`` and normalizer ``l`` in fp32
    VMEM scratch; the numerator accumulates UNNORMALIZED and divides once
    at the last KV block.  One pass over K/V, O(block_q x block_kv) VMEM,
    zero HBM traffic for the scores.  The logsumexp rides out lane-
    broadcast (bh, n, 128) for the backward.
  * backward: custom-vjp with two streaming kernels recomputing p from
    (q, k, lse) per block — dQ sweeps KV per q-block; dK/dV sweeps Q per
    kv-block; ``di = rowsum(dO * o)`` is precomputed on the host graph.
    ds = (dO V^T - di) * p * scale, the standard factorization.
  * fp32 scores/statistics regardless of input dtype (library-wide
    "softmax stats in fp32" convention, CLAUDE.md).

Exactness: online rescaling is algebraically identical to one-shot
softmax; fp32 matmuls pin ``precision=HIGHEST`` and match the jnp
composition to ~1e-6 for outputs AND grads
(``tests/test_flash_attention.py``, interpret mode).

Dispatch: ``flash_attention`` falls back to the jnp composition off-TPU or
when block sizes do not divide (lane tiling needs 128-multiples).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")
_LANES = 128
# Minimum length at which streaming beats XLA's one-shot softmax.
# Hardware-measured (PERF.md flash table): XLA wins at L=512 (53 vs 67 µs
# fwd, 63 vs 104 µs grad) and L=1024 (84 vs 133, 118 vs 260); flash wins
# from L=2048 (+20% fwd, +34% grad) and is the only impl standing at 8k+.
LONG_SEQ_THRESHOLD = 2048


def flash_enabled() -> bool:
    """Auto-routing gate for ``nn.attention.packed_sdpa``: stream long-L
    attention through the Pallas kernels unless ``MDT_FLASH=0`` (A/B
    benchmarking and numerics debugging — same override idiom as
    ``MDT_FUSION``).  ``flash_attention`` itself stays callable either way."""
    import os
    return os.environ.get("MDT_FLASH", "1") not in ("0", "false", "off")


def flash_interpret() -> bool:
    """``MDT_FLASH_INTERPRET=1`` routes the auto-dispatch through the
    kernels in Pallas interpret mode even off-TPU — slow, test-only: lets
    CPU suites pin the module-level flash path (head folding, reshapes,
    custom vjp) without a chip."""
    import os
    return os.environ.get("MDT_FLASH_INTERPRET", "0") in ("1", "true", "on")


def _on_tpu() -> bool:
    """TPU default backend AND no CPU `jax.default_device` override (the
    documented numerics-debugging idiom must not hit Mosaic lowering —
    same guard as ``transformer_fusion.fusion_enabled``)."""
    try:
        if jax.default_backend() != "tpu":
            return False
        dd = jax.config.jax_default_device
        if dd is not None:
            platform = dd if isinstance(dd, str) else getattr(
                dd, "platform", "tpu")
            return platform.startswith("tpu")
        return True
    except Exception:  # pragma: no cover - backendless envs
        return False


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, scale: float, n_kv: int, exact: bool, with_lse: bool):
    """One (q-block, kv-block) step of the online-softmax sweep."""
    from jax.experimental import pallas as pl

    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    prec = jax.lax.Precision.HIGHEST if exact else None
    q = q_ref[0].astype(jnp.float32)                    # (bq, d)
    k = k_ref[0].astype(jnp.float32)                    # (bkv, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale     # (bq, bkv)

    m_prev = m_ref[:, :1]                               # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                     # rescale old stats
    p = jnp.exp(s - m_new)                              # (bq, bkv)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0].astype(jnp.float32)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)            # (bq, d)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kk == n_kv - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv",
                                              "with_lse", "interpret"))
def _fwd_pallas(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                block_q: int, block_kv: int, with_lse: bool,
                interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    m = k.shape[1]
    n_q, n_kv = n // block_q, m // block_kv
    kernel = functools.partial(_fwd_kernel, scale=scale, n_kv=n_kv,
                               exact=(q.dtype == jnp.float32),
                               with_lse=with_lse)
    qo_spec = pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_kv, d), lambda i, j, kk: (i, kk, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, block_q, _LANES),
                            lambda i, j, kk: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((bh, n, d), q.dtype)]
    out_specs = [qo_spec]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, n, _LANES), jnp.float32))
        out_specs.append(lse_spec)
    outs = pl.pallas_call(
        kernel if with_lse else
        (lambda q_ref, k_ref, v_ref, o_ref, *scratch:
         kernel(q_ref, k_ref, v_ref, o_ref, None, *scratch)),
        out_shape=out_shape,
        grid=(bh, n_q, n_kv),
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),       # unnormalized acc
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running normalizer
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n * m * d * 2,
            bytes_accessed=q.dtype.itemsize * bh * (n * d * 2
                                                    + n_q * 2 * m * d),
            transcendentals=bh * n * m),
        interpret=interpret,
    )(q, k, v)
    return outs if with_lse else (outs[0], None)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
               acc_ref, *, scale: float, n_kv: int, exact: bool):
    """dQ for one q-block, sweeping KV blocks (grid dim 2)."""
    from jax.experimental import pallas as pl

    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    prec = jax.lax.Precision.HIGHEST if exact else None
    bkv = k_ref.shape[1]
    reps = bkv // _LANES
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale     # (bq, bkv)
    p = jnp.exp(s - jnp.tile(lse_ref[0], (1, reps)))    # normalized probs
    do = do_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)            # (bq, bkv)
    ds = (dp - jnp.tile(di_ref[0], (1, reps))) * p * scale
    acc_ref[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(kk == n_kv - 1)
    def _finalize():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float, n_q: int,
                exact: bool):
    """dK and dV for one kv-block, sweeping Q blocks (grid dim 2)."""
    from jax.experimental import pallas as pl

    jj = pl.program_id(2)

    @pl.when(jj == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    prec = jax.lax.Precision.HIGHEST if exact else None
    bkv = k_ref.shape[1]
    reps = bkv // _LANES
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale     # (bq, bkv)
    p = jnp.exp(s - jnp.tile(lse_ref[0], (1, reps)))
    do = do_ref[0].astype(jnp.float32)
    # dV += P^T dO
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    v = v_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    ds = (dp - jnp.tile(di_ref[0], (1, reps))) * p * scale
    # dK += dS^T Q
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(jj == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv",
                                              "interpret"))
def _bwd_pallas(q, k, v, o, lse, do, scale: float, block_q: int,
                block_kv: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    m = k.shape[1]
    n_q, n_kv = n // block_q, m // block_kv
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (bh, n, _LANES))
    exact = q.dtype == jnp.float32

    qo_spec = pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_kv, d), lambda i, j, kk: (i, kk, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, _LANES),
                            lambda i, j, kk: (i, j, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_kv=n_kv, exact=exact),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=(bh, n_q, n_kv),
        in_specs=[qo_spec, kv_spec, kv_spec, qo_spec, row_spec, row_spec],
        out_specs=qo_spec,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, di)

    # kv-major grid: q innermost, kv block revisited across the q sweep
    qo_spec2 = pl.BlockSpec((1, block_q, d), lambda i, kk, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_kv, d), lambda i, kk, j: (i, kk, 0),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, _LANES),
                             lambda i, kk, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_q=n_q, exact=exact),
        out_shape=[jax.ShapeDtypeStruct((bh, m, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, m, d), v.dtype)],
        grid=(bh, n_kv, n_q),
        in_specs=[qo_spec2, kv_spec2, kv_spec2, qo_spec2, row_spec2,
                  row_spec2],
        out_specs=[kv_spec2, kv_spec2],
        scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                        pltpu.VMEM((block_kv, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


# --------------------------------------------------------------------------
# custom-vjp core + public dispatch
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, scale: float, block_q: int, block_kv: int,
                interpret: bool):
    o, _ = _fwd_pallas(q, k, v, scale, block_q, block_kv, with_lse=False,
                       interpret=interpret)
    return o


def _flash_core_fwd(q, k, v, scale, block_q, block_kv, interpret):
    o, lse = _fwd_pallas(q, k, v, scale, block_q, block_kv, with_lse=True,
                         interpret=interpret)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(scale, block_q, block_kv, interpret, res, do):
    q, k, v, o, lse = res
    return _bwd_pallas(q, k, v, o, lse, do, scale, block_q, block_kv,
                       interpret=interpret)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _flash_jnp(q: jax.Array, k: jax.Array, v: jax.Array,
               scale: float) -> jax.Array:
    from ..nn.primitives import mm_precision
    prec = mm_precision(q.dtype)
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32,
                   precision=prec) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(q.dtype)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: Optional[float] = None,
                    block_q: int = 256, block_kv: int = 512,
                    force_jnp: bool = False,
                    interpret: bool = False) -> jax.Array:
    """Streaming softmax attention: q (bh, n, d); k, v (bh, m, d).

    Uses the blockwise Pallas kernels (forward AND backward) on TPU — or
    under ``interpret`` for tests; falls back to the jnp composition
    off-TPU or when block sizes do not divide (the backward's lane tiling
    additionally needs 128-multiple blocks).
    """
    scale = float(q.shape[-1] ** -0.5 if scale is None else scale)
    n, m = q.shape[1], k.shape[1]
    block_q = min(block_q, n)
    block_kv = min(block_kv, m)
    ok = (n % block_q == 0 and m % block_kv == 0
          and block_q % _LANES == 0 and block_kv % _LANES == 0)
    if force_jnp or not ok or not (_on_tpu() or interpret):
        return _flash_jnp(q, k, v, scale)
    return _flash_core(q, k, v, scale, block_q, block_kv, interpret)
