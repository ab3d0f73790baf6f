"""Whole-block Pallas megakernel for ``nn.attention.Transformer1d``.

Reference hot path: `modules.py:469-524` (GroupNorm+1x1-conv in -> N x
(self-attn [+cross-attn] + FF) -> 1x1-conv out), executed ~25 times per
denoise eval in the QM UNets.

Why a megakernel (PERF.md, corrected round-2 methodology): one
Transformer1d layer issues ~12 small XLA ops (norms, projections, adds),
each paying ~1-3 us of on-device op overhead plus HBM round-trips between
them.  Fusing the ENTIRE stack into one `pallas_call` keeps activations
AND all layer weights VMEM-resident — measured 1.60x per stage-0 stack
and 1.75x for the full CFG denoise eval.

Execution layout:
  * grid over programs of `target_rows` batch-pack rows (256 at C<=128,
    see `_choose_pack` for the measured tuning); attention runs on
    ~128-row chunks inside the program;
  * attention uses the same block-diagonal packing as
    ``nn.attention.packed_sdpa``: per head one (128, d) x (d, ~128)
    product masked to the pack diagonal — exact math (masked lanes are
    exp(-inf) = 0);
  * weight arrays are banked by shape (~10 operands instead of ~70) and
    DMA'd once into VMEM scratch at grid step 0;
  * all norms/softmax in fp32, matmuls accumulate fp32 (MXU native).

Differentiation: ``transformer1d_fused`` carries a ``jax.custom_vjp``
whose backward is the XLA autodiff of the equivalent slow-path module —
training takes the fused forward and the (already well-fused) XLA
backward.

The fused path is the PRODUCTION DEFAULT on TPU: with no explicit toggle,
``fusion_enabled()`` resolves lazily to True iff the default JAX backend is
a TPU (override with ``MDT_FUSION=0/1``), so every inference surface —
``design.*``, ``train/eval.py`` sampling evals, the ``examples/`` scripts,
``bench.py`` — gets the kernel without opt-in.  CPU test meshes pin
``MDT_FUSION=0`` (tests/conftest.py) and exercise the kernels explicitly in
interpret mode.  ``enable_fusion()`` / the ``fused()`` context manager
force it either way (trace-time flag: re-jit after flipping).
"""
from __future__ import annotations

import contextlib
import functools
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED: Optional[bool] = None  # None = auto (on iff default backend is TPU)
_AUTO: Optional[bool] = None     # lazy cache of the auto decision
_INTERPRET = False       # run kernels in interpreter mode (CPU tests)
_ABLATE: set = set()     # profiling knob: {"attn", "gn", "ff", "cross"}


def _set_trace_flag(name: str, value) -> None:
    """Assign a trace-time flag and, when it CHANGES, drop every cached
    jit trace (``jax.clear_caches``).  Without this, module-level jitted
    entry points (``models.qm_diffusion.sample`` & co) keep serving the
    trace they recorded under the OLD flag — inner-jit caches key on
    avals + static args, not on these globals, so ``fused(False)`` after
    a fused trace at the same geometry silently returned the fused
    program (observed: an ``export_sampler(allow_tpu_custom_calls=False)``
    artifact containing tpu_custom_call).  Clearing is coarse but
    correct; toggles are rare (exports, A/B benches)."""
    if globals()[name] != value:
        globals()[name] = value
        jax.clear_caches()


def enable_fusion(on: bool = True) -> None:
    """Globally force the fused Transformer1d path on/off.  Takes effect
    immediately — stale jit traces are invalidated (see
    ``_set_trace_flag``).  The un-forced default is auto: on iff the
    default backend is TPU (env ``MDT_FUSION`` overrides)."""
    _set_trace_flag("_ENABLED", on)


def _auto_default() -> bool:
    """Lazy production default: fuse on TPU backends unless MDT_FUSION
    says otherwise.  Evaluated at TRACE time (never at import), so it
    cannot initialize the backend before ``jax.distributed`` setup.
    An EMPTY MDT_FUSION value counts as unset (conventional shell
    semantics), not as force-off."""
    global _AUTO
    if _AUTO is None:
        env = os.environ.get("MDT_FUSION")
        if env is not None and env.strip():
            _AUTO = env.strip().lower() not in ("0", "false", "off")
        else:
            try:
                _AUTO = jax.default_backend() == "tpu"
            except Exception:  # pragma: no cover - backendless envs
                _AUTO = False
    return _AUTO


def fusion_enabled() -> bool:
    if _ENABLED is not None:
        return _ENABLED
    if not _auto_default():
        return False
    # honor an active `jax.default_device(...)` override: compiled Mosaic
    # kernels only run on TPU — a CPU-pinned trace (the documented numerics
    # debugging idiom) must take the slow composition, not die in lowering
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            platform = dd if isinstance(dd, str) else getattr(
                dd, "platform", "tpu")
            if not platform.startswith("tpu"):
                return False
    except Exception:  # pragma: no cover - config shape changes
        pass
    return True


@contextlib.contextmanager
def fused(on: bool = True):
    prev = _ENABLED
    _set_trace_flag("_ENABLED", on)
    try:
        yield
    finally:
        _set_trace_flag("_ENABLED", prev)


# The batched-CFG path (nn/unet.py::cfg_forward) doubles the batch as
# [conditioned; null], and the null half's cross-attention context is the
# SAME FixedEmbedding table for every element (reference modules.py:
# 1224-1226).  While this flag is active (set by cfg_forward during its
# doubled-batch trace), the fused Transformer1d splits the batch and runs
# the null half with ONE shared (ctx_len, C) KV — a dense (rows x ctx_len)
# attention with no block-diagonal packing waste.  Exact same math, and
# the dispatch VERIFIES uniformity at runtime (lax.cond fallback).
#
# OFF BY DEFAULT (PERF.md round 3): at the QM models' ctx_len=12 the
# packed path's block-diagonal waste was already negligible — shared-KV
# measured NEUTRAL, and the runtime uniformity check costs ~3% of
# sampling throughput.  Opt in with MDT_CFG_SHAREDKV=1 (or
# ``enable_sharedkv``) for long-context cross attention (64-256-token
# text embeddings), where the dense variant's advantage scales.
_CFG_NULL_UNIFORM = False
_SHAREDKV: Optional[bool] = None    # None = env MDT_CFG_SHAREDKV (default 0)


def enable_sharedkv(on: bool = True) -> None:
    _set_trace_flag("_SHAREDKV", on)


def _sharedkv_opt_in() -> bool:
    if _SHAREDKV is not None:
        return _SHAREDKV
    env = os.environ.get("MDT_CFG_SHAREDKV", "")
    return env.strip().lower() in ("1", "true", "on")


@contextlib.contextmanager
def cfg_uniform_null_half(on: bool = True):
    global _CFG_NULL_UNIFORM
    prev = _CFG_NULL_UNIFORM
    _CFG_NULL_UNIFORM = on
    try:
        yield
    finally:
        _CFG_NULL_UNIFORM = prev


def cfg_null_half_active() -> bool:
    return _CFG_NULL_UNIFORM and _sharedkv_opt_in()


# --------------------------------------------------------------------------
# weight flattening (order is the kernel ABI)
# --------------------------------------------------------------------------

def _vec(w: jax.Array) -> jax.Array:
    return w.reshape(1, -1)


def _abi_paths(num_layers: int, cross: bool) -> List[Tuple[Tuple[str, ...], str]]:
    """The kernel ABI as (param-tree path, transform) pairs, in order.

    Transforms: "vec" = reshape to (1, -1); "conv" = take kernel[0] of a
    1x1 Conv (k, C_in, C_out); "mm" = 2-D as-is.  Single source of truth
    for both ``flatten_params`` and ``unflatten_grads``.
    """
    paths: List[Tuple[Tuple[str, ...], str]] = [
        (("to_in_0", "scale"), "vec"), (("to_in_0", "bias"), "vec"),
        (("to_in_1", "kernel"), "conv"), (("to_in_1", "bias"), "vec"),
    ]

    def attn(prefix: Tuple[str, ...]) -> List[Tuple[Tuple[str, ...], str]]:
        return [
            (prefix + ("norm", "scale"), "vec"),
            (prefix + ("norm", "bias"), "vec"),
            (prefix + ("norm_context", "scale"), "vec"),
            (prefix + ("norm_context", "bias"), "vec"),
            (prefix + ("to_q", "kernel"), "mm"),
            (prefix + ("to_kv", "kernel"), "mm"),
            (prefix + ("attention", "to_out", "kernel"), "mm"),
            (prefix + ("attention", "to_out", "bias"), "vec"),
        ]

    for i in range(num_layers):
        blk = (f"blocks_{i}",)
        paths += attn(blk + ("attention",))
        if cross:
            paths += attn(blk + ("cross_attention",))
        paths += [(blk + ("feed_forward_0", "kernel"), "mm"),
                  (blk + ("feed_forward_0", "bias"), "vec"),
                  (blk + ("feed_forward_2", "kernel"), "mm"),
                  (blk + ("feed_forward_2", "bias"), "vec")]

    paths += [(("to_out_1", "kernel"), "conv"), (("to_out_1", "bias"), "vec")]
    return paths


def _tree_get(tree: Dict[str, Any], path: Tuple[str, ...]) -> jax.Array:
    node: Any = tree
    for k in path:
        node = node[k]
    return node


def flatten_params(tree: Dict[str, Any], num_layers: int,
                   cross: bool) -> List[jax.Array]:
    """Transformer1d param subtree -> flat weight list (all >= 2-D)."""
    ws: List[jax.Array] = []
    for path, tf_kind in _abi_paths(num_layers, cross):
        w = _tree_get(tree, path)
        if tf_kind == "vec":
            ws.append(_vec(w))
        elif tf_kind == "conv":
            ws.append(w[0])
        else:
            ws.append(w)
    return ws


def unflatten_grads(flat: List[jax.Array], tree: Dict[str, Any],
                    num_layers: int, cross: bool) -> Dict[str, Any]:
    """Inverse of ``flatten_params`` for gradients: rebuild the param-tree
    structure from per-ABI-entry grads, restoring original shapes/dtypes."""
    paths = _abi_paths(num_layers, cross)
    assert len(flat) == len(paths), (len(flat), len(paths))
    out: Dict[str, Any] = {}
    for (path, _), g in zip(paths, flat):
        tmpl = _tree_get(tree, path)
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = g.reshape(tmpl.shape).astype(tmpl.dtype)
    return out


def build_banks(ws: List[jax.Array], compute_dtype
                ) -> Tuple[List[jax.Array], List[Tuple[int, int]]]:
    """Stack the flat weight list into per-shape banks.

    ~70 separate pallas operands cost real per-grid-step bookkeeping
    (measured: the empty kernel's time scales with operand count); banking
    them by shape collapses the operand list to ~10 refs.  Matmul kernels
    (shape[0] > 1) ride in the compute dtype; (1, n) vectors stay fp32 for
    the norm math.  Returns (banks, plan) where plan[i] = (bank, slot) for
    ABI entry i.
    """
    groups: Dict[Tuple, List[jax.Array]] = {}
    keyed: List[Tuple[Tuple, int]] = []
    for wa in ws:
        is_mm = wa.shape[0] > 1
        key = (tuple(wa.shape), is_mm)
        groups.setdefault(key, []).append(
            wa.astype(compute_dtype) if is_mm else wa.astype(jnp.float32))
        keyed.append((key, len(groups[key]) - 1))
    order = list(groups.keys())
    banks = [jnp.stack(groups[k]) for k in order]
    plan = [(order.index(k), slot) for k, slot in keyed]
    return banks, plan


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _layer_norm(x32: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def _dot32(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _erf(x: jax.Array) -> jax.Array:
    """erf for the Mosaic kernel (`lax.erf` has no TPU-Pallas lowering).
    Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    1.5e-7 — invisible at bf16 and far below the fused-vs-slow fp32 test
    tolerance."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(refs, *, plan, num_layers: int, heads: int, head_dim: int,
            cross: bool, p: int, length: int,
            ctx_len: int, load_once: bool, dtype, stash: bool = False,
            uniform_ctx: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    it = iter(refs)
    x_ref = next(it)
    ctx_ref = next(it) if cross else None
    n_banks = max(b for b, _ in plan) + 1
    hbm_banks = [next(it) for _ in range(n_banks)]
    out_ref = next(it)
    stash_ref = next(it) if stash else None
    if load_once:
        # weights live in HBM and are DMA'd into VMEM scratch ONCE (first
        # grid step); later steps reuse the resident copies — measured: the
        # default per-step block fetch re-pulls constant blocks enough to
        # dominate the kernel.
        banks = [next(it) for _ in range(n_banks)]
        sem = next(it)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i, (src, dst) in enumerate(zip(hbm_banks, banks)):
                pltpu.make_async_copy(src, dst, sem.at[i]).start()
            for i, (src, dst) in enumerate(zip(hbm_banks, banks)):
                pltpu.make_async_copy(src, dst, sem.at[i]).wait()
    else:
        banks = hbm_banks
    plan_it = iter(plan)

    def w():
        bi, slot = next(plan_it)
        return banks[bi][slot]

    # NB: inside the kernel use ONLY raw lax primitives for integer //,
    # select — the jnp/jax.nn sugar wraps them in closed jit calls that the
    # Mosaic lowering rejects.  (`_pack_ids`/`_chunk_packs` are the shared
    # module-level helpers, also used by the backward kernels.)

    # -------- load activations --------------------------------------------
    rows = p * length
    c = x_ref.shape[-1]
    x = x_ref[:].reshape(rows, c)

    g_self = _chunk_packs(p, length)
    self_mask = (_pack_ids((g_self * length, g_self * length), 0, length)
                 == _pack_ids((g_self * length, g_self * length), 1, length))
    if cross and uniform_ctx:
        # one shared context row-block for the whole (null) half: dense
        # (rows x ctx_len) attention, no packing masks at all
        ctx = ctx_ref[:].reshape(ctx_len, ctx_ref.shape[-1])
        g_cross = cross_mask = None
    elif cross:
        ctx = ctx_ref[:].reshape(p * ctx_len, ctx_ref.shape[-1])
        g_cross = _chunk_packs(p, length)
        cross_mask = (_pack_ids((g_cross * length, g_cross * ctx_len), 0,
                                length)
                      == _pack_ids((g_cross * length, g_cross * ctx_len), 1,
                                   ctx_len))

    # -------- GroupNorm(32, eps 1e-6) to_in_0 ------------------------------
    gn_scale, gn_bias = w(), w()
    groups = 32
    cpg = c // groups
    xf = x.astype(jnp.float32)
    if "gn" in _ABLATE:
        y32 = xf
    else:
        # segment sums over each pack's L rows via indicator matmuls
        seg = (_pack_ids((p, rows), 1, length)
               == jax.lax.broadcasted_iota(jnp.int32, (p, rows), 0)
               ).astype(jnp.float32)                             # (P, R)
        grp = (_pack_ids((c, groups), 0, cpg)
               == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
               ).astype(jnp.float32)                             # (C, G)
        n_elem = float(length * cpg)
        gmean = _dot32(_dot32(seg, xf), grp) / n_elem            # (P, G)
        mean_rows = _dot32(seg.T, _dot32(gmean, grp.T))          # (R, C)
        xc = xf - mean_rows
        gvar = _dot32(_dot32(seg, xc * xc), grp) / n_elem
        var_rows = _dot32(seg.T, _dot32(gvar, grp.T))
        y32 = (xc * jax.lax.rsqrt(var_rows + 1e-6)
               * gn_scale.astype(jnp.float32)
               + gn_bias.astype(jnp.float32))

    # -------- 1x1 conv in ---------------------------------------------------
    k_in, b_in = w(), w()
    y = (_dot32(y32.astype(dtype), k_in) + b_in.astype(jnp.float32)
         ).astype(dtype)

    inner = heads * head_dim
    scale = head_dim ** -0.5

    def attention(y, kv_src, kv_per_pack, chunk_packs, mask,
                  wq, wkv, wout, bout, nscale, nbias, cscale, cbias):
        if "attn" in _ABLATE:
            return y
        q_in = _layer_norm(y.astype(jnp.float32), nscale, nbias
                           ).astype(dtype)
        kv_in = _layer_norm(kv_src.astype(jnp.float32), cscale, cbias
                            ).astype(dtype)
        q = _dot32(q_in, wq).astype(dtype)                       # (R, I)
        kvp = _dot32(kv_in, wkv).astype(dtype)                   # (Rkv, 2I)
        cq = chunk_packs * length                                # chunk rows
        ckv = chunk_packs * kv_per_pack                          # chunk cols
        nchunk = rows // cq
        chunk_outs = []
        for s in range(nchunk):
            qs = q[s * cq:(s + 1) * cq]
            kvs = kvp[s * ckv:(s + 1) * ckv]
            outs = []
            for h in range(heads):
                qh = qs[:, h * head_dim:(h + 1) * head_dim]
                kh = kvs[:, h * head_dim:(h + 1) * head_dim]
                vh = kvs[:, inner + h * head_dim:
                         inner + (h + 1) * head_dim]
                # contract last-dim x last-dim directly (no kh.T transpose)
                sim = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # (cq, ckv)
                if "smax" in _ABLATE:
                    att = sim * jnp.float32(0.01)
                else:
                    sim = jax.lax.select(mask, sim,
                                         jax.lax.full_like(sim, -jnp.inf))
                    m = jnp.max(sim, axis=-1, keepdims=True)
                    e = jnp.exp(sim - m)
                    att = e / jnp.sum(e, axis=-1, keepdims=True)
                outs.append(_dot32(att.astype(dtype), vh))       # (cq, d)
            chunk_outs.append(jnp.concatenate(outs, axis=-1))
        o = (chunk_outs[0] if nchunk == 1
             else jnp.concatenate(chunk_outs, axis=0)).astype(dtype)
        return (_dot32(o, wout) + bout.astype(jnp.float32)).astype(dtype)

    def attention_shared_kv(y, ctx2d, wq, wkv, wout, bout,
                            nscale, nbias, cscale, cbias):
        """Cross attention against ONE shared (ctx_len, C) context: the
        CFG null half's FixedEmbedding is batch-identical, so all rows may
        attend one dense KV — no block-diagonal tiles, ctx_len kv columns
        instead of g*ctx_len (EXACTLY the same values per row)."""
        if "attn" in _ABLATE or "cross" in _ABLATE:
            return y
        q_in = _layer_norm(y.astype(jnp.float32), nscale, nbias
                           ).astype(dtype)
        kv_in = _layer_norm(ctx2d.astype(jnp.float32), cscale, cbias
                            ).astype(dtype)
        q = _dot32(q_in, wq).astype(dtype)                   # (R, I)
        kvp = _dot32(kv_in, wkv).astype(dtype)               # (M, 2I)
        outs = []
        for h in range(heads):
            qh = q[:, h * head_dim:(h + 1) * head_dim]
            kh = kvp[:, h * head_dim:(h + 1) * head_dim]
            vh = kvp[:, inner + h * head_dim:inner + (h + 1) * head_dim]
            sim = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (R, M)
            m = jnp.max(sim, axis=-1, keepdims=True)
            e = jnp.exp(sim - m)
            att = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(_dot32(att.astype(dtype), vh))
        o = jnp.concatenate(outs, axis=-1).astype(dtype)
        return (_dot32(o, wout) + bout.astype(jnp.float32)).astype(dtype)

    # activation stash for the fused BACKWARD: each residual sub-block's
    # input, in processing order, + the conv-out input (see _bwd_* below)
    si = [0]

    def put_stash(yv):
        if stash:
            stash_ref[si[0]] = yv.astype(dtype).reshape(p, length, c)
            si[0] += 1

    for _ in range(num_layers):
        ns, nb, cs, cb, wq, wkv, wout, bout = (w() for _ in range(8))
        put_stash(y)                                   # self-attn input
        y = attention(y, y, length, g_self, self_mask, wq, wkv, wout, bout,
                      ns, nb, cs, cb) + y
        if cross:
            ns, nb, cs, cb, wq, wkv, wout, bout = (w() for _ in range(8))
            put_stash(y)                               # cross-attn input
            if uniform_ctx:
                y = attention_shared_kv(y, ctx, wq, wkv, wout, bout,
                                        ns, nb, cs, cb) + y
            elif "cross" not in _ABLATE:
                y = attention(y, ctx, ctx_len, g_cross, cross_mask, wq, wkv,
                              wout, bout, ns, nb, cs, cb) + y
        w0, b0, w2, b2 = w(), w(), w(), w()
        put_stash(y)                                   # feed-forward input
        if "ff" not in _ABLATE:
            h32 = _dot32(y, w0) + b0.astype(jnp.float32)
            g = 0.5 * h32 * (1.0 + _erf(h32 * np.float32(1.0 / np.sqrt(2.0))))
            y = (_dot32(g.astype(dtype), w2)
                 + b2.astype(jnp.float32)).astype(dtype) + y

    k_out, b_out = w(), w()
    put_stash(y)                                       # conv-out input
    out = (_dot32(y, k_out) + b_out.astype(jnp.float32)).astype(dtype)
    out_ref[:] = out.reshape(p, length, c)


def _choose_pack(batch: int, length: int, channels: int) -> int:
    """Packs per program.  Attention sub-blocks keep the packed-SDPA
    granularity (~128 rows, re-derived in-kernel by ``_chunk_packs``); the
    program carries as many sub-blocks as the VMEM weight budget allows —
    fewer, fatter programs amortize the measured per-grid-step cost.
    """
    # measured on v5e (PERF.md): 256 rows/program wins at C<=128 (two
    # sub-blocks amortize per-program cost); at C=256 the weight banks eat
    # VMEM and smaller programs win (64 rows at L<=4, 128 otherwise).
    if channels <= 128:
        target_rows = 256
    else:
        target_rows = 64 if length <= 4 else 128
    sub = max(1, min(128, target_rows) // length)
    while sub > 1 and batch % sub:
        sub -= 1
    mult = max(1, target_rows // (sub * length))
    p = sub * mult
    while p > sub and batch % p:
        p -= sub
    return p


def n_stash_slots(num_layers: int, cross: bool) -> int:
    return num_layers * (3 if cross else 2) + 1


# v5e has 128 MB of physical VMEM; Mosaic's DEFAULT scoped budget is 16 MB,
# which the C=512 UNet stage's weight banks alone exceed (~22 MB — measured:
# the 91M flagship OOMs scoped vmem at stage downsamples_1).  Kernels whose
# estimated footprint exceeds the default ask for a raised limit; configs
# that would not fit even the raised cap fall back to XLA via `fusable`.
_VMEM_DEFAULT_BYTES = 16 * 1024 * 1024
_VMEM_CAP_BYTES = 100 * 1024 * 1024


def _weight_bank_bytes(c: int, inner: int, ctx_c: int, num_layers: int,
                       multiplier: int, itemsize: int) -> int:
    """Bytes of matmul weights resident in VMEM scratch (compute dtype);
    mirrors `_abi_paths` (norm vectors are negligible)."""
    per_layer = c * inner + c * 2 * inner + inner * c      # self q, kv, out
    if ctx_c:
        per_layer += c * inner + ctx_c * 2 * inner + inner * c
    per_layer += 2 * c * (multiplier * c)                  # ff in + out
    return itemsize * (2 * c * c + num_layers * per_layer)


def _fwd_vmem_estimate(bank_bytes: int, p: int, length: int, c: int,
                       ctx_block_rows: int, ctx_c: int, stash_slots: int,
                       itemsize: int) -> int:
    rows = p * length
    blocks = 2 * (2 * rows * c) * itemsize                 # in+out, dbl-buf
    blocks += 2 * ctx_block_rows * ctx_c * itemsize
    blocks += 2 * stash_slots * rows * c * itemsize
    working = 8 * rows * c * 4                             # fp32 temporaries
    return bank_bytes + blocks + working + (2 << 20)


def _compiler_params(pltpu, interpret: bool, est_bytes: int) -> dict:
    """Raise the scoped-VMEM budget only when the estimate needs it, so
    small geometries keep the exact round-2 compilation behavior."""
    if interpret or est_bytes <= _VMEM_DEFAULT_BYTES * 3 // 4:
        return {}
    # 3/2 slack over the estimate: the fp32 forward-preset train step
    # (L=64, C=128, cross, micro 512) measured an actual stack need 35%
    # above the estimate (56.2M vs est*5/4 = 52.5M requested — scoped
    # OOM at compile, 2026-08-21); physical VMEM is 128M so a generous
    # limit costs nothing when the true need is smaller.
    limit = min(_VMEM_CAP_BYTES, max(32 * 1024 * 1024, est_bytes * 3 // 2))
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=limit)}


def _fused_forward(ws: List[jax.Array], x: jax.Array,
                   context: Optional[jax.Array], *, num_layers: int,
                   heads: int, head_dim: int, multiplier: int,
                   interpret: bool = False, with_stash: bool = False,
                   uniform_ctx: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length, c = x.shape
    cross = context is not None
    p = _choose_pack(b, length, c)
    grid = (b // p,)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}

    in_specs = [pl.BlockSpec((p, length, c), lambda i: (i, 0, 0), **ms)]
    operands: List[jax.Array] = [x]
    ctx_len = 0
    if cross and uniform_ctx:
        assert context.shape[0] == 1, context.shape
        ctx_len = context.shape[1]
        in_specs.append(pl.BlockSpec(
            (1, ctx_len, context.shape[-1]), lambda i: (0, 0, 0), **ms))
        operands.append(context.astype(x.dtype))
    elif cross:
        ctx_len = context.shape[1]
        in_specs.append(pl.BlockSpec(
            (p, ctx_len, context.shape[-1]), lambda i: (i, 0, 0), **ms))
        operands.append(context.astype(x.dtype))
    banks, plan = build_banks(ws, x.dtype)
    load_once = not interpret
    scratch_shapes = []
    for wa in banks:
        wms = {"memory_space": pl.ANY} if load_once else ms
        in_specs.append(pl.BlockSpec(
            wa.shape, (lambda i, _nd=wa.ndim: (0,) * _nd), **wms))
        operands.append(wa)
    if load_once:
        scratch_shapes = [pltpu.VMEM(wa.shape, wa.dtype) for wa in banks]
        scratch_shapes.append(pltpu.SemaphoreType.DMA((len(banks),)))

    kernel = functools.partial(
        _kernel_entry, plan=tuple(plan), num_layers=num_layers, heads=heads,
        head_dim=head_dim, cross=cross, p=p,
        length=length, ctx_len=ctx_len,
        load_once=load_once, dtype=x.dtype, stash=with_stash,
        uniform_ctx=uniform_ctx)

    out_specs = pl.BlockSpec((p, length, c), lambda i: (i, 0, 0), **ms)
    out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    if with_stash:
        ns = n_stash_slots(num_layers, cross)
        out_specs = (out_specs, pl.BlockSpec(
            (ns, p, length, c), lambda i: (0, i, 0, 0), **ms))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ns, b, length, c), x.dtype))

    flops = 2 * b * length * c * (
        num_layers * (3 * c + 4 * heads * head_dim
                      + 2 * multiplier * c) + 2 * c)
    bank_bytes = sum(int(w.size) * w.dtype.itemsize for w in banks)
    est = _fwd_vmem_estimate(
        bank_bytes, p, length, c,
        (ctx_len if uniform_ctx else p * ctx_len) if cross else 0,
        context.shape[-1] if cross else 0,
        n_stash_slots(num_layers, cross) if with_stash else 0,
        x.dtype.itemsize)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 * x.dtype.itemsize,
            transcendentals=b * length * c * multiplier * num_layers),
        interpret=interpret,
        **_compiler_params(pltpu, interpret, est),
    )(*operands)


def _kernel_entry(*refs, **kw):
    _kernel(refs, **kw)


# --------------------------------------------------------------------------
# fused BACKWARD (Pallas)
#
# The training-side half of the megakernel (round-2 verdict item 1).  The
# forward stashes every residual sub-block's input (one extra VMEM->HBM
# write per sub-block); the backward then runs as a short chain of Pallas
# segment kernels, each with grid over batch packs:
#
#   conv-out bwd  ->  N x layer bwd (ff, cross-attn, self-attn)  ->
#   GroupNorm + conv-in bwd
#
# Each layer kernel recomputes its sub-block forward intermediates from the
# stashed inputs entirely in VMEM (norms, q/kv projections, attention
# probabilities) and produces dL/dx plus fp32 weight grads accumulated
# across the batch grid in VMEM-resident output banks (zeroed at program 0,
# `+=` thereafter — TPU grids run sequentially).  dL/dcontext comes out per
# layer and is summed by XLA (N tiny adds).
#
# Memory: per program = one layer's weights (compute dtype) + that layer's
# fp32 grad banks + O(rows x channels) activations — ~5 MB at C=128 and
# ~9 MB at C=256 with the forward's pack sizes, comfortably under VMEM.
# --------------------------------------------------------------------------

_FUSED_BWD = True


def enable_fused_backward(on: bool = True) -> None:
    """Select the Pallas backward chain (default) vs the legacy
    rematerializing XLA backward for ``transformer1d_fused``.  Takes
    effect immediately (stale traces invalidated — ``_set_trace_flag``)."""
    _set_trace_flag("_FUSED_BWD", on)


@contextlib.contextmanager
def fused_backward(on: bool = True):
    prev = _FUSED_BWD
    _set_trace_flag("_FUSED_BWD", on)
    try:
        yield
    finally:
        _set_trace_flag("_FUSED_BWD", prev)


def _dot_nt(a: jax.Array, b: jax.Array) -> jax.Array:
    """a (m, k) x b (n, k) -> (m, n), contracting the last dims (i.e.
    ``a @ b.T`` without materializing the transpose)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a: jax.Array, b: jax.Array) -> jax.Array:
    """a (k, m) x b (k, n) -> (m, n), contracting dim 0 (``a.T @ b``)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _pack_ids(shape, dim: int, divisor: int) -> jax.Array:
    i = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    return jax.lax.div(i, jnp.int32(divisor))


def _chunk_packs(p: int, length: int) -> int:
    """Packs per attention sub-chunk, shared by the forward AND backward
    kernels: q rows ~ one 128-row MXU tile.  (Measured alternative:
    shrinking g until g*kv_len <= 128 lanes cuts the block-diagonal
    softmax waste quadratically but loses MORE to small-GEMM issue
    latency — 559 -> 722 us/call on the L=4,C=256 stage.  Rows win;
    keep the q side at full tiles.)"""
    g = p
    while g > 1 and (g * length > 128 or p % g):
        g -= 1
    return max(g, 1)


def _ln_stats(x32: jax.Array, eps: float = 1e-5):
    """LayerNorm forward stats: returns (x_hat, rstd)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mean) * rstd, rstd


def _ln_bwd(dy32: jax.Array, xhat: jax.Array, rstd: jax.Array,
            scale32: jax.Array):
    """LayerNorm backward: y = xhat*s + b.  Returns (dx, dscale, dbias)
    with dscale/dbias as (1, C) row vectors (summed over rows)."""
    dscale = jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dy32, axis=0, keepdims=True)
    dxh = dy32 * scale32
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxh - m1 - xhat * m2)
    return dx, dscale, dbias


_INV_SQRT2 = float(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _gelu_fwd_bwd(h32: jax.Array):
    """Exact-erf GELU value and derivative (kernel-safe `_erf`)."""
    cdf = 0.5 * (1.0 + _erf(h32 * np.float32(_INV_SQRT2)))
    val = h32 * cdf
    grad = cdf + h32 * np.float32(_INV_SQRT2PI) * jnp.exp(-0.5 * h32 * h32)
    return val, grad


def _bwd_convout_kernel(g_ref, y_ref, k_ref, dy_ref, dk_ref, db_ref, *,
                        p: int, length: int, c: int, dtype):
    from jax.experimental import pallas as pl
    rows = p * length

    @pl.when(pl.program_id(0) == 0)
    def _():
        dk_ref[:] = jnp.zeros(dk_ref.shape, jnp.float32)
        db_ref[:] = jnp.zeros(db_ref.shape, jnp.float32)

    g32 = g_ref[:].reshape(rows, c).astype(jnp.float32)
    g_dt = g32.astype(dtype)
    y = y_ref[:].reshape(rows, c)
    dk_ref[:] += _dot_tn(y, g_dt)
    db_ref[:] += jnp.sum(g32, axis=0, keepdims=True)
    dy32 = _dot_nt(g_dt, k_ref[:])
    dy_ref[:] = dy32.astype(dtype).reshape(p, length, c)


def _bwd_convin_gn_kernel(x_ref, dy0_ref, kin_ref, gs_ref, gb_ref,
                          dx_ref, dk_ref, dbin_ref, dgs_ref, dgb_ref, *,
                          p: int, length: int, c: int, dtype):
    from jax.experimental import pallas as pl
    rows = p * length
    groups = 32
    cpg = c // groups

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dk_ref, dbin_ref, dgs_ref, dgb_ref):
            r[:] = jnp.zeros(r.shape, jnp.float32)

    # recompute the GroupNorm forward exactly as the forward kernel does
    # (segment-indicator matmuls over each pack's L rows / 32 groups)
    x32 = x_ref[:].reshape(rows, c).astype(jnp.float32)
    seg = (_pack_ids((p, rows), 1, length)
           == jax.lax.broadcasted_iota(jnp.int32, (p, rows), 0)
           ).astype(jnp.float32)                              # (P, R)
    grp = (_pack_ids((c, groups), 0, cpg)
           == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
           ).astype(jnp.float32)                              # (C, G)
    n_elem = float(length * cpg)
    gmean = _dot32(_dot32(seg, x32), grp) / n_elem
    mean_rows = _dot32(seg.T, _dot32(gmean, grp.T))
    xc = x32 - mean_rows
    gvar = _dot32(_dot32(seg, xc * xc), grp) / n_elem
    var_rows = _dot32(seg.T, _dot32(gvar, grp.T))
    rstd = jax.lax.rsqrt(var_rows + 1e-6)
    xhat = xc * rstd
    gs32 = gs_ref[:].astype(jnp.float32)
    y32d = (xhat * gs32 + gb_ref[:].astype(jnp.float32)).astype(dtype)

    dy0_32 = dy0_ref[:].reshape(rows, c).astype(jnp.float32)
    dy0_dt = dy0_32.astype(dtype)
    dk_ref[:] += _dot_tn(y32d, dy0_dt)
    dbin_ref[:] += jnp.sum(dy0_32, axis=0, keepdims=True)
    dy32 = _dot_nt(dy0_dt, kin_ref[:])                        # d(GN out)
    dgs_ref[:] += jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    dgb_ref[:] += jnp.sum(dy32, axis=0, keepdims=True)
    dxh = dy32 * gs32
    m1 = _dot32(seg.T, _dot32(_dot32(_dot32(seg, dxh), grp) / n_elem, grp.T))
    m2 = _dot32(seg.T, _dot32(_dot32(_dot32(seg, dxh * xhat), grp) / n_elem,
                              grp.T))
    dx32 = rstd * (dxh - m1 - xhat * m2)
    dx_ref[:] = dx32.astype(dtype).reshape(p, length, c)


def _bwd_layer_kernel(refs, *, plan, heads: int, head_dim: int, cross: bool,
                      p: int, length: int, ctx_len: int, c: int, ctx_c: int,
                      load_once: bool, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    it = iter(refs)
    dy_ref = next(it)
    a_ref = next(it)
    c_ref = next(it) if cross else None
    f_ref = next(it)
    ctx_ref = next(it) if cross else None
    n_banks = max(b for b, _ in plan) + 1
    hbm_banks = [next(it) for _ in range(n_banks)]
    dy_out_ref = next(it)
    dctx_ref = next(it) if cross else None
    dw_refs = [next(it) for _ in range(n_banks)]
    if load_once:
        banks = [next(it) for _ in range(n_banks)]
        sem = next(it)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for i, (src, dst) in enumerate(zip(hbm_banks, banks)):
                pltpu.make_async_copy(src, dst, sem.at[i]).start()
            for i, (src, dst) in enumerate(zip(hbm_banks, banks)):
                pltpu.make_async_copy(src, dst, sem.at[i]).wait()
    else:
        banks = hbm_banks

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in dw_refs:
            r[:] = jnp.zeros(r.shape, jnp.float32)

    def wk(k: int) -> jax.Array:
        bi, sl = plan[k]
        return banks[bi][sl]

    def dw_add(k: int, val32: jax.Array) -> None:
        bi, sl = plan[k]
        dw_refs[bi][sl] += val32

    rows = p * length
    inner = heads * head_dim
    scale = head_dim ** -0.5
    g_pack = _chunk_packs(p, length)
    self_mask = (_pack_ids((g_pack * length, g_pack * length), 0, length)
                 == _pack_ids((g_pack * length, g_pack * length), 1, length))
    if cross:
        cross_mask = (_pack_ids((g_pack * length, g_pack * ctx_len), 0,
                                length)
                      == _pack_ids((g_pack * length, g_pack * ctx_len), 1,
                                   ctx_len))

    def attn_bwd(dy32, a, kv_src, kv_per_pack, mask, k0):
        """Backward through one pre-LN attention sub-block evaluated at the
        stashed input ``a`` (q side) / ``kv_src`` (kv side).  Returns
        (d_a_q_path, d_kv_src) fp32; accumulates the 8 weight grads."""
        ns32 = wk(k0).astype(jnp.float32)
        nb32 = wk(k0 + 1).astype(jnp.float32)
        cs32 = wk(k0 + 2).astype(jnp.float32)
        cb32 = wk(k0 + 3).astype(jnp.float32)
        wq, wkv, wout = wk(k0 + 4), wk(k0 + 5), wk(k0 + 6)
        # ---- recompute forward intermediates ----
        qhat, q_rstd = _ln_stats(a.astype(jnp.float32))
        q_in = (qhat * ns32 + nb32).astype(dtype)
        kvhat, kv_rstd = _ln_stats(kv_src.astype(jnp.float32))
        kv_in = (kvhat * cs32 + cb32).astype(dtype)
        q = _dot32(q_in, wq).astype(dtype)                    # (R, I)
        kvp = _dot32(kv_in, wkv).astype(dtype)                # (Rkv, 2I)
        # ---- out-projection backward ----
        dy_dt = dy32.astype(dtype)
        do = _dot_nt(dy_dt, wout).astype(dtype)               # (R, I)
        dw_add(k0 + 7, jnp.sum(dy32, axis=0, keepdims=True))  # b_out
        cq = g_pack * length
        ckv = g_pack * kv_per_pack
        nchunk = rows // cq
        o_chunks, dq_chunks, dk_chunks, dv_chunks = [], [], [], []
        for s in range(nchunk):
            qs = q[s * cq:(s + 1) * cq]
            kvs = kvp[s * ckv:(s + 1) * ckv]
            dos = do[s * cq:(s + 1) * cq]
            o_h, dq_h, dk_h, dv_h = [], [], [], []
            for h in range(heads):
                qh = qs[:, h * head_dim:(h + 1) * head_dim]
                kh = kvs[:, h * head_dim:(h + 1) * head_dim]
                vh = kvs[:, inner + h * head_dim:
                         inner + (h + 1) * head_dim]
                sim = _dot_nt(qh, kh) * scale
                sim = jax.lax.select(mask, sim,
                                     jax.lax.full_like(sim, -jnp.inf))
                m = jnp.max(sim, axis=-1, keepdims=True)
                e = jnp.exp(sim - m)
                att = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32
                att_dt = att.astype(dtype)
                o_h.append(_dot32(att_dt, vh))                # fwd value
                doh = dos[:, h * head_dim:(h + 1) * head_dim]
                datt = _dot_nt(doh, vh)                       # (cq, ckv)
                dv_h.append(_dot_tn(att_dt, doh))             # (ckv, d)
                r = jnp.sum(datt * att, axis=-1, keepdims=True)
                ds = (att * (datt - r) * scale).astype(dtype)
                dq_h.append(_dot32(ds, kh))                   # (cq, d)
                dk_h.append(_dot_tn(ds, qh))                  # (ckv, d)
            o_chunks.append(jnp.concatenate(o_h, axis=-1))
            dq_chunks.append(jnp.concatenate(dq_h, axis=-1))
            dk_chunks.append(jnp.concatenate(dk_h, axis=-1))
            dv_chunks.append(jnp.concatenate(dv_h, axis=-1))

        def cat(chunks):
            return chunks[0] if nchunk == 1 else jnp.concatenate(chunks, 0)

        o = cat(o_chunks).astype(dtype)                       # (R, I)
        dw_add(k0 + 6, _dot_tn(o, dy_dt))                     # w_out
        dq_dt = cat(dq_chunks).astype(dtype)
        dkv_dt = jnp.concatenate([cat(dk_chunks), cat(dv_chunks)],
                                 axis=-1).astype(dtype)       # (Rkv, 2I)
        dw_add(k0 + 4, _dot_tn(q_in, dq_dt))                  # w_q
        dw_add(k0 + 5, _dot_tn(kv_in, dkv_dt))                # w_kv
        dq_in32 = _dot_nt(dq_dt, wq)                          # (R, C)
        dkv_in32 = _dot_nt(dkv_dt, wkv)                       # (Rkv, Ckv)
        da, dns, dnb = _ln_bwd(dq_in32, qhat, q_rstd, ns32)
        dkv_src, dcs, dcb = _ln_bwd(dkv_in32, kvhat, kv_rstd, cs32)
        dw_add(k0, dns)
        dw_add(k0 + 1, dnb)
        dw_add(k0 + 2, dcs)
        dw_add(k0 + 3, dcb)
        return da, dkv_src

    dy32 = dy_ref[:].reshape(rows, c).astype(jnp.float32)

    # ---- feed-forward backward (at stashed input f) ------------------------
    ff0 = (16 if cross else 8)
    f = f_ref[:].reshape(rows, c)
    w0, w2 = wk(ff0), wk(ff0 + 2)
    h32 = _dot32(f, w0) + wk(ff0 + 1).astype(jnp.float32)
    gval32, gder32 = _gelu_fwd_bwd(h32)
    gd = gval32.astype(dtype)
    dy_dt = dy32.astype(dtype)
    dw_add(ff0 + 2, _dot_tn(gd, dy_dt))                       # w2
    dw_add(ff0 + 3, jnp.sum(dy32, axis=0, keepdims=True))     # b2
    dh32 = _dot_nt(dy_dt, w2) * gder32
    dh_dt = dh32.astype(dtype)
    dw_add(ff0, _dot_tn(f, dh_dt))                            # w0
    dw_add(ff0 + 1, jnp.sum(dh32, axis=0, keepdims=True))     # b0
    dy32 = dy32 + _dot_nt(dh_dt, w0)                          # + residual

    # ---- cross-attention backward -----------------------------------------
    if cross:
        cin = c_ref[:].reshape(rows, c)
        ctx = ctx_ref[:].reshape(p * ctx_len, ctx_c)
        da, dctx32 = attn_bwd(dy32, cin, ctx, ctx_len, cross_mask, k0=8)
        dy32 = dy32 + da
        dctx_ref[:] = dctx32.astype(dtype).reshape(p, ctx_len, ctx_c)

    # ---- self-attention backward (q AND kv paths feed the same input) -----
    a = a_ref[:].reshape(rows, c)
    da, dkv_src = attn_bwd(dy32, a, a, length, self_mask, k0=0)
    dy32 = dy32 + da + dkv_src
    dy_out_ref[:] = dy32.astype(dtype).reshape(p, length, c)


def _bwd_layer_entry(*refs, **kw):
    _bwd_layer_kernel(refs, **kw)


def _bspec(pl, ms, shape, imap):
    return pl.BlockSpec(shape, imap, **ms)


def _const_imap(ndim: int):
    return lambda i, _nd=ndim: (0,) * _nd


def _bwd_conv_out(g: jax.Array, y_n: jax.Array, k_out: jax.Array,
                  interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, length, c = g.shape
    p = _choose_pack(b, length, c)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}
    blk = _bspec(pl, ms, (p, length, c), lambda i: (i, 0, 0))
    kernel = functools.partial(_bwd_convout_kernel, p=p, length=length, c=c,
                               dtype=g.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // p,),
        in_specs=[blk, blk, _bspec(pl, ms, k_out.shape, _const_imap(2))],
        out_specs=(blk, _bspec(pl, ms, k_out.shape, _const_imap(2)),
                   _bspec(pl, ms, (1, c), _const_imap(2))),
        out_shape=(jax.ShapeDtypeStruct(g.shape, g.dtype),
                   jax.ShapeDtypeStruct(k_out.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        interpret=interpret,
    )(g, y_n, k_out.astype(g.dtype))


def _bwd_conv_in_gn(dy0: jax.Array, x: jax.Array, k_in: jax.Array,
                    gn_scale: jax.Array, gn_bias: jax.Array,
                    interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, length, c = x.shape
    p = _choose_pack(b, length, c)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}
    blk = _bspec(pl, ms, (p, length, c), lambda i: (i, 0, 0))
    vec = _bspec(pl, ms, (1, c), _const_imap(2))
    kernel = functools.partial(_bwd_convin_gn_kernel, p=p, length=length,
                               c=c, dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // p,),
        in_specs=[blk, blk, _bspec(pl, ms, k_in.shape, _const_imap(2)),
                  vec, vec],
        out_specs=(blk, _bspec(pl, ms, k_in.shape, _const_imap(2)),
                   vec, vec, vec),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(k_in.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        interpret=interpret,
    )(x, dy0, k_in.astype(x.dtype), gn_scale.astype(jnp.float32),
      gn_bias.astype(jnp.float32))


def _bwd_layer(dy: jax.Array, a_in: jax.Array, c_in: Optional[jax.Array],
               f_in: jax.Array, context: Optional[jax.Array],
               layer_ws: List[jax.Array], *, heads: int, head_dim: int,
               interpret: bool):
    """One layer's backward as a single Pallas program (grid over batch).
    Returns (dy_prev, dctx_or_None, flat layer weight grads in ABI order)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, length, c = a_in.shape
    cross = c_in is not None
    p = _choose_pack(b, length, c)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}
    blk = _bspec(pl, ms, (p, length, c), lambda i: (i, 0, 0))

    banks, plan = build_banks(layer_ws, dy.dtype)
    load_once = not interpret
    in_specs = [blk, blk] + ([blk] if cross else []) + [blk]
    operands: List[jax.Array] = [dy, a_in] + ([c_in] if cross else []) \
        + [f_in]
    ctx_len = ctx_c = 0
    if cross:
        ctx_len, ctx_c = context.shape[1], context.shape[2]
        in_specs.append(_bspec(pl, ms, (p, ctx_len, ctx_c),
                               lambda i: (i, 0, 0)))
        operands.append(context)
    scratch_shapes = []
    for wa in banks:
        wms = {"memory_space": pl.ANY} if load_once else ms
        in_specs.append(pl.BlockSpec(wa.shape, _const_imap(wa.ndim), **wms))
        operands.append(wa)
    if load_once:
        scratch_shapes = [pltpu.VMEM(wa.shape, wa.dtype) for wa in banks]
        scratch_shapes.append(pltpu.SemaphoreType.DMA((len(banks),)))

    out_specs = [blk]
    out_shape = [jax.ShapeDtypeStruct(a_in.shape, dy.dtype)]
    if cross:
        out_specs.append(_bspec(pl, ms, (p, ctx_len, ctx_c),
                                lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(context.shape, dy.dtype))
    for wa in banks:
        out_specs.append(_bspec(pl, ms, wa.shape, _const_imap(wa.ndim)))
        out_shape.append(jax.ShapeDtypeStruct(wa.shape, jnp.float32))

    kernel = functools.partial(
        _bwd_layer_entry, plan=tuple(plan), heads=heads, head_dim=head_dim,
        cross=cross, p=p, length=length, ctx_len=ctx_len, c=c, ctx_c=ctx_c,
        load_once=load_once, dtype=dy.dtype)
    bank_elems = sum(int(w.size) for w in banks)
    est = (bank_elems * dy.dtype.itemsize      # weights in VMEM scratch
           + 2 * bank_elems * 4                # fp32 grad banks (dbl-buf)
           + 2 * (4 + 2 * (2 if cross else 0))
           * p * max(length, ctx_len) * max(c, ctx_c) * dy.dtype.itemsize
           + 10 * p * length * c * 4 + (2 << 20))
    outs = pl.pallas_call(
        kernel,
        grid=(b // p,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **_compiler_params(pltpu, interpret, est),
    )(*operands)
    dy_prev = outs[0]
    dctx = outs[1] if cross else None
    dw_banks = outs[2 if cross else 1:]
    flat = [dw_banks[bi][sl] for bi, sl in plan]
    return dy_prev, dctx, flat


def _fused_backward(tree: Dict[str, Any], x: jax.Array,
                    context: Optional[jax.Array], stash: jax.Array,
                    g: jax.Array, *, num_layers: int, heads: int,
                    head_dim: int, interpret: bool):
    """Chain the backward segment kernels; returns (dtree, dx, dcontext)."""
    cross = context is not None
    ws = flatten_params(tree, num_layers, cross)
    per_layer = (16 if cross else 8) + 4
    per_stash = 3 if cross else 2
    ctx_cast = context.astype(x.dtype) if cross else None

    dy, dk_out, db_out = _bwd_conv_out(g, stash[-1], ws[-2], interpret)
    layer_flat: List[Optional[List[jax.Array]]] = [None] * num_layers
    dctx_sum = None
    for l in reversed(range(num_layers)):
        base_w = 4 + l * per_layer
        s0 = l * per_stash
        a_in = stash[s0]
        c_in = stash[s0 + 1] if cross else None
        f_in = stash[s0 + (2 if cross else 1)]
        dy, dctx_l, flat_l = _bwd_layer(
            dy, a_in, c_in, f_in, ctx_cast,
            ws[base_w:base_w + per_layer], heads=heads, head_dim=head_dim,
            interpret=interpret)
        layer_flat[l] = flat_l
        if cross:
            dctx_sum = dctx_l if dctx_sum is None else dctx_sum + dctx_l
    dx, dk_in, db_in, dgs, dgb = _bwd_conv_in_gn(
        dy, x, ws[2], ws[0], ws[1], interpret)

    flat: List[jax.Array] = [dgs, dgb, dk_in, db_in]
    for fl in layer_flat:
        flat += fl
    flat += [dk_out, db_out]
    dtree = unflatten_grads(flat, tree, num_layers, cross)
    dctx = (dctx_sum.astype(context.dtype) if cross else None)
    return dtree, dx.astype(x.dtype), dctx


# --------------------------------------------------------------------------
# public entry: custom-vjp wrapper (backward = autodiff of the slow path)
# --------------------------------------------------------------------------

def transformer1d_fused(tree: Dict[str, Any], x: jax.Array,
                        context: Optional[jax.Array], *, num_layers: int,
                        heads: int, head_dim: int, multiplier: int,
                        context_features: Optional[int],
                        interpret: Optional[bool] = None,
                        uniform_ctx: bool = False) -> jax.Array:
    """Run a Transformer1d stack as ONE Pallas program.

    ``tree`` is the module's own param subtree (``self.variables['params']``
    from inside the flax module) — identical layout to the slow path, so
    checkpoints and torch imports are untouched.

    ``uniform_ctx=True``: ``context`` is (1, ctx_len, C) shared by every
    batch element (the CFG null half) — cross attention runs as one dense
    shared-KV product.  Backward falls back to the legacy slow-path
    autodiff (the production sampler never differentiates this variant);
    its d(context) is the broadcast-summed cotangent, matching the
    broadcast the caller performs.
    """
    if interpret is None:
        interpret = _INTERPRET

    fused_bwd = _FUSED_BWD and not uniform_ctx

    def slow(tree, x, context):
        from ..nn.attention import Transformer1d
        mod = Transformer1d(
            num_layers=num_layers, channels=x.shape[-1], num_heads=heads,
            head_features=head_dim, multiplier=multiplier,
            context_features=context_features, dtype=x.dtype,
            disable_fusion=True)
        if context is None:
            return mod.apply({"params": tree}, x)
        if uniform_ctx:
            context = jnp.broadcast_to(
                context, (x.shape[0],) + context.shape[1:])
        return mod.apply({"params": tree}, x, context)

    @jax.custom_vjp
    def run(tree, x, context):
        ws = flatten_params(tree, num_layers, context is not None)
        return _fused_forward(ws, x, context, num_layers=num_layers,
                              heads=heads, head_dim=head_dim,
                              multiplier=multiplier, interpret=interpret,
                              uniform_ctx=uniform_ctx)

    def fwd(tree, x, context):
        if not fused_bwd:
            return run(tree, x, context), (tree, x, context, None)
        ws = flatten_params(tree, num_layers, context is not None)
        out, stash = _fused_forward(
            ws, x, context, num_layers=num_layers, heads=heads,
            head_dim=head_dim, multiplier=multiplier, interpret=interpret,
            with_stash=True)
        return out, (tree, x, context, stash)

    def bwd(res, g):
        tree, x, context, stash = res
        if stash is not None:
            return _fused_backward(tree, x, context, stash, g,
                                   num_layers=num_layers, heads=heads,
                                   head_dim=head_dim, interpret=interpret)
        # legacy path: XLA autodiff of the slow composition (recomputes the
        # forward — rematerialization); kept selectable for measurement
        if context is None:
            _, pullback = jax.vjp(lambda t, xx: slow(t, xx, None), tree, x)
            dt, dx = pullback(g)
            return dt, dx, None
        _, pullback = jax.vjp(slow, tree, x, context)
        return pullback(g)

    run.defvjp(fwd, bwd)
    return run(tree, x, context)


def fusable(x: jax.Array, context: Optional[jax.Array],
            use_rel_pos: bool, context_features: Optional[int],
            dtype=None, num_layers: Optional[int] = None,
            heads: Optional[int] = None, head_dim: Optional[int] = None,
            multiplier: Optional[int] = None) -> bool:
    """Static shape/feature gate for the fused path."""
    if use_rel_pos:
        return False
    if x.shape[1] > 512:
        # The megakernel is the SHORT-sequence stack design (weights
        # VMEM-resident, block-diagonal packed attention — molecule
        # geometry, L<=64; audio low-res levels, L<=256).  At long L it
        # has no measured upside (L=1024 inside the 2**13 audio graph:
        # fused 3.060 vs XLA 3.095 ms/step — neutral) and a real
        # downside: inside the 2**15 audio graph, XLA's VMEM stack
        # allocator fails to co-allocate the kernel's block with the
        # surrounding long-L conv activations ("Ran out of memory in
        # memory space vmem while allocating on stack") even though the
        # kernel compiles fine in isolation.  Long sequences take the
        # XLA composition, whose attention auto-routes to the blockwise
        # flash kernels at L>=2048 (nn/attention.py::packed_sdpa).
        return False
    if dtype is not None and x.dtype != dtype:
        # the kernel computes in x.dtype and the custom-vjp backward
        # rebuilds the slow module with dtype=x.dtype; a module configured
        # with a different dtype would silently diverge from its slow path
        return False
    c = x.shape[-1]
    if c % 32:
        return False                       # GroupNorm(32) layout
    # context presence must match the config: the slow path asserts on a
    # missing context (and ignores a spurious one); never diverge from it
    has_cross = context_features is not None and context_features > 0
    if has_cross != (context is not None):
        return False
    if num_layers is not None:
        # VMEM budget: every kernel this config can launch (training
        # forward WITH the activation stash, and the per-layer backward
        # with its fp32 grad banks) must fit the raised scoped cap;
        # configs beyond it would OOM the Mosaic compile — use XLA.
        itemsize = x.dtype.itemsize
        bank = _weight_bank_bytes(
            c, (heads or 8) * (head_dim or 64),
            context.shape[-1] if has_cross else 0, num_layers,
            multiplier or 2, itemsize)
        p = _choose_pack(x.shape[0], x.shape[1], c)
        est_fwd = _fwd_vmem_estimate(
            bank, p, x.shape[1], c,
            p * context.shape[1] if has_cross else 0,
            context.shape[-1] if has_cross else 0,
            n_stash_slots(num_layers, has_cross), itemsize)
        layer_bytes = bank // max(num_layers, 1)
        est_bwd = (layer_bytes                       # weights in scratch
                   + 2 * layer_bytes * 4 // itemsize  # fp32 grad banks
                   + 10 * p * x.shape[1] * c * 4 + (2 << 20))
        if max(est_fwd, est_bwd) > _VMEM_CAP_BYTES:
            return False
    return True
