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

Enable with ``enable_fusion()`` / the ``fused()`` context manager — off by
default so CPU test meshes and fp32 parity paths are untouched.
"""
from __future__ import annotations

import contextlib
import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED = False
_INTERPRET = False       # run kernels in interpreter mode (CPU tests)
_ABLATE: set = set()     # profiling knob: {"attn", "gn", "ff", "cross"}


def enable_fusion(on: bool = True) -> None:
    """Globally enable the fused Transformer1d path (trace-time flag:
    models must be re-jitted after flipping)."""
    global _ENABLED
    _ENABLED = on


def fusion_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def fused(on: bool = True):
    global _ENABLED
    prev = _ENABLED
    _ENABLED = on
    try:
        yield
    finally:
        _ENABLED = prev


# --------------------------------------------------------------------------
# weight flattening (order is the kernel ABI)
# --------------------------------------------------------------------------

def _vec(w: jax.Array) -> jax.Array:
    return w.reshape(1, -1)


def flatten_params(tree: Dict[str, Any], num_layers: int,
                   cross: bool) -> List[jax.Array]:
    """Transformer1d param subtree -> flat weight list (all >= 2-D)."""
    ws: List[jax.Array] = [
        _vec(tree["to_in_0"]["scale"]), _vec(tree["to_in_0"]["bias"]),
        tree["to_in_1"]["kernel"][0], _vec(tree["to_in_1"]["bias"]),
    ]

    def attn(a: Dict[str, Any]) -> List[jax.Array]:
        return [
            _vec(a["norm"]["scale"]), _vec(a["norm"]["bias"]),
            _vec(a["norm_context"]["scale"]), _vec(a["norm_context"]["bias"]),
            a["to_q"]["kernel"], a["to_kv"]["kernel"],
            a["attention"]["to_out"]["kernel"],
            _vec(a["attention"]["to_out"]["bias"]),
        ]

    for i in range(num_layers):
        blk = tree[f"blocks_{i}"]
        ws += attn(blk["attention"])
        if cross:
            ws += attn(blk["cross_attention"])
        ws += [blk["feed_forward_0"]["kernel"],
               _vec(blk["feed_forward_0"]["bias"]),
               blk["feed_forward_2"]["kernel"],
               _vec(blk["feed_forward_2"]["bias"])]

    ws += [tree["to_out_1"]["kernel"][0], _vec(tree["to_out_1"]["bias"])]
    return ws


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
            multiplier: int, cross: bool, p: int, length: int,
            ctx_len: int, sub_packs: int, load_once: bool, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    it = iter(refs)
    x_ref = next(it)
    ctx_ref = next(it) if cross else None
    n_banks = max(b for b, _ in plan) + 1
    hbm_banks = [next(it) for _ in range(n_banks)]
    out_ref = next(it)
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
    # Mosaic lowering rejects.
    def _blk_ids(shape, dim, divisor):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
        return jax.lax.div(i, jnp.int32(divisor))

    # -------- load activations --------------------------------------------
    rows = p * length
    c = x_ref.shape[-1]
    x = x_ref[:].reshape(rows, c)

    # Attention runs on chunks of g packs with g*L ~ one 128-row MXU tile.
    # (Measured alternative: shrinking g until g*kv_len <= 128 lanes cuts
    # the block-diagonal softmax waste quadratically but loses MORE to
    # small-GEMM issue latency — 559 -> 722 us/call on the L=4,C=256
    # stage.  Rows win; keep the q side at full tiles.)
    def _chunk_g(kv_per_pack: int) -> int:
        g = p
        while g > 1 and (g * length > 128 or p % g):
            g -= 1
        return max(g, 1)

    g_self = _chunk_g(length)
    self_mask = (_blk_ids((g_self * length, g_self * length), 0, length)
                 == _blk_ids((g_self * length, g_self * length), 1, length))
    if cross:
        ctx = ctx_ref[:].reshape(p * ctx_len, ctx_ref.shape[-1])
        g_cross = _chunk_g(ctx_len)
        cross_mask = (_blk_ids((g_cross * length, g_cross * ctx_len), 0,
                               length)
                      == _blk_ids((g_cross * length, g_cross * ctx_len), 1,
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
        seg = (_blk_ids((p, rows), 1, length)
               == jax.lax.broadcasted_iota(jnp.int32, (p, rows), 0)
               ).astype(jnp.float32)                             # (P, R)
        grp = (_blk_ids((c, groups), 0, cpg)
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

    for _ in range(num_layers):
        ns, nb, cs, cb, wq, wkv, wout, bout = (w() for _ in range(8))
        y = attention(y, y, length, g_self, self_mask, wq, wkv, wout, bout,
                      ns, nb, cs, cb) + y
        if cross:
            ns, nb, cs, cb, wq, wkv, wout, bout = (w() for _ in range(8))
            if "cross" not in _ABLATE:
                y = attention(y, ctx, ctx_len, g_cross, cross_mask, wq, wkv,
                              wout, bout, ns, nb, cs, cb) + y
        w0, b0, w2, b2 = w(), w(), w(), w()
        if "ff" not in _ABLATE:
            h32 = _dot32(y, w0) + b0.astype(jnp.float32)
            g = 0.5 * h32 * (1.0 + _erf(h32 * np.float32(1.0 / np.sqrt(2.0))))
            y = (_dot32(g.astype(dtype), w2)
                 + b2.astype(jnp.float32)).astype(dtype) + y

    k_out, b_out = w(), w()
    out = (_dot32(y, k_out) + b_out.astype(jnp.float32)).astype(dtype)
    out_ref[:] = out.reshape(p, length, c)


def _choose_pack(batch: int, length: int, channels: int
                 ) -> Tuple[int, int]:
    """(packs per program, packs per attention sub-block).

    Sub-blocks keep the packed-SDPA granularity (~128 rows); the program
    carries as many sub-blocks as the VMEM weight budget allows — fewer,
    fatter programs amortize the measured per-grid-step cost.
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
    return p, sub


def _fused_forward(ws: List[jax.Array], x: jax.Array,
                   context: Optional[jax.Array], *, num_layers: int,
                   heads: int, head_dim: int, multiplier: int,
                   interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length, c = x.shape
    cross = context is not None
    p, sub_packs = _choose_pack(b, length, c)
    grid = (b // p,)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}

    in_specs = [pl.BlockSpec((p, length, c), lambda i: (i, 0, 0), **ms)]
    operands: List[jax.Array] = [x]
    ctx_len = 0
    if cross:
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
        head_dim=head_dim, multiplier=multiplier, cross=cross, p=p,
        length=length, ctx_len=ctx_len, sub_packs=sub_packs,
        load_once=load_once, dtype=x.dtype)

    flops = 2 * b * length * c * (
        num_layers * (3 * c + 4 * heads * head_dim
                      + 2 * multiplier * c) + 2 * c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((p, length, c), lambda i: (i, 0, 0), **ms),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 * x.dtype.itemsize,
            transcendentals=b * length * c * multiplier * num_layers),
        interpret=interpret,
    )(*operands)


def _kernel_entry(*refs, **kw):
    _kernel(refs, **kw)


# --------------------------------------------------------------------------
# public entry: custom-vjp wrapper (backward = autodiff of the slow path)
# --------------------------------------------------------------------------

def transformer1d_fused(tree: Dict[str, Any], x: jax.Array,
                        context: Optional[jax.Array], *, num_layers: int,
                        heads: int, head_dim: int, multiplier: int,
                        context_features: Optional[int],
                        interpret: Optional[bool] = None) -> jax.Array:
    """Run a Transformer1d stack as ONE Pallas program.

    ``tree`` is the module's own param subtree (``self.variables['params']``
    from inside the flax module) — identical layout to the slow path, so
    checkpoints and torch imports are untouched.
    """
    if interpret is None:
        interpret = _INTERPRET

    def slow(tree, x, context):
        from ..nn.attention import Transformer1d
        mod = Transformer1d(
            num_layers=num_layers, channels=x.shape[-1], num_heads=heads,
            head_features=head_dim, multiplier=multiplier,
            context_features=context_features, dtype=x.dtype,
            disable_fusion=True)
        if context is None:
            return mod.apply({"params": tree}, x)
        return mod.apply({"params": tree}, x, context)

    @jax.custom_vjp
    def run(tree, x, context):
        ws = flatten_params(tree, num_layers, context is not None)
        return _fused_forward(ws, x, context, num_layers=num_layers,
                              heads=heads, head_dim=head_dim,
                              multiplier=multiplier, interpret=interpret)

    def fwd(tree, x, context):
        return run(tree, x, context), (tree, x, context)

    def bwd(res, g):
        tree, x, context = res
        if context is None:
            _, pullback = jax.vjp(lambda t, xx: slow(t, xx, None), tree, x)
            dt, dx = pullback(g)
            return dt, dx, None
        _, pullback = jax.vjp(slow, tree, x, context)
        return pullback(g)

    run.defvjp(fwd, bwd)
    return run(tree, x, context)


def fusable(x: jax.Array, context: Optional[jax.Array],
            use_rel_pos: bool, context_features: Optional[int]) -> bool:
    """Static shape/feature gate for the fused path."""
    if use_rel_pos:
        return False
    c = x.shape[-1]
    if c % 32:
        return False                       # GroupNorm(32) layout
    # context presence must match the config: the slow path asserts on a
    # missing context (and ignores a spurious one); never diverge from it
    has_cross = context_features is not None and context_features > 0
    if has_cross != (context is not None):
        return False
    return True
