"""Fused ResnetBlock1d stacks as one Pallas program.

Reference hot path: `modules.py:84-205` (GroupNorm -> [FiLM] -> SiLU ->
Conv1d, twice, plus skip) — executed ~20 times per denoise eval between the
transformer stacks.  Same playbook as ``ops.transformer_fusion`` (see that
module for the measured rationale): grid over batch packs, per-shape weight
banks DMA'd once into VMEM scratch, GroupNorm as segment-indicator matmuls,
k=3 convs as shifted-row im2col assembled in VMEM, everything in one
program so the ~12 ops per ResnetBlock stop paying the per-op floor.

Supports the three UNet stack layouts:
  * DownsampleBlock's ``blocks_i`` run (same channels, optionally emitting
    every block's output as a skip);
  * UpsampleBlock's run (per-block skip CONCAT on the channel axis, with
    the 1x1 ``to_out`` projection the widened input requires);
  * single-block stacks (bottleneck pre/post).

MEASURED OUTCOME (v5e, 500-iter scans, B=512): the fused stacks LOSE to
XLA's composition — stage-0 (L=16,C=128) 70 -> 260 us, stage-1
(L=4,C=256) 55 -> 135 us true cost.  XLA already compiles the
GN->SiLU->conv chain near-optimally at these shapes (convs are im2col
matmuls it fuses aggressively), and the segment-matmul GroupNorm +
shifted-row patch assembly cost more than the per-op overhead they
remove.  The module is therefore gated behind its OWN default-off switch
(``enable_resnet_fusion``) and kept as tested infrastructure + a recorded
negative result; ``transformer_fusion.enable_fusion`` does NOT activate
it.  Differentiable via custom_vjp with the slow composition's autodiff.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transformer_fusion import build_banks

Tree = Dict[str, Any]

_RESNET_ENABLED = False


def enable_resnet_fusion(on: bool = True) -> None:
    """Opt-in switch for the fused resnet stacks (default OFF — measured
    slower than XLA's composition at the production shapes; see module
    docstring)."""
    global _RESNET_ENABLED
    _RESNET_ENABLED = on


def resnet_fusion_enabled() -> bool:
    return _RESNET_ENABLED


def _vec(w: jax.Array) -> jax.Array:
    return w.reshape(1, -1)


def flatten_stack(trees: Sequence[Tree], use_mapping: bool) -> List[jax.Array]:
    """Per-block weight ABI (order is the kernel contract)."""
    ws: List[jax.Array] = []
    for t in trees:
        b1 = t["block1"]
        ws += [_vec(b1["groupnorm"]["scale"]), _vec(b1["groupnorm"]["bias"]),
               b1["project"]["kernel"].reshape(-1,
                                               b1["project"]["kernel"].shape[-1]),
               _vec(b1["project"]["bias"])]
        if use_mapping:
            f = t["to_scale_shift"]["to_scale_shift_1"]
            ws += [f["kernel"], _vec(f["bias"])]
        b2 = t["block2"]
        ws += [_vec(b2["groupnorm"]["scale"]), _vec(b2["groupnorm"]["bias"]),
               b2["project"]["kernel"].reshape(-1,
                                               b2["project"]["kernel"].shape[-1]),
               _vec(b2["project"]["bias"])]
        if "to_out" in t:
            ws += [t["to_out"]["kernel"][0], _vec(t["to_out"]["bias"])]
    return ws


def _kernel(refs, *, plan, num_blocks: int, has_skip: Tuple[bool, ...],
            has_proj: Tuple[bool, ...], use_mapping: bool, groups: int,
            p: int, length: int, skip_scale: float, collect: bool,
            load_once: bool, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    it = iter(refs)
    x_ref = next(it)
    map_ref = next(it) if use_mapping else None
    skip_refs = [next(it) if s else None for s in has_skip]
    n_banks = max(b for b, _ in plan) + 1
    hbm_banks = [next(it) for _ in range(n_banks)]
    out_ref = next(it)
    collect_refs = [next(it) for _ in range(num_blocks)] if collect else []
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
    plan_it = iter(plan)

    def w():
        bi, slot = next(plan_it)
        return banks[bi][slot]

    def _ids(shape, dim, divisor):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
        return jax.lax.div(i, jnp.int32(divisor))

    rows = p * length
    x = x_ref[:].reshape(rows, x_ref.shape[-1])

    # segment / group indicators (shared across blocks; lanes re-built per
    # channel width inside group_norm)
    seg = (_ids((p, rows), 1, length)
           == jax.lax.broadcasted_iota(jnp.int32, (p, rows), 0)
           ).astype(jnp.float32)                                 # (P, R)
    pos = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), jnp.int32(length))

    def _dot32(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def group_norm(v32, scale, bias, c):
        grp = (_ids((c, groups), 0, c // groups)
               == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
               ).astype(jnp.float32)
        n_elem = float(length * (c // groups))
        gmean = _dot32(_dot32(seg, v32), grp) / n_elem
        mean_rows = _dot32(seg.T, _dot32(gmean, grp.T))
        vc = v32 - mean_rows
        gvar = _dot32(_dot32(seg, vc * vc), grp) / n_elem
        var_rows = _dot32(seg.T, _dot32(gvar, grp.T))
        return (vc * jax.lax.rsqrt(var_rows + 1e-5)
                * scale.astype(jnp.float32) + bias.astype(jnp.float32))

    def silu(v32):
        return v32 * (1.0 / (1.0 + jnp.exp(-v32)))

    def conv3(v, wk, bk):
        """k=3, pad=1 conv via shifted-row im2col; pack boundaries zero."""
        c = v.shape[-1]
        z = jnp.zeros_like(v[:1])
        prev = jnp.concatenate([z, v[:-1]], axis=0)
        # NB raw lax.select — jnp.where lowers as a closed jit call that
        # Mosaic rejects (same gotcha as transformer_fusion)
        prev = jax.lax.select(jnp.broadcast_to(pos == 0, (rows, c)),
                              jnp.zeros_like(prev), prev)
        nxt = jnp.concatenate([v[1:], z], axis=0)
        nxt = jax.lax.select(jnp.broadcast_to(pos == length - 1, (rows, c)),
                             jnp.zeros_like(nxt), nxt)
        patches = jnp.concatenate([prev, v, nxt], axis=-1)       # (R, 3C)
        return _dot32(patches, wk) + bk.astype(jnp.float32)

    if use_mapping:
        mp32 = map_ref[:].astype(jnp.float32)                    # (P, Cm)

    for i in range(num_blocks):
        if skip_refs[i] is not None:
            sk = skip_refs[i][:]
            sk = sk.reshape(rows, sk.shape[-1]) * jnp.asarray(
                skip_scale, sk.dtype)
            x = jnp.concatenate([x, sk], axis=-1)
        cin = x.shape[-1]
        g1s, g1b, w1, b1 = w(), w(), w(), w()
        if use_mapping:
            fw, fb = w(), w()
        g2s, g2b, w2, b2 = w(), w(), w(), w()

        h = group_norm(x.astype(jnp.float32), g1s, g1b, cin)
        h = conv3(silu(h).astype(dtype), w1, b1).astype(dtype)
        c = h.shape[-1]
        h32 = group_norm(h.astype(jnp.float32), g2s, g2b, c)
        if use_mapping:
            ss = _dot32(silu(mp32).astype(dtype), fw) \
                + fb.astype(jnp.float32)                         # (P, 2C)
            scale_rows = _dot32(seg.T, ss[:, :c])                # (R, C)
            shift_rows = _dot32(seg.T, ss[:, c:])
            h32 = h32 * (scale_rows + 1.0) + shift_rows
        h = conv3(silu(h32).astype(dtype), w2, b2).astype(dtype)
        if has_proj[i]:
            pw, pb = w(), w()
            x = (_dot32(x, pw) + pb.astype(jnp.float32)).astype(dtype)
        x = h + x
        if collect:
            collect_refs[i][:] = x.reshape(p, length, c)

    out_ref[:] = x.reshape(p, length, x.shape[-1])


def _kernel_entry(*refs, **kw):
    _kernel(refs, **kw)


def _choose_p(batch: int, length: int, channels: int) -> int:
    target = 256 if channels <= 128 else 128
    p = max(1, target // length)
    while p > 1 and batch % p:
        p -= 1
    return p


def _fused_forward(ws, x, mapping, skips, *, num_blocks, has_skip, has_proj,
                   use_mapping, groups, skip_scale, collect,
                   interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length, c_in = x.shape
    out_c = ws_out_channels(ws, has_proj)
    p = _choose_p(b, length, max(c_in, out_c))
    grid = (b // p,)
    ms = {} if interpret else {"memory_space": pltpu.VMEM}

    in_specs = [pl.BlockSpec((p, length, c_in), lambda i: (i, 0, 0), **ms)]
    operands: List[jax.Array] = [x]
    if use_mapping:
        in_specs.append(pl.BlockSpec((p, mapping.shape[-1]),
                                     lambda i: (i, 0), **ms))
        operands.append(mapping.astype(x.dtype))
    for i, s in enumerate(has_skip):
        if s:
            sk = skips[i]
            in_specs.append(pl.BlockSpec(
                (p, length, sk.shape[-1]), lambda i_: (i_, 0, 0), **ms))
            operands.append(sk.astype(x.dtype))
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

    out_shapes = [jax.ShapeDtypeStruct((b, length, out_c), x.dtype)]
    out_specs = [pl.BlockSpec((p, length, out_c), lambda i: (i, 0, 0), **ms)]
    if collect:
        for _ in range(num_blocks):
            out_shapes.append(jax.ShapeDtypeStruct((b, length, out_c),
                                                   x.dtype))
            out_specs.append(pl.BlockSpec((p, length, out_c),
                                          lambda i: (i, 0, 0), **ms))

    kernel = functools.partial(
        _kernel_entry, plan=tuple(plan), num_blocks=num_blocks,
        has_skip=tuple(has_skip), has_proj=tuple(has_proj),
        use_mapping=use_mapping, groups=groups, p=p, length=length,
        skip_scale=skip_scale, collect=collect, load_once=load_once,
        dtype=x.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)
    if collect:
        return outs[0], list(outs[1:])
    return outs, []


def ws_out_channels(ws, has_proj) -> int:
    """Output channel count from the last block's conv2 kernel (which sits
    2 — or 4 when the block has a skip projection — entries from the end
    of the ABI list)."""
    back = 2 + (2 if has_proj[-1] else 0)
    return ws[len(ws) - back].shape[-1]


def resnet_stack_fused(trees: Sequence[Tree], x: jax.Array,
                       mapping: Optional[jax.Array],
                       skips: Optional[Sequence[Optional[jax.Array]]] = None,
                       *, groups: int = 8, skip_scale: float = 1.0,
                       collect: bool = False,
                       interpret: Optional[bool] = None
                       ) -> Tuple[jax.Array, List[jax.Array]]:
    """Run N ResnetBlock1d's as ONE Pallas program.

    ``trees[i]`` is block i's param subtree (``blocks_i``); ``skips[i]``
    (optional per block) is concatenated on channels before block i with
    ``skip_scale`` (UpsampleBlock semantics); ``collect`` returns every
    block's output (DownsampleBlock skip collection).
    """
    from . import transformer_fusion as tf
    if interpret is None:
        interpret = tf._INTERPRET
    num_blocks = len(trees)
    use_mapping = "to_scale_shift" in trees[0]
    has_proj = tuple("to_out" in t for t in trees)
    if skips is None:
        skips = [None] * num_blocks
    has_skip = tuple(s is not None for s in skips)
    skips_in = [s for s in skips]

    def slow(trees, x, mapping, skip_list):
        from ..nn.blocks import ResnetBlock1d
        outs = []
        for i, t in enumerate(trees):
            if skip_list[i] is not None:
                x = jnp.concatenate(
                    [x, skip_list[i] * jnp.asarray(skip_scale, x.dtype)],
                    axis=-1)
            out_c = t["block2"]["project"]["kernel"].shape[-1]
            mod = ResnetBlock1d(out_c, num_groups=groups,
                                use_mapping=use_mapping, dtype=x.dtype)
            x = mod.apply({"params": t}, x, mapping)
            outs.append(x)
        return x, outs

    @jax.custom_vjp
    def run(trees, x, mapping, skip_list):
        ws = flatten_stack(trees, use_mapping)
        return _fused_forward(
            ws, x, mapping, skip_list, num_blocks=num_blocks,
            has_skip=has_skip, has_proj=has_proj, use_mapping=use_mapping,
            groups=groups, skip_scale=skip_scale, collect=collect,
            interpret=interpret)

    def fwd(trees, x, mapping, skip_list):
        return run(trees, x, mapping, skip_list), (trees, x, mapping,
                                                   skip_list)

    def bwd(res, g):
        trees, x, mapping, skip_list = res
        gx, gouts = g

        def f(trees, x, mapping, skip_list):
            out, outs = slow(trees, x, mapping, skip_list)
            return out, outs if collect else []

        _, pullback = jax.vjp(f, trees, x, mapping, skip_list)
        return pullback((gx, gouts))

    run.defvjp(fwd, bwd)
    out, block_outs = run(list(trees), x, mapping, skips_in)
    return out, block_outs


def fusable(x: jax.Array, trees: Sequence[Tree], groups: int,
            kernel_size: int = 3) -> bool:
    if kernel_size != 3 or not trees:
        return False
    if x.shape[-1] % groups:
        return False
    for t in trees:
        c = t["block2"]["project"]["kernel"].shape[-1]
        if c % groups or t["block1"]["project"]["kernel"].shape[0] != 3:
            return False
    return True
