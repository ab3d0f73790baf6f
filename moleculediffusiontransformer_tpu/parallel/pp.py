"""Pipeline parallelism (pp): GPipe microbatching over the decoder trunk.

The AR decoders (``models/transformers.py``, reference
``transformer.py:543-720``) are a homogeneous stack of ``depth`` identical
(self-attention, cross-attention, feed-forward) layers — the textbook
pipeline shape.  This module shards the LAYER axis over a mesh axis
('stage'): each chip holds ``depth / n_stages`` layers' params and
activations stream through the stages as microbatches, overlapping stage
compute in the classic GPipe schedule.

TPU-native formulation (scaling-book pipelining chapter): ONE jitted SPMD
program via ``jax.shard_map`` —

  * per-layer params are STACKED on a leading ``depth`` axis and sharded
    over 'stage' (``stack_layer_params`` + ``P('stage')``), so each chip
    materializes only its own layers;
  * a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks: every tick each
    stage applies its local layers (an inner ``lax.scan`` over the stacked
    slice) and hands its activation to the next stage with a single
    ``lax.ppermute`` hop over ICI;
  * stage roles (feed at 0, collect at n-1) are data — ``lax.axis_index``
    + ``jnp.where`` — not Python control flow, so the program is identical
    on every chip;
  * the backward pass is just ``jax.grad`` of the scan: XLA transposes the
    ``ppermute`` (reverse hop) and re-runs the schedule in reverse — no
    hand-written 1F1B machinery.

The pipeline is exact (no approximation): outputs equal the sequential
trunk up to reduction order, pinned by ``tests/test_pp.py``.  Not needed
at the reference's scale (≤91M params fits one chip — ``docs/SCALING.md``);
this is the depth-growth scaling axis, composing with DP ('data') on the
other mesh axis.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_LAYER_RE = re.compile(r"^layers_(\d+)_(.+)$")


def stack_layer_params(params: Dict[str, Any], depth: int
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a decoder param tree into (stacked layer params, rest).

    ``params`` holds per-layer subtrees named ``layers_{i}_{suffix}``
    (suffix in 0 / 1 / 2_0 / 2_1 / 2_3 / 2_4 — the torch-mirrored naming,
    CLAUDE.md conventions).  The stacked tree maps suffix -> subtree whose
    leaves gained a leading ``depth`` axis, ready to shard over 'stage'.
    """
    by_suffix: Dict[str, Dict[int, Any]] = {}
    rest: Dict[str, Any] = {}
    for k, v in params.items():
        m = _LAYER_RE.match(k)
        if m:
            by_suffix.setdefault(m.group(2), {})[int(m.group(1))] = v
        else:
            rest[k] = v
    stacked = {}
    for sfx, by_i in by_suffix.items():
        if len(by_i) != depth:
            raise ValueError(
                f"layer suffix {sfx}: found {sorted(by_i)} != depth {depth}")
        stacked[sfx] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[by_i[i] for i in range(depth)])
    return stacked, rest


def unstack_layer_params(stacked: Dict[str, Any], rest: Dict[str, Any]
                         ) -> Dict[str, Any]:
    """Inverse of :func:`stack_layer_params` (e.g. for checkpoint export)."""
    params = dict(rest)
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for sfx, tree in stacked.items():
        for i in range(depth):
            params[f"layers_{i}_{sfx}"] = jax.tree_util.tree_map(
                lambda x: x[i], tree)
    return params


def make_layer_apply(model) -> Callable:
    """One-trunk-layer apply: ``fn(layer_params, rest, x, cond, text_mask)``.

    Runs layer 0's module graph (all layers are identical by construction,
    ``models/transformers.py::_DecoderBase._make_layers``) with the given
    layer's params renamed into slot 0 — the same residual wiring as
    ``_trunk``: x = selfattn(x)+x; x = crossattn(x, cond)+x; x = ff(x)+x.

    ``rest`` (the non-layer params) must be passed too: flax ``setup``
    creates direct ``self.param`` leaves (e.g. ``start_token``) eagerly at
    every apply, so the scope needs them present even though the layer
    never reads them.
    """
    def one_layer(mdl, x, cond, text_mask):
        x = getattr(mdl, "layers_0_0")(x) + x
        x = getattr(mdl, "layers_0_1")(
            x, context=cond, context_mask=text_mask) + x
        x = mdl.ff(0, x) + x
        return x

    def apply_layer(layer_params, rest, x, cond, text_mask):
        p = dict(rest)
        p.update({f"layers_0_{sfx}": v for sfx, v in layer_params.items()})
        return model.apply({"params": p}, x, cond, text_mask,
                           method=one_layer)

    return apply_layer


def split_microbatches(x: jax.Array, n_micro: int) -> jax.Array:
    """(b, ...) -> (n_micro, b/n_micro, ...)."""
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    return x.reshape((n_micro, b // n_micro) + x.shape[1:])


def shard_stacked(mesh: Mesh, stacked: Dict[str, Any],
                  axis: str = "stage") -> Dict[str, Any]:
    """Place stacked layer params with the depth axis sharded over `axis`."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), stacked)


def pipeline_layers(mesh: Mesh, apply_layer: Callable,
                    stacked: Dict[str, Any], rest: Dict[str, Any],
                    x_micro: jax.Array, cond_micro: jax.Array,
                    mask_micro: jax.Array, axis: str = "stage",
                    data_axis: Optional[str] = None) -> jax.Array:
    """Run the microbatches through the layer pipeline; returns y_micro.

    ``stacked`` leaves carry the leading ``depth`` axis (sharded over
    `axis`); ``x_micro`` (n_micro, mb, L, dim), ``cond_micro``
    (n_micro, mb, L_ctx, C), ``mask_micro`` (n_micro, mb, L_ctx) are
    replicated over `axis` — only stage 0 reads fresh microbatches, the
    rest arrive by ``ppermute``.  Differentiable end-to-end (GPipe
    backward by transpose).

    ``data_axis`` composes pp with DP on a 2-D (data, stage) mesh: each
    microbatch's CONTENT (the mb dim) is sharded over `data_axis`, so the
    same pipeline schedule runs in parallel on batch slices — the only
    cross-'data' traffic is the gradient psum jit inserts in the backward.
    """
    n_stages = mesh.shape[axis]
    dspec = P(None, data_axis) if data_axis else P()
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    n_micro = x_micro.shape[0]
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(stacked_l, rest_r, x_m, cond_m, mask_m):
        sidx = lax.axis_index(axis)

        def local_apply(x, cond, mask):
            def body(c, lp):
                return apply_layer(lp, rest_r, c, cond, mask), None
            x, _ = lax.scan(body, x, stacked_l)
            return x

        def tick(carry, t):
            x_state, outbuf = carry
            # which microbatch THIS stage works on at tick t
            m = jnp.clip(t - sidx, 0, n_micro - 1)
            inp = lax.dynamic_index_in_dim(
                x_m, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            x_cur = jnp.where(jnp.equal(sidx, 0), inp, x_state)
            cond_t = lax.dynamic_index_in_dim(cond_m, m, 0, keepdims=False)
            mask_t = lax.dynamic_index_in_dim(mask_m, m, 0, keepdims=False)
            y = local_apply(x_cur, cond_t, mask_t)
            # the LAST stage has finished microbatch t-(n_stages-1)
            slot = t - (n_stages - 1)
            sc = jnp.clip(slot, 0, n_micro - 1)
            write = jnp.logical_and(jnp.equal(sidx, n_stages - 1), slot >= 0)
            prev = lax.dynamic_index_in_dim(outbuf, sc, 0, keepdims=False)
            outbuf = lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, y, prev), sc, 0)
            x_next = lax.ppermute(y, axis, ring)
            return (x_next, outbuf), None

        carry0 = (jnp.zeros_like(x_m[0]), jnp.zeros_like(x_m))
        (_, outbuf), _ = lax.scan(tick, carry0,
                                  jnp.arange(n_micro + n_stages - 1))
        # broadcast the last stage's collected outputs to every chip
        return lax.psum(
            jnp.where(jnp.equal(sidx, n_stages - 1), outbuf,
                      jnp.zeros_like(outbuf)), axis)

    return jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(), dspec, dspec, dspec),
        out_specs=dspec,
        check_vma=False,  # stage-gated writes are device-varying by design
    )(stacked, rest, x_micro, cond_micro, mask_micro)


def pipeline_forward(model, params: Dict[str, Any], sequences: jax.Array,
                     output: jax.Array, *, mesh: Mesh, n_micro: int,
                     return_loss: bool = False,
                     cond_drop_prob: float = 0.0,
                     key: Optional[jax.Array] = None,
                     axis: str = "stage",
                     data_axis: Optional[str] = None):
    """Full AR-decoder forward with the trunk pipelined.

    Works for every ``_DecoderBase`` subclass: the continuous
    ``MoleculeTransformer`` (MSE objective, ``transformer.py:683-685``)
    and the token-ID decoders (``MoleculeTransformerSequence`` /
    ``...Internaldim``, shifted cross-entropy, ``transformer.py:884-886``).
    Embedding / conditioning / final head run replicated (they are tiny);
    the depth-``n`` layer stack streams through the 'stage' axis.  With
    ``return_loss`` this IS the training objective, so ``jax.grad`` of it
    is a pipeline train step.
    """
    continuous = hasattr(model, "embed_vectors")

    def pre(mdl, sequences, output, key):
        cond = mdl.embed_conditioning(sequences)
        target = None
        if continuous:
            x = mdl.embed_vectors(output)
            if return_loss:
                x, target = x[:, :-1], x[:, 1:, :mdl.logits_dim]
        else:
            x = mdl.embed_tokens(output)
            if return_loss:
                target = output[:, 1:]
        cond, text_mask = mdl._text_mask(cond, None, cond_drop_prob, key)
        return mdl.init_norm(x), cond, text_mask, target

    def post(mdl, x):
        return mdl.to_logits(mdl.final_norm(x))

    x, cond, text_mask, target = model.apply(
        {"params": params}, sequences, output, key, method=pre)
    stacked, rest = stack_layer_params(params, model.depth)
    stacked = shard_stacked(mesh, stacked, axis)

    x_m = split_microbatches(x, n_micro)
    cond_m = split_microbatches(cond, n_micro)
    mask_m = split_microbatches(text_mask, n_micro)
    y_m = pipeline_layers(mesh, make_layer_apply(model), stacked, rest,
                          x_m, cond_m, mask_m, axis, data_axis)
    y = y_m.reshape((-1,) + y_m.shape[2:])
    logits = model.apply({"params": params}, y, method=post)
    if not return_loss:
        return logits
    if continuous:
        return jnp.mean(jnp.square(logits - target))
    from ..models.transformers import cross_entropy_mean
    return cross_entropy_mean(logits[:, :-1], target)
