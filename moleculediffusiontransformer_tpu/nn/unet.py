"""The 1-D denoiser UNet and its CFG/NCCA variants
(reference `modules.py:574-1326`).

TPU-native re-design decisions:
  * channels-last (b, L, C) — channels on the TPU lane dimension.
  * Classifier-free guidance runs as ONE doubled-batch forward pass
    (cond ++ null stacked on the batch axis) instead of the reference's two
    sequential UNet calls (`modules.py:1248-1253`); the blend
    ``null + (cond - null) * scale`` is preserved bit-exactly because every
    layer (convs, norms, attention) is per-sample.
  * All control flow (layer structure, skip bookkeeping) is static Python —
    one XLA program after jit.

Submodule names mirror the reference so torch checkpoints import
mechanically (see `nn/torch_import.py`).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import Transformer1d
from .blocks import (Patcher, ResnetBlock1d, Unpatcher, downsample1d,
                     upsample1d)
from .embeddings import FixedEmbedding, NumberEmbedder, time_positional_embedding
from .primitives import Dense, Dtype, gelu

Arrays = Sequence[jax.Array]


def _resnet_run(mod: nn.Module, x: jax.Array,
                mapping: Optional[jax.Array], ch: int, num_layers: int,
                *, collect: bool = False,
                skips: Optional[List[jax.Array]] = None,
                skip_scale: float = 1.0) -> Tuple[jax.Array, List[jax.Array]]:
    """The ``blocks_i`` ResnetBlock1d run of a UNet stage: the XLA
    composition by default, ONE fused Pallas program when
    ``ops.resnet_fusion.enable_resnet_fusion()`` is on (opt-in; measured
    SLOWER than XLA at the production shapes — kept as tested
    infrastructure, see ops/resnet_fusion.py).  Params are read back
    through ``mod.variables`` so the tree is identical either way."""
    from ..ops import resnet_fusion as rfu

    use_mapping = mod.use_mapping
    skip_list = None
    if skips is not None:
        skip_list = [skips.pop() for _ in range(num_layers)]
    if (rfu.resnet_fusion_enabled() and not mod.is_initializing()
            and num_layers > 0):
        trees = [mod.variables["params"][f"blocks_{i}"]
                 for i in range(num_layers)
                 if f"blocks_{i}" in mod.variables["params"]]
        if len(trees) == num_layers and rfu.fusable(x, trees,
                                                    mod.num_groups):
            return rfu.resnet_stack_fused(
                trees, x, mapping if use_mapping else None, skip_list,
                groups=mod.num_groups, skip_scale=skip_scale,
                collect=collect)
    outs: List[jax.Array] = []
    for i in range(num_layers):
        if skip_list is not None:
            x = jnp.concatenate([x, skip_list[i] * skip_scale], axis=-1)
        x = ResnetBlock1d(ch, num_groups=mod.num_groups,
                          use_mapping=use_mapping, dtype=mod.dtype,
                          name=f"blocks_{i}")(x, mapping)
        if collect:
            outs.append(x)
    return x, outs


class DownsampleBlock1d(nn.Module):
    """Downsample conv -> [context channel concat] -> [pre_transformer
    self-attn] -> N ResnetBlocks -> [cross-attn transformer], collecting
    skips (reference `modules.py:574-721`)."""
    in_channels: int
    out_channels: int
    factor: int
    num_groups: int
    num_layers: int
    kernel_multiplier: int = 2
    use_pre_downsample: bool = True
    use_skip: bool = False
    extract_channels: int = 0
    context_channels: int = 0
    num_transformer_blocks: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    attention_use_rel_pos: bool = False
    attention_rel_pos_max_distance: Optional[int] = None
    attention_rel_pos_num_buckets: Optional[int] = None
    use_mapping: bool = False
    context_embedding_features: Optional[int] = None
    pre_transformer: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, mapping: Optional[jax.Array] = None,
                 channels: Optional[jax.Array] = None,
                 embedding: Optional[jax.Array] = None):
        attn_kwargs = dict(
            num_heads=self.attention_heads,
            head_features=self.attention_features,
            multiplier=self.attention_multiplier,
            use_rel_pos=self.attention_use_rel_pos,
            rel_pos_num_buckets=self.attention_rel_pos_num_buckets,
            rel_pos_max_distance=self.attention_rel_pos_max_distance,
        )
        ch = self.out_channels if self.use_pre_downsample else self.in_channels

        if self.use_pre_downsample:
            x = downsample1d(x, self.out_channels, self.factor,
                             self.kernel_multiplier, dtype=self.dtype)

        if self.context_channels > 0 and channels is not None:
            x = jnp.concatenate([x, channels.astype(x.dtype)], axis=-1)

        skips: List[jax.Array] = []
        if self.pre_transformer > 0:
            x = Transformer1d(self.pre_transformer, ch, dtype=self.dtype,
                              name="pre_transformer_block", **attn_kwargs)(x)
            if self.use_skip:
                skips.append(x)

        x, block_outs = _resnet_run(self, x, mapping, ch, self.num_layers,
                                    collect=self.use_skip)
        skips.extend(block_outs)

        if self.num_transformer_blocks > 0:
            x = Transformer1d(self.num_transformer_blocks, ch,
                              context_features=self.context_embedding_features,
                              dtype=self.dtype, name="transformer",
                              **attn_kwargs)(x, context=embedding)
            if self.use_skip:
                skips.append(x)

        if not self.use_pre_downsample:
            x = downsample1d(x, self.out_channels, self.factor,
                             self.kernel_multiplier, dtype=self.dtype)

        if self.extract_channels > 0:
            extracted = ResnetBlock1d(
                self.extract_channels,
                num_groups=min(self.num_groups, self.extract_channels),
                dtype=self.dtype, name="to_extracted")(x)
            return x, extracted

        return (x, skips) if self.use_skip else x


class UpsampleBlock1d(nn.Module):
    """N ResnetBlocks with skip-concat -> [pre_transformer] -> [cross-attn
    transformer] -> upsample (reference `modules.py:724-862`)."""
    in_channels: int
    out_channels: int
    factor: int
    num_layers: int
    num_groups: int
    use_nearest: bool = False
    use_pre_upsample: bool = False
    use_skip: bool = False
    skip_channels: int = 0
    use_skip_scale: bool = False
    extract_channels: int = 0
    num_transformer_blocks: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    attention_use_rel_pos: bool = False
    attention_rel_pos_max_distance: Optional[int] = None
    attention_rel_pos_num_buckets: Optional[int] = None
    use_mapping: bool = False
    context_embedding_features: Optional[int] = None
    pre_transformer: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *,
                 skips: Optional[List[jax.Array]] = None,
                 mapping: Optional[jax.Array] = None,
                 embedding: Optional[jax.Array] = None):
        attn_kwargs = dict(
            num_heads=self.attention_heads,
            head_features=self.attention_features,
            multiplier=self.attention_multiplier,
            use_rel_pos=self.attention_use_rel_pos,
            rel_pos_num_buckets=self.attention_rel_pos_num_buckets,
            rel_pos_max_distance=self.attention_rel_pos_max_distance,
        )
        ch = self.out_channels if self.use_pre_upsample else self.in_channels
        skip_scale = 2 ** -0.5 if self.use_skip_scale else 1.0

        if self.use_pre_upsample:
            x = upsample1d(x, self.out_channels, self.factor,
                           self.use_nearest, dtype=self.dtype)

        x, _ = _resnet_run(self, x, mapping, ch, self.num_layers,
                           skips=skips, skip_scale=skip_scale)

        if self.pre_transformer > 0:
            x = Transformer1d(self.pre_transformer, ch, dtype=self.dtype,
                              name="pre_transformer_block", **attn_kwargs)(x)

        if self.num_transformer_blocks > 0:
            x = Transformer1d(self.num_transformer_blocks, ch,
                              context_features=self.context_embedding_features,
                              dtype=self.dtype, name="transformer",
                              **attn_kwargs)(x, context=embedding)

        if not self.use_pre_upsample:
            x = upsample1d(x, self.out_channels, self.factor,
                           self.use_nearest, dtype=self.dtype)

        if self.extract_channels > 0:
            extracted = ResnetBlock1d(
                self.extract_channels,
                num_groups=min(self.num_groups, self.extract_channels),
                dtype=self.dtype, name="to_extracted")(x)
            return x, extracted

        return x


class BottleneckBlock1d(nn.Module):
    """Resnet -> [cross-attn transformer] -> Resnet
    (reference `modules.py:865-928`)."""
    channels: int
    num_groups: int
    num_transformer_blocks: int = 0
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    attention_use_rel_pos: bool = False
    attention_rel_pos_max_distance: Optional[int] = None
    attention_rel_pos_num_buckets: Optional[int] = None
    use_mapping: bool = False
    context_embedding_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, mapping: Optional[jax.Array] = None,
                 embedding: Optional[jax.Array] = None) -> jax.Array:
        x = ResnetBlock1d(self.channels, num_groups=self.num_groups,
                          use_mapping=self.use_mapping, dtype=self.dtype,
                          name="pre_block")(x, mapping)
        if self.num_transformer_blocks > 0:
            x = Transformer1d(
                self.num_transformer_blocks, self.channels,
                num_heads=self.attention_heads,
                head_features=self.attention_features,
                multiplier=self.attention_multiplier,
                use_rel_pos=self.attention_use_rel_pos,
                rel_pos_num_buckets=self.attention_rel_pos_num_buckets,
                rel_pos_max_distance=self.attention_rel_pos_max_distance,
                context_features=self.context_embedding_features,
                dtype=self.dtype, name="transformer")(x, context=embedding)
        x = ResnetBlock1d(self.channels, num_groups=self.num_groups,
                          use_mapping=self.use_mapping, dtype=self.dtype,
                          name="post_block")(x, mapping)
        return x


class UNet1d(nn.Module):
    """The full 1-D denoiser (reference `modules.py:934-1180`):
    Patcher -> L x DownsampleBlock -> Bottleneck -> L x UpsampleBlock ->
    long skip -> Unpatcher, FiLM-conditioned on a time(+features) mapping,
    cross-attending to ``embedding``.

    Inputs are channels-last: x (b, L, in_channels); embedding
    (b, n_ctx, context_embedding_features); context channels in
    ``channels_list`` are (b, L_i, context_channels[i]).
    """
    in_channels: int
    channels: int
    multipliers: Tuple[int, ...]
    factors: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    attentions: Tuple[int, ...]
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    out_channels: Optional[int] = None
    context_features: Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: Tuple[int, ...] = ()
    context_embedding_features: Optional[int] = None
    attention_heads: Optional[int] = None
    attention_features: Optional[int] = None
    attention_multiplier: Optional[int] = None
    attention_use_rel_pos: bool = False
    attention_rel_pos_max_distance: Optional[int] = None
    attention_rel_pos_num_buckets: Optional[int] = None
    pre_transformer: int = 0
    dtype: Dtype = jnp.float32

    @property
    def num_layers(self) -> int:
        return len(self.multipliers) - 1

    @property
    def use_mapping(self) -> bool:
        return self.use_context_time or self.context_features is not None

    def _padded_context_channels(self) -> List[int]:
        ctx = list(self.context_channels)
        return ctx + [0] * (self.num_layers + 1 - len(ctx))

    def _get_channels(self, channels_list, layer: int):
        """Context channels for ``layer`` (reference `modules.py:1101-1121`).
        ``channels_list`` holds entries only for layers with nonzero
        context_channels, in order."""
        ctx = self._padded_context_channels()
        if not any(c > 0 for c in ctx) or ctx[layer] == 0:
            return None
        assert channels_list is not None, "Missing context"
        has_context = [c > 0 for c in ctx]
        channels_id = sum(has_context[:layer])
        channels = channels_list[channels_id]
        assert channels is not None, \
            f"Missing context for layer {layer} at index {channels_id}"
        assert channels.shape[-1] == ctx[layer], (
            f"Expected context with {ctx[layer]} channels at idx {channels_id}")
        return channels

    def _get_mapping(self, time, features):
        """Combine time + feature context into the FiLM mapping vector
        (reference `modules.py:1123-1142`)."""
        if not self.use_mapping:
            return None
        cmf = self.channels * self.context_features_multiplier
        items = []
        if self.use_context_time:
            assert time is not None, \
                "use_context_time=True but no time features provided"
            t = time_positional_embedding(time, self.channels, cmf,
                                          name="to_time_0", dtype=self.dtype)
            items.append(gelu(t))
        if self.context_features is not None:
            assert features is not None, \
                "context_features exists but no features provided"
            f = Dense(cmf, dtype=self.dtype, name="to_features_0")(features)
            items.append(gelu(f))
        mapping = sum(items)
        mapping = gelu(Dense(cmf, dtype=self.dtype,
                             name="to_mapping_0")(mapping))
        mapping = gelu(Dense(cmf, dtype=self.dtype,
                             name="to_mapping_2")(mapping))
        return mapping

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array] = None, *,
                 features: Optional[jax.Array] = None,
                 channels_list: Optional[Arrays] = None,
                 embedding: Optional[jax.Array] = None) -> jax.Array:
        return self.unet_forward(x, time, features=features,
                                 channels_list=channels_list,
                                 embedding=embedding)

    def unet_forward(self, x: jax.Array, time: Optional[jax.Array] = None, *,
                     features: Optional[jax.Array] = None,
                     channels_list: Optional[Arrays] = None,
                     embedding: Optional[jax.Array] = None) -> jax.Array:
        """Plain (non-compact) forward body so CFG/NCCA subclasses can call
        it from their own compact ``__call__`` (flax allows only one compact
        method per call chain)."""
        num_layers = self.num_layers
        assert (len(self.factors) == num_layers
                and len(self.attentions) >= num_layers
                and len(self.num_blocks) == num_layers)
        total_factor = self.patch_size
        for f in self.factors:
            total_factor *= f
        assert x.shape[1] % total_factor == 0, (
            f"sequence length {x.shape[1]} must be divisible by patch_size x "
            f"prod(factors) = {total_factor}")
        out_channels = self.out_channels or self.in_channels
        ctx_channels = self._padded_context_channels()
        attn_kwargs = dict(
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            attention_use_rel_pos=self.attention_use_rel_pos,
            attention_rel_pos_max_distance=self.attention_rel_pos_max_distance,
            attention_rel_pos_num_buckets=self.attention_rel_pos_num_buckets,
        )

        channels = self._get_channels(channels_list, layer=0)
        if channels is not None:
            x = jnp.concatenate([x, channels.astype(x.dtype)], axis=-1)

        mapping = self._get_mapping(time, features)

        x = Patcher(self.channels * self.multipliers[0], self.patch_size,
                    use_mapping=self.use_mapping, dtype=self.dtype,
                    name="to_in")(x, mapping)
        skips_list: List[Any] = [x]

        for i in range(num_layers):
            channels = self._get_channels(channels_list, layer=i + 1)
            x, skips = DownsampleBlock1d(
                in_channels=self.channels * self.multipliers[i],
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i],
                kernel_multiplier=self.kernel_multiplier_downsample,
                num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i],
                use_pre_downsample=True,
                use_skip=True,
                context_channels=ctx_channels[i + 1],
                num_transformer_blocks=self.attentions[i],
                use_mapping=self.use_mapping,
                context_embedding_features=self.context_embedding_features,
                pre_transformer=self.pre_transformer,
                dtype=self.dtype, name=f"downsamples_{i}",
                **attn_kwargs)(x, mapping=mapping, channels=channels,
                               embedding=embedding)
            skips_list.append(skips)

        x = BottleneckBlock1d(
            channels=self.channels * self.multipliers[-1],
            num_groups=self.resnet_groups,
            num_transformer_blocks=self.attentions[-1],
            use_mapping=self.use_mapping,
            context_embedding_features=self.context_embedding_features,
            dtype=self.dtype, name="bottleneck",
            **attn_kwargs)(x, mapping=mapping, embedding=embedding)

        for idx, i in enumerate(reversed(range(num_layers))):
            skips = skips_list.pop()
            x = UpsampleBlock1d(
                in_channels=self.channels * self.multipliers[i + 1],
                out_channels=self.channels * self.multipliers[i],
                factor=self.factors[i],
                num_layers=self.num_blocks[i] + (1 if self.attentions[i] else 0),
                num_groups=self.resnet_groups,
                use_nearest=self.use_nearest_upsample,
                use_skip_scale=self.use_skip_scale,
                use_pre_upsample=False,
                use_skip=True,
                skip_channels=self.channels * self.multipliers[i + 1],
                num_transformer_blocks=self.attentions[i],
                use_mapping=self.use_mapping,
                context_embedding_features=self.context_embedding_features,
                pre_transformer=self.pre_transformer,
                dtype=self.dtype, name=f"upsamples_{idx}",
                **attn_kwargs)(x, skips=skips, mapping=mapping,
                               embedding=embedding)

        x = x + skips_list.pop()
        x = Unpatcher(out_channels, self.patch_size,
                      use_mapping=self.use_mapping, dtype=self.dtype,
                      name="to_out")(x, mapping)
        return x


def cfg_forward(unet_apply, x: jax.Array, time: jax.Array,
                embedding: jax.Array, fixed_embedding: jax.Array,
                embedding_scale: float = 1.0, **kwargs) -> jax.Array:
    """Batched classifier-free guidance: one doubled-batch forward instead
    of the reference's two sequential UNet calls (`modules.py:1248-1253`).
    Exact because every UNet layer is per-sample."""
    if embedding_scale == 1.0:
        return unet_apply(x, time, embedding=embedding, **kwargs)
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([time, time], axis=0)
    e2 = jnp.concatenate([embedding, fixed_embedding], axis=0)
    kwargs2 = {}
    for k, v in kwargs.items():
        if k == "channels_list" and v is not None:
            kwargs2[k] = [jnp.concatenate([c, c], axis=0) for c in v]
        elif isinstance(v, jax.Array) and v.ndim >= 1 and v.shape[0] == b:
            kwargs2[k] = jnp.concatenate([v, v], axis=0)
        else:
            kwargs2[k] = v
    from ..ops import transformer_fusion as _tf
    # the null half's context rows are ONE FixedEmbedding table — flag the
    # fused Transformer1d to run that half with a shared dense KV (exact)
    with _tf.cfg_uniform_null_half(True):
        out2 = unet_apply(x2, t2, embedding=e2, **kwargs2)
    out, out_masked = out2[:b], out2[b:]
    return out_masked + (out - out_masked) * embedding_scale


class UNetCFG1d(UNet1d):
    """UNet1d with classifier-free guidance (reference
    `modules.py:1211-1255`).  The null conditioning is a learned positional
    table of the same shape as the live embedding.

    ``embedding_mask_proba > 0`` (training-time conditioning dropout) draws
    a per-sample bernoulli mask from the 'cfg' RNG collection.
    """
    context_embedding_max_length: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array] = None, *,
                 embedding: jax.Array,
                 embedding_scale: float = 1.0,
                 embedding_mask_proba: float = 0.0,
                 **kwargs) -> jax.Array:
        fixed = FixedEmbedding(self.context_embedding_max_length,
                               self.context_embedding_features,
                               dtype=self.dtype,
                               name="fixed_embedding")(embedding)
        if embedding_mask_proba > 0.0:
            key = self.make_rng("cfg")
            batch_mask = jax.random.bernoulli(
                key, embedding_mask_proba, (embedding.shape[0], 1, 1))
            embedding = jnp.where(batch_mask, fixed, embedding)

        return cfg_forward(
            lambda xa, ta, **kw: self.unet_forward(xa, ta, **kw),
            x, time, embedding, fixed,
            embedding_scale=embedding_scale, **kwargs)


class UNetNCCA1d(UNet1d):
    """UNet1d with noise-channel conditioning augmentation
    (reference `modules.py:1258-1305`).  ``channels_scale`` in [0,1] mixes
    each context-channel item with gaussian noise and embeds the scale as a
    context feature."""

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array] = None, *,
                 channels_list: Arrays,
                 channels_augmentation: Union[bool, Sequence[bool]] = False,
                 channels_scale: Union[float, Sequence[float]] = 0.0,
                 **kwargs) -> jax.Array:
        b, n = x.shape[0], len(channels_list)
        aug = jnp.broadcast_to(
            jnp.asarray(channels_augmentation, dtype=x.dtype), (b, n))
        raw_scale = jnp.broadcast_to(
            jnp.asarray(channels_scale, dtype=x.dtype), (b, n))
        scale = raw_scale * aug

        out_channels_list = []
        for i in range(n):
            item = channels_list[i]
            s = scale[:, i].reshape(-1, 1, 1)
            noise = jax.random.normal(self.make_rng("ncca"), item.shape,
                                      item.dtype)
            out_channels_list.append(noise * s + item * (1 - s))

        # NB the reference embeds the RAW channels_scale, not scale*aug
        # (`modules.py:1296-1298` uses channels_scale before the per-item
        # augmentation gating) — mirrored exactly.
        scale_emb = NumberEmbedder(self.context_features, dtype=self.dtype,
                                   name="embedder")(raw_scale)
        scale_emb = jnp.sum(scale_emb, axis=1)
        return self.unet_forward(x, time, channels_list=out_channels_list,
                                 features=scale_emb, **kwargs)


class UNetAll1d(UNetCFG1d):
    """CFG + NCCA combined (reference `modules.py:1308-1313`): the MRO gives
    it both the fixed CFG embedding and the NCCA NumberEmbedder params;
    forward dispatches to the CFG path (faithful to the reference)."""

    @nn.compact
    def __call__(self, x: jax.Array, time: Optional[jax.Array] = None, *,
                 embedding: jax.Array, embedding_scale: float = 1.0,
                 embedding_mask_proba: float = 0.0, **kwargs) -> jax.Array:
        if self.context_features is not None:
            # materialize the NCCA embedder for checkpoint parity (created
            # by UNetNCCA1d.__init__ in the reference's MRO)
            NumberEmbedder(self.context_features, dtype=self.dtype,
                           name="embedder")(jnp.zeros((1, 1)))
        fixed = FixedEmbedding(self.context_embedding_max_length,
                               self.context_embedding_features,
                               dtype=self.dtype,
                               name="fixed_embedding")(embedding)
        if embedding_mask_proba > 0.0:
            key = self.make_rng("cfg")
            batch_mask = jax.random.bernoulli(
                key, embedding_mask_proba, (embedding.shape[0], 1, 1))
            embedding = jnp.where(batch_mask, fixed, embedding)
        return cfg_forward(
            lambda xa, ta, **kw: self.unet_forward(xa, ta, **kw),
            x, time, embedding, fixed,
            embedding_scale=embedding_scale, **kwargs)


def XUNet1d(type: str = "base", **kwargs) -> UNet1d:
    """Factory mirroring reference `modules.py:1316-1326`."""
    if type == "base":
        kwargs.pop("context_embedding_max_length", None)
        return UNet1d(**kwargs)
    if type == "all":
        return UNetAll1d(**kwargs)
    if type == "cfg":
        return UNetCFG1d(**kwargs)
    if type == "ncca":
        return UNetNCCA1d(**kwargs)
    raise ValueError(f"Unknown XUNet1d type: {type}")
