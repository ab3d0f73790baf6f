"""Transformer model zoo (reference `transformer.py:543-1246,4578-4790`).

Four families:
  * ``MoleculeTransformer``            — AR decoder over continuous vectors,
                                         MSE loss (`transformer.py:543-720`)
  * ``MoleculeTransformerSequence``    — the paper's inverse transformer:
                                         token AR decoder + property
                                         cross-attention, CE loss
                                         (`transformer.py:722-912`)
  * ``MoleculeTransformerSequenceInternaldim`` — same with a separate input
                                         embedding dim + AttentionQKV
                                         (`transformer.py:915-1107`)
  * ``MoleculeTransformerSequenceEncoder`` — bidirectional property
                                         predictor (`transformer.py:1125-1246`)
  * ``MoleculeTransformerGPT``         — unconditional multi-task GPT with
                                         optional GNN attention augmentation
                                         and FF-CNN variants
                                         (`transformer.py:4578-4790`)

TPU-native decode: ``generate_*`` functions run one jitted ``lax.scan`` over
token positions with fixed-size KV caches and batched CFG (the reference
re-runs the FULL prefix twice per token with no cache — O(T^2 · depth) per
token, SURVEY §3.4).  Gumbel/top-k sampling uses explicit PRNG keys.

Module/param names mirror the torch attribute paths (ModuleList and
Sequential indices merged, e.g. torch ``layers.0.2.1.weight`` lives at flax
``layers_0_2_1/kernel``) so reference checkpoints import mechanically.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.embeddings import positional_encoding_1d
from ..nn.primitives import Dense, Dtype, Embed, gelu, mm_precision
from ..nn.moe import MoEFeedForward
from ..nn.transformer_blocks import (NEG_INF, AttentionQKV, FeedForwardCNN,
                                     LNGamma, MQAttention, gumbel_sample,
                                     prob_mask_like, top_k_filter)


def cross_entropy_mean(logits: jax.Array, labels: jax.Array,
                       ignore_index: Optional[int] = None) -> jax.Array:
    """torch ``F.cross_entropy`` (mean reduction) over (b, n, vocab)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if ignore_index is None:
        return jnp.mean(nll)
    keep = labels != ignore_index
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1)


class _DecoderBase(nn.Module):
    """Shared layer construction + conditioning head for the AR decoders."""
    dim: int = 128
    depth: int = 12
    logits_dim: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    text_embed_dim: Optional[int] = None
    cond_drop_prob: float = 0.25
    max_text_len: int = 128
    dtype: Dtype = jnp.float32

    # subclasses set this
    _attention_cls = MQAttention
    _one_kv_head = True

    def _make_layers(self):
        for i in range(self.depth):
            kw = dict(dim_head=self.dim_head, heads=self.heads,
                      dtype=self.dtype)
            if self._attention_cls is AttentionQKV:
                kw["one_kv_head"] = self._one_kv_head
            setattr(self, f"layers_{i}_0",
                    self._attention_cls(self.dim, causal=True, **kw))
            setattr(self, f"layers_{i}_1",
                    self._attention_cls(self.dim,
                                        context_dim=self.text_embed_dim, **kw))
            hidden = int(self.dim * self.ff_mult)
            setattr(self, f"layers_{i}_2_0", LNGamma(dtype=self.dtype))
            setattr(self, f"layers_{i}_2_1",
                    Dense(hidden, use_bias=False, dtype=self.dtype))
            setattr(self, f"layers_{i}_2_3", LNGamma(dtype=self.dtype))
            setattr(self, f"layers_{i}_2_4",
                    Dense(self.dim, use_bias=False, dtype=self.dtype))

    def ff(self, i: int, x: jax.Array) -> jax.Array:
        """parti FeedForward: LN -> Linear -> GELU -> LN -> Linear."""
        x = getattr(self, f"layers_{i}_2_0")(x)
        x = gelu(getattr(self, f"layers_{i}_2_1")(x))
        x = getattr(self, f"layers_{i}_2_3")(x)
        return getattr(self, f"layers_{i}_2_4")(x)

    def embed_conditioning(self, sequences: jax.Array) -> jax.Array:
        """fc1 + GELU + additive Fourier position code
        (reference `transformer.py:849-856`)."""
        x = sequences.astype(jnp.float32)[..., None]
        x = gelu(self.fc1(x))
        pe = positional_encoding_1d(x.shape[1], self.text_embed_dim,
                                    dtype=x.dtype)
        return x + pe[None]

    def _text_mask(self, cond: jax.Array, text_mask, cond_drop_prob: float,
                   key) -> Tuple[jax.Array, jax.Array]:
        b = cond.shape[0]
        if text_mask is None:
            text_mask = jnp.ones(cond.shape[:2], bool)
        cond = cond[:, :self.max_text_len]
        text_mask = text_mask[:, :self.max_text_len]
        if cond_drop_prob > 0:
            assert key is not None, "cond_drop_prob > 0 needs a PRNG key"
            keep = prob_mask_like(key, (b,), 1 - cond_drop_prob)
            text_mask = keep[:, None] & text_mask
        return cond, text_mask

    def _trunk(self, x: jax.Array, cond: jax.Array,
               text_mask: jax.Array) -> jax.Array:
        x = self.init_norm(x)
        for i in range(self.depth):
            x = getattr(self, f"layers_{i}_0")(x) + x
            x = getattr(self, f"layers_{i}_1")(
                x, context=cond, context_mask=text_mask) + x
            x = self.ff(i, x) + x
        x = self.final_norm(x)
        return self.to_logits(x)

    # ---- cached decode ----------------------------------------------------

    def cross_kv(self, cond: jax.Array) -> List:
        """Per-layer cross-attention KV, precomputed once per generation."""
        return [getattr(self, f"layers_{i}_1").kv(cond)
                for i in range(self.depth)]

    def init_cache(self, batch: int, total_len: int) -> List:
        d = self.dim_head
        if self._one_kv_head and self._attention_cls is MQAttention:
            return [jnp.zeros((batch, total_len, d), self.dtype)
                    for _ in range(self.depth)]
        return [(jnp.zeros((batch, total_len, d), self.dtype),
                 jnp.zeros((batch, total_len, d), self.dtype))
                for _ in range(self.depth)]

    def decode_step(self, x_t: jax.Array, pos: jax.Array, cross_kvs: List,
                    caches: List, text_mask: jax.Array
                    ) -> Tuple[jax.Array, List]:
        """One position through all layers with KV caches.
        ``x_t`` (b, 1, dim) — already embedded + positioned."""
        x = self.init_norm(x_t)
        new_caches = []
        for i in range(self.depth):
            attn = getattr(self, f"layers_{i}_0")
            if self._attention_cls is MQAttention:
                out, cache = attn.step(x, caches[i], pos)
            else:
                out, kc, vc = attn.step(x, caches[i][0], caches[i][1], pos)
                cache = (kc, vc)
            x = out + x
            cross = getattr(self, f"layers_{i}_1")
            if self._attention_cls is MQAttention:
                x = cross.cross_step(x, cross_kvs[i], text_mask) + x
            else:
                k, v = cross_kvs[i]
                cm = text_mask
                if cross.use_null_kv:
                    cm = jnp.pad(cm, ((0, 0), (1, 0)), constant_values=True)
                q = cross.norm(x)
                q = cross.to_q_1(q) * (cross.dim_head ** -0.5)
                b = q.shape[0]
                q = jnp.transpose(
                    q.reshape(b, 1, cross.heads, cross.dim_head),
                    (0, 2, 1, 3))
                x = cross._attend(q, k, v, cm[:, None, None, :]) + x
            x = self.ff(i, x) + x
            new_caches.append(cache)
        x = self.final_norm(x)
        return self.to_logits(x)[:, 0], new_caches


class MoleculeTransformerSequence(_DecoderBase):
    """Token-ID AR decoder with property cross-attention — the paper's
    inverse transformer (reference `transformer.py:722-912`)."""

    def setup(self):
        self.fc1 = Dense(self.text_embed_dim, dtype=self.dtype)
        self.start_token = self.param("start_token",
                                      nn.initializers.normal(1.0),
                                      (self.dim,))
        self.init_norm = LNGamma(dtype=self.dtype)
        self._make_layers()
        self.final_norm = LNGamma(dtype=self.dtype)
        self.to_logits = Dense(self.logits_dim, use_bias=False,
                               dtype=self.dtype)
        self.token_embed = Embed(self.logits_dim, self.dim, dtype=self.dtype)

    def embed_tokens(self, output_ids: jax.Array) -> jax.Array:
        x = self.token_embed(output_ids)
        pe = positional_encoding_1d(x.shape[1], self.dim, dtype=x.dtype)
        return x + pe[None]

    def __call__(self, sequences: jax.Array, output_ids: jax.Array, *,
                 text_mask: Optional[jax.Array] = None,
                 cond_drop_prob: Optional[float] = None,
                 return_loss: bool = False,
                 key: Optional[jax.Array] = None):
        cond_drop_prob = (self.cond_drop_prob if cond_drop_prob is None
                          else cond_drop_prob)
        cond = self.embed_conditioning(sequences)
        labels = output_ids[:, 1:] if return_loss else None
        x = self.embed_tokens(output_ids)
        cond, text_mask = self._text_mask(cond, text_mask, cond_drop_prob,
                                          key)
        logits = self._trunk(x, cond, text_mask)
        if not return_loss:
            return logits
        return cross_entropy_mean(logits[:, :-1], labels)


class MoleculeTransformerSequenceInternaldim(_DecoderBase):
    """Sequence decoder with separate input embedding dim and AttentionQKV
    (multi-query option) (reference `transformer.py:915-1107`)."""
    max_tokens: int = 32
    embed_dim: int = 16
    one_kv_head: bool = True

    _attention_cls = AttentionQKV

    @property
    def _one_kv_head(self):
        return self.one_kv_head

    def setup(self):
        self.token_embed = Embed(self.max_tokens, self.embed_dim,
                                 dtype=self.dtype)
        self.to_dim = Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.fc1 = Dense(self.text_embed_dim, dtype=self.dtype)
        self.start_token = self.param("start_token",
                                      nn.initializers.normal(1.0),
                                      (self.dim,))
        self.init_norm = LNGamma(dtype=self.dtype)
        self._make_layers()
        self.final_norm = LNGamma(dtype=self.dtype)
        self.to_logits = Dense(self.logits_dim, use_bias=False,
                               dtype=self.dtype)

    def embed_tokens(self, output_ids: jax.Array) -> jax.Array:
        x = self.token_embed(output_ids)
        pe = positional_encoding_1d(x.shape[1], self.embed_dim, dtype=x.dtype)
        return self.to_dim(x + pe[None])

    def __call__(self, sequences: jax.Array, output_ids: jax.Array, *,
                 text_mask: Optional[jax.Array] = None,
                 cond_drop_prob: Optional[float] = None,
                 return_loss: bool = False,
                 key: Optional[jax.Array] = None):
        cond_drop_prob = (self.cond_drop_prob if cond_drop_prob is None
                          else cond_drop_prob)
        cond = self.embed_conditioning(sequences)
        labels = output_ids[:, 1:] if return_loss else None
        x = self.embed_tokens(output_ids)
        cond, text_mask = self._text_mask(cond, text_mask, cond_drop_prob,
                                          key)
        logits = self._trunk(x, cond, text_mask)
        if not return_loss:
            return logits
        return cross_entropy_mean(logits[:, :-1], labels)


class MoleculeTransformer(_DecoderBase):
    """AR decoder over CONTINUOUS vectors (b, L, logits_dim) with MSE loss;
    ``generate`` feeds raw output vectors back (no sampling)
    (reference `transformer.py:543-720`)."""
    pos_fourier_graph_dim: int = 32

    def setup(self):
        self.fc1 = Dense(self.text_embed_dim, dtype=self.dtype)
        self.start_token = self.param("start_token",
                                      nn.initializers.normal(1.0),
                                      (self.dim,))
        self.init_norm = LNGamma(dtype=self.dtype)
        self._make_layers()
        self.final_norm = LNGamma(dtype=self.dtype)
        self.to_logits = Dense(self.logits_dim, use_bias=False,
                               dtype=self.dtype)
        self.to_dim = Dense(self.dim, use_bias=False, dtype=self.dtype)

    def embed_vectors(self, output: jax.Array) -> jax.Array:
        """(b, L, logits_dim) continuous input -> (b, L+1, dim) with start
        token prepended; position code CONCATENATED on channels."""
        b, length, _ = output.shape
        pe = positional_encoding_1d(length, self.pos_fourier_graph_dim,
                                    dtype=output.dtype)
        pe = jnp.broadcast_to(pe[None], (b,) + pe.shape)
        x = self.to_dim(jnp.concatenate([output.astype(self.dtype), pe], -1))
        start = jnp.broadcast_to(
            self.start_token[None, None].astype(x.dtype), (b, 1, self.dim))
        return jnp.concatenate([start, x], axis=1)

    def __call__(self, sequences: jax.Array, output: jax.Array, *,
                 text_mask: Optional[jax.Array] = None,
                 cond_drop_prob: Optional[float] = None,
                 return_loss: bool = False,
                 key: Optional[jax.Array] = None):
        cond_drop_prob = (self.cond_drop_prob if cond_drop_prob is None
                          else cond_drop_prob)
        cond = self.embed_conditioning(sequences)
        x = self.embed_vectors(output)
        if return_loss:
            # target = first logits_dim channels of the EMBEDDED stream,
            # shifted — faithful to `transformer.py:683-685`
            x, target = x[:, :-1], x[:, 1:, :self.logits_dim]
        cond, text_mask = self._text_mask(cond, text_mask, cond_drop_prob,
                                          key)
        logits = self._trunk(x, cond, text_mask)
        if not return_loss:
            return logits
        return jnp.mean(jnp.square(logits - target))


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention`` (batch_first) equivalent: fused QKV
    in-projection + out projection, with key_padding_mask (True = masked)
    and optional causal masking.  Params named in_proj_weight/in_proj_bias
    (+ child out_proj) for state-dict import."""
    dim: int
    heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_padding_mask: Optional[jax.Array] = None) -> jax.Array:
        b, n, d = x.shape
        h = self.heads
        hd = d // h
        w = self.param("in_proj_weight",
                       nn.initializers.xavier_uniform(), (d, 3 * d))
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                      precision=mm_precision(self.dtype)) + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return jnp.transpose(t.reshape(b, n, h, hd), (0, 2, 1, 3))

        q, k, v = map(heads_split, (q, k, v))
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32,
                         precision=mm_precision(self.dtype)) * (hd ** -0.5)
        if key_padding_mask is not None:
            sim = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, sim)
        if self.causal:
            causal = jnp.triu(jnp.ones((n, n), bool), k=1)
            sim = jnp.where(causal[None, None], NEG_INF, sim)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v,
                         preferred_element_type=self.dtype,
                         precision=mm_precision(self.dtype))
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, d)
        return Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class MoleculeTransformerSequenceEncoder(nn.Module):
    """Bidirectional forward property predictor
    (reference `transformer.py:1125-1246`): token embed + Fourier -> to_dim
    -> depth x (MHA with key-padding mask, FF) -> to_logits ->
    length-axis projection.  Output (b, logits_dim, logits_dim_length)."""
    dim: int = 256
    depth: int = 6
    logits_dim: int = 32
    logits_dim_length: Optional[int] = None
    max_length: Optional[int] = None
    max_tokens: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    embed_dim: int = 16
    padding_token: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.init_norm = LNGamma(dtype=self.dtype)
        for i in range(self.depth):
            setattr(self, f"layers_{i}_0",
                    TorchMHA(self.dim, self.heads, dtype=self.dtype))
            hidden = int(self.dim * self.ff_mult)
            setattr(self, f"layers_{i}_1_0", LNGamma(dtype=self.dtype))
            setattr(self, f"layers_{i}_1_1",
                    Dense(hidden, use_bias=False, dtype=self.dtype))
            setattr(self, f"layers_{i}_1_3", LNGamma(dtype=self.dtype))
            setattr(self, f"layers_{i}_1_4",
                    Dense(self.dim, use_bias=False, dtype=self.dtype))
        self.final_norm = LNGamma(dtype=self.dtype)
        self.token_embed = Embed(self.max_tokens, self.embed_dim,
                                 dtype=self.dtype)
        self.to_dim = Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.to_logits = Dense(self.logits_dim, use_bias=False,
                               dtype=self.dtype)
        if self.logits_dim_length is not None:
            assert self.max_length is not None, \
                "max_length and logits_dim_length must be set together"
            self.to_logits_dim_length = Dense(self.logits_dim_length,
                                              use_bias=False,
                                              dtype=self.dtype)

    def __call__(self, input_sequence: jax.Array,
                 text_mask: Optional[jax.Array] = None,
                 return_hidden: bool = False) -> jax.Array:
        x = self.token_embed(input_sequence)
        pe = positional_encoding_1d(x.shape[1], self.embed_dim, dtype=x.dtype)
        x = self.to_dim(x + pe[None])
        if self.max_length is not None and text_mask is None:
            # True = padding = masked out (reference `transformer.py:1203`)
            text_mask = input_sequence == self.padding_token
        if self.max_length is not None:
            x = x[:, :self.max_length]
            text_mask = text_mask[:, :self.max_length]
        x = self.init_norm(x)
        for i in range(self.depth):
            x = getattr(self, f"layers_{i}_0")(
                x, key_padding_mask=text_mask) + x
            h = getattr(self, f"layers_{i}_1_0")(x)
            h = gelu(getattr(self, f"layers_{i}_1_1")(h))
            h = getattr(self, f"layers_{i}_1_3")(h)
            x = getattr(self, f"layers_{i}_1_4")(h) + x
        x = self.final_norm(x)
        if return_hidden:
            return x
        logits = self.to_logits(x)
        if self.logits_dim_length is not None:
            logits = jnp.transpose(logits, (0, 2, 1))
            logits = self.to_logits_dim_length(logits)
        return logits


class MoleculeTransformerGPT(nn.Module):
    """Unconditional multi-task GPT (reference `transformer.py:4578-4790`):
    causal AttentionQKV (optionally GNN-augmented), FF or FF-CNN, additive
    or concatenated Fourier positions, optional BERT-style masking and
    padding-aware CE."""
    dim: int = 128
    depth: int = 12
    max_tokens: int = 32
    logits_dim: int = 32
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    embed_dim: int = 16
    text_embed_dim: int = 16          # vestigial fc1, kept for ckpt parity
    max_text_len: int = 128
    one_kv_head: bool = True
    concat_pos_encoding: bool = False
    pos_fourier_graph_dim: Optional[int] = None
    use_null_kv: bool = True
    ff_conv_kernel: int = 0
    ff_inner_conv_kernel: int = 0
    ff_glu: bool = False
    # TPU-native EXTENSION (beyond reference, see nn/moe.py): >0 replaces
    # each dense FF with a sparsely-activated MoE of that many experts,
    # stacked for expert-parallel sharding (parallel/ep.py).
    ff_num_experts: int = 0
    ff_expert_top_k: int = 2
    ff_expert_capacity_factor: float = 1.25
    gnn_layers: int = 0
    gnn_att_threshold_min: float = 0.0
    gnn_att_threshold_max: float = 1.0
    dtype: Dtype = jnp.float32

    @property
    def _pos_dim(self) -> int:
        if not self.concat_pos_encoding:
            return self.embed_dim
        assert self.pos_fourier_graph_dim is not None
        return self.pos_fourier_graph_dim

    def setup(self):
        self.token_embed = Embed(self.max_tokens, self.embed_dim,
                                 dtype=self.dtype)
        dim_in = self.embed_dim + (self._pos_dim if self.concat_pos_encoding
                                   else 0)
        del dim_in  # input dim is inferred by Dense
        self.to_dim = Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.fc1 = Dense(self.text_embed_dim, dtype=self.dtype)  # unused
        self.init_norm = LNGamma(dtype=self.dtype)
        for i in range(self.depth):
            setattr(self, f"layers_{i}_0", AttentionQKV(
                self.dim, causal=True, one_kv_head=self.one_kv_head,
                dim_head=self.dim_head, heads=self.heads,
                use_null_kv=self.use_null_kv, gnn_layers=self.gnn_layers,
                gnn_att_threshold_min=self.gnn_att_threshold_min,
                gnn_att_threshold_max=self.gnn_att_threshold_max,
                dtype=self.dtype))
            if self.ff_num_experts > 0:
                assert self.ff_conv_kernel == 0 and \
                    self.ff_inner_conv_kernel == 0, \
                    "MoE FF and FF-CNN are mutually exclusive"
                setattr(self, f"layers_{i}_1_0", LNGamma(dtype=self.dtype))
                setattr(self, f"layers_{i}_1_moe", MoEFeedForward(
                    dim=self.dim, num_experts=self.ff_num_experts,
                    mult=self.ff_mult, top_k=self.ff_expert_top_k,
                    capacity_factor=self.ff_expert_capacity_factor,
                    dtype=self.dtype))
            elif self.ff_conv_kernel == 0 and self.ff_inner_conv_kernel == 0:
                hidden = int(self.dim * self.ff_mult)
                setattr(self, f"layers_{i}_1_0", LNGamma(dtype=self.dtype))
                setattr(self, f"layers_{i}_1_1",
                        Dense(hidden, use_bias=False, dtype=self.dtype))
                setattr(self, f"layers_{i}_1_3", LNGamma(dtype=self.dtype))
                setattr(self, f"layers_{i}_1_4",
                        Dense(self.dim, use_bias=False, dtype=self.dtype))
            else:
                setattr(self, f"layers_{i}_1", FeedForwardCNN(
                    self.dim, mult=self.ff_mult, glu=self.ff_glu,
                    conv_kernel_ff=self.ff_conv_kernel,
                    ff_inner_conv=self.ff_inner_conv_kernel,
                    dtype=self.dtype))
        self.final_norm = LNGamma(dtype=self.dtype)
        self.to_logits = Dense(self.logits_dim, use_bias=False,
                               dtype=self.dtype)

    def _ff(self, i: int, x: jax.Array) -> jax.Array:
        if self.ff_num_experts > 0:
            h = getattr(self, f"layers_{i}_1_0")(x)
            return getattr(self, f"layers_{i}_1_moe")(h)
        if self.ff_conv_kernel == 0 and self.ff_inner_conv_kernel == 0:
            h = getattr(self, f"layers_{i}_1_0")(x)
            h = gelu(getattr(self, f"layers_{i}_1_1")(h))
            h = getattr(self, f"layers_{i}_1_3")(h)
            return getattr(self, f"layers_{i}_1_4")(h)
        return getattr(self, f"layers_{i}_1")(x)

    def embed_tokens(self, output_ids: jax.Array) -> jax.Array:
        x = self.token_embed(output_ids)
        pe = positional_encoding_1d(x.shape[1], self._pos_dim, dtype=x.dtype)
        pe = jnp.broadcast_to(pe[None], (x.shape[0],) + pe.shape)
        if self.concat_pos_encoding:
            x = jnp.concatenate([x, pe], axis=-1)
        else:
            x = x + pe
        return self.to_dim(x)

    def __call__(self, output_ids: jax.Array, *, return_loss: bool = False,
                 ignore_padding_zeros: bool = False, mask_prob: float = 0.0,
                 context_mask: Optional[jax.Array] = None,
                 key: Optional[jax.Array] = None):
        labels = output_ids[:, 1:] if return_loss else None
        x = self.embed_tokens(output_ids)
        x = self.init_norm(x)
        # materialize the reference's vestigial fc1 (unused in its forward
        # too, `transformer.py:4630`) so checkpoints import 1:1; XLA removes
        # the dead computation
        self.fc1(jnp.zeros((1, 1), self.dtype))

        if mask_prob > 0.0:
            # BERT-style masking (reference `transformer.py:4739-4760`):
            # mask out the top-`num_mask` random positions (never the first)
            assert key is not None, "mask_prob > 0 needs a PRNG key"
            b, n = output_ids.shape
            rand = jax.random.normal(key, (b, n))
            rand = rand.at[:, 0].set(NEG_INF)
            num_mask = min(int(n * mask_prob), n - 1)
            indices = jax.lax.top_k(rand, num_mask)[1]
            drop = jnp.zeros((b, n), bool)
            drop = jax.vmap(lambda d, i: d.at[i].set(True))(drop, indices)
            context_mask = ~drop

        for i in range(self.depth):
            x = getattr(self, f"layers_{i}_0")(
                x, context_mask=context_mask) + x
            x = self._ff(i, x) + x
        x = self.final_norm(x)
        logits = self.to_logits(x)
        if not return_loss:
            return logits
        return cross_entropy_mean(
            logits[:, :-1], labels,
            ignore_index=0 if ignore_padding_zeros else None)

    # cached decode ----------------------------------------------------------

    def init_cache(self, batch: int, total_len: int) -> List:
        return [(jnp.zeros((batch, total_len, self.dim_head), self.dtype),
                 jnp.zeros((batch, total_len, self.dim_head), self.dtype))
                for _ in range(self.depth)]

    def decode_step(self, token_t: jax.Array, pos: jax.Array,
                    caches: List) -> Tuple[jax.Array, List]:
        x = self.token_embed(token_t)[:, None]
        pe_full = positional_encoding_1d(caches[0][0].shape[1],
                                         self._pos_dim, dtype=x.dtype)
        pe = jax.lax.dynamic_index_in_dim(pe_full, pos, 0)[None, None, :]
        pe = jnp.broadcast_to(pe[0], (x.shape[0], 1, self._pos_dim))
        if self.concat_pos_encoding:
            x = jnp.concatenate([x, pe], axis=-1)
        else:
            x = x + pe
        x = self.to_dim(x)
        x = self.init_norm(x)
        new_caches = []
        for i in range(self.depth):
            out, kc, vc = getattr(self, f"layers_{i}_0").step(
                x, caches[i][0], caches[i][1], pos)
            x = out + x
            x = self._ff(i, x) + x
            new_caches.append((kc, vc))
        x = self.final_norm(x)
        return self.to_logits(x)[:, 0], new_caches


# ------------------------------------------------------------- generation --

@partial(jax.jit, static_argnames=("model", "tokens_to_generate",
                                   "cond_scale", "filter_thres",
                                   "temperature"))
def generate_sequence(model, variables, sequences: jax.Array,
                      start_ids: Optional[jax.Array], key: jax.Array, *,
                      tokens_to_generate: int = 32, cond_scale: float = 3.0,
                      filter_thres: float = 0.9,
                      temperature: float = 1.0) -> jax.Array:
    """KV-cached autoregressive generation for the Sequence decoders —
    one jitted scan, batched CFG (cond half + null half in one doubled
    batch).  Returns token ids (b, T0 + tokens_to_generate).

    Reference semantics (`transformer.py:786-838`): per token,
    ``null + (cond - null) * cond_scale`` on the last-position logits, then
    top-k + gumbel sampling.  ``start_ids=None`` draws one uniform-random
    start token per row (reference `transformer.py:805-808` — the
    GPT-class copy of this path is dead code, it dereferences ``output``
    before its None check, `transformer.py:4675-4680`).
    """
    if start_ids is None:
        key, ks = jax.random.split(key)
        start_ids = jax.random.randint(
            ks, (sequences.shape[0], 1), 0, model.logits_dim)
    b, t0 = start_ids.shape
    total = t0 + tokens_to_generate
    method = type(model)

    cond = model.apply(variables, sequences,
                       method=method.embed_conditioning)
    cond = cond[:, :model.max_text_len]
    cond2 = jnp.concatenate([cond, cond], axis=0)
    # cond half: mask all True; null half: all False (cond_drop_prob=1)
    n_ctx = cond.shape[1]
    text_mask2 = jnp.concatenate(
        [jnp.ones((b, n_ctx), bool), jnp.zeros((b, n_ctx), bool)], axis=0)

    cross_kvs = model.apply(variables, cond2, method=method.cross_kv)
    caches = model.apply(variables, 2 * b, total, method=method.init_cache)

    ids = jnp.zeros((b, total), start_ids.dtype)
    ids = jax.lax.dynamic_update_slice(ids, start_ids, (0, 0))

    pe = positional_encoding_1d(
        total, model.dim if isinstance(model, MoleculeTransformerSequence)
        else model.embed_dim)

    def embed_one(token_ids, pos):
        if isinstance(model, MoleculeTransformerSequence):
            emb = model.apply(variables, token_ids[:, None],
                              method=lambda m, t: m.token_embed(t))
            return emb + pe[pos][None, None]
        emb = model.apply(variables, token_ids[:, None],
                          method=lambda m, t: m.token_embed(t))
        emb = emb + pe[pos][None, None]
        return model.apply(variables, emb,
                           method=lambda m, e: m.to_dim(e))

    def body(carry, pos):
        ids, caches, key = carry
        token = jax.lax.dynamic_index_in_dim(ids, pos, axis=1,
                                             keepdims=False)
        x_t = embed_one(jnp.concatenate([token, token], 0), pos)
        logits2, caches = model.apply(variables, x_t, pos, cross_kvs,
                                      caches, text_mask2,
                                      method=method.decode_step)
        logits_c, logits_n = logits2[:b], logits2[b:]
        logits = logits_n + (logits_c - logits_n) * cond_scale
        key, k1 = jax.random.split(key)
        filtered = top_k_filter(logits, filter_thres)
        sampled = gumbel_sample(k1, filtered, temperature).astype(ids.dtype)
        # only write when we're past the prompt
        next_pos = pos + 1
        write = next_pos >= t0
        current = jax.lax.dynamic_index_in_dim(ids, jnp.minimum(
            next_pos, total - 1), axis=1, keepdims=False)
        new = jnp.where(write & (next_pos < total), sampled, current)
        ids = jax.lax.dynamic_update_index_in_dim(
            ids, new, jnp.minimum(next_pos, total - 1), axis=1)
        return (ids, caches, key), None

    (ids, _, _), _ = jax.lax.scan(body, (ids, caches, key),
                                  jnp.arange(total - 1))
    return ids


@partial(jax.jit, static_argnames=("model", "tokens_to_generate",
                                   "filter_thres", "temperature",
                                   "use_gumbel_sample"))
def generate_gpt(model, variables, start_ids: jax.Array, key: jax.Array, *,
                 tokens_to_generate: int = 32, filter_thres: float = 0.9,
                 temperature: float = 1.0,
                 use_gumbel_sample: bool = True) -> jax.Array:
    """KV-cached generation for MoleculeTransformerGPT
    (reference `transformer.py:4663-4706`)."""
    b, t0 = start_ids.shape
    total = t0 + tokens_to_generate
    caches = model.apply(variables, b, total,
                         method=MoleculeTransformerGPT.init_cache)
    ids = jnp.zeros((b, total), start_ids.dtype)
    ids = jax.lax.dynamic_update_slice(ids, start_ids, (0, 0))

    def body(carry, pos):
        ids, caches, key = carry
        token = jax.lax.dynamic_index_in_dim(ids, pos, axis=1,
                                             keepdims=False)
        logits, caches = model.apply(variables, token, pos, caches,
                                     method=MoleculeTransformerGPT.decode_step)
        key, k1 = jax.random.split(key)
        if use_gumbel_sample:
            sampled = gumbel_sample(k1, top_k_filter(logits, filter_thres),
                                    temperature)
        else:
            sampled = jnp.argmax(logits, axis=-1)
        sampled = sampled.astype(ids.dtype)
        next_pos = pos + 1
        write = next_pos >= t0
        current = jax.lax.dynamic_index_in_dim(
            ids, jnp.minimum(next_pos, total - 1), axis=1, keepdims=False)
        new = jnp.where(write & (next_pos < total), sampled, current)
        ids = jax.lax.dynamic_update_index_in_dim(
            ids, new, jnp.minimum(next_pos, total - 1), axis=1)
        return (ids, caches, key), None

    (ids, _, _), _ = jax.lax.scan(body, (ids, caches, key),
                                  jnp.arange(total - 1))
    return ids


@partial(jax.jit, static_argnames=("model", "tokens_to_generate",
                                   "cond_scale"))
def generate_vectors(model, variables, sequences: jax.Array, *,
                     tokens_to_generate: int = 32,
                     cond_scale: float = 3.0) -> jax.Array:
    """KV-cached autoregressive generation for the CONTINUOUS
    ``MoleculeTransformer``: per step the raw CFG-blended logits vector is
    fed back as the next input — no sampling (reference
    `transformer.py:602-634`).  One jitted scan, batched CFG (cond half +
    null half in one doubled batch).  Returns (b, tokens_to_generate,
    logits_dim) channels-last (the reference returns (b, logits_dim, T)).

    Recorded deviation: the reference's ``generate`` accepts ``cond_scale``/
    ``filter_thres``/``temperature`` but never forwards them — every call
    runs at ``forward_with_cond_scale``'s default cond_scale=3 with no
    sampling (`transformer.py:624-631`).  Here ``cond_scale`` is honored;
    its default 3.0 reproduces the reference behavior exactly.
    """
    b = sequences.shape[0]
    method = type(model)
    cond = model.apply(variables, sequences,
                       method=method.embed_conditioning)
    cond = cond[:, :model.max_text_len]
    cond2 = jnp.concatenate([cond, cond], axis=0)
    n_ctx = cond.shape[1]
    text_mask2 = jnp.concatenate(
        [jnp.ones((b, n_ctx), bool), jnp.zeros((b, n_ctx), bool)], axis=0)

    cross_kvs = model.apply(variables, cond2, method=method.cross_kv)
    caches = model.apply(variables, 2 * b, tokens_to_generate,
                         method=method.init_cache)

    out = jnp.zeros((b, tokens_to_generate, model.logits_dim), jnp.float32)
    # graph position code at position t is length-independent (standard
    # sinusoid) — precompute the full table once
    pe = positional_encoding_1d(max(tokens_to_generate - 1, 1),
                                model.pos_fourier_graph_dim)
    start = jnp.broadcast_to(
        variables["params"]["start_token"][None, None], (b, 1, model.dim))

    def body(carry, pos):
        out, caches = carry
        # sequence position `pos` is: start token (pos 0) or the embedding
        # of the previously generated vector (reference `transformer.py:
        # 668-678`: to_dim(cat(vector, pe_graph)) with start prepended)
        prev = jnp.maximum(pos - 1, 0)
        vec_prev = jax.lax.dynamic_index_in_dim(out, prev, axis=1,
                                                keepdims=True)
        pe_prev = jnp.broadcast_to(
            pe[prev][None, None], (b, 1, model.pos_fourier_graph_dim))
        emb = model.apply(
            variables, jnp.concatenate([vec_prev, pe_prev], axis=-1),
            method=lambda m, e: m.to_dim(e.astype(m.dtype)))
        x_t = jnp.where(pos == 0, start.astype(emb.dtype), emb)
        logits2, caches = model.apply(
            variables, jnp.concatenate([x_t, x_t], axis=0), pos, cross_kvs,
            caches, text_mask2, method=method.decode_step)
        logits_c, logits_n = logits2[:b], logits2[b:]
        vec = logits_n + (logits_c - logits_n) * cond_scale
        out = jax.lax.dynamic_update_slice_in_dim(
            out, vec[:, None].astype(out.dtype), pos, axis=1)
        return (out, caches), None

    (out, _), _ = jax.lax.scan(body, (out, caches),
                               jnp.arange(tokens_to_generate))
    return out


def forward_with_cond_scale(model, variables, sequences, output, *,
                            cond_scale: float = 3.0, **kwargs):
    """Uncached CFG logits (reference `transformer.py:831-838`) — used for
    parity tests and one-shot scoring; generation uses the cached path."""
    logits = model.apply(variables, sequences, output, cond_drop_prob=0.0,
                         **kwargs)
    if cond_scale == 1:
        return logits
    b = sequences.shape[0]
    null_mask = jnp.zeros((b, min(sequences.shape[1],
                                  model.max_text_len)), bool)
    null_logits = model.apply(variables, sequences, output,
                              cond_drop_prob=0.0, text_mask=null_mask,
                              **kwargs)
    return null_logits + (logits - null_logits) * cond_scale


class MoleculeTransformerGPTPyTorch(nn.Module):
    """GPT variant built on the fused-QKV MHA layer — rebuild of the
    reference's ``MoleculeTransformerGPTPyTorch`` (`transformer.py:5270-5444`).

    Recorded deviation (default ``causal=True``): the reference passes
    ``is_causal=True`` to torch MHA without an attn_mask, and on torch 2.x
    that flag is a fast-path HINT that is silently IGNORED when no mask is
    given (verified on torch 2.13: ``is_causal=True`` output equals the
    unmasked output, not the causal one — the reference's own comment at
    `transformer.py:4864` says "may be buggy").  The reference model is
    therefore genuinely non-causal; here the mask is applied correctly by
    default.  Set ``causal=False`` to reproduce the reference quirk exactly
    (golden-tested both ways).
    """
    dim: int = 128
    depth: int = 12
    max_tokens: int = 32
    logits_dim: int = 32
    heads: int = 8
    ff_mult: int = 4
    embed_dim: int = 16
    text_embed_dim: Optional[int] = 16    # vestigial fc1, kept for parity
    concat_pos_encoding: bool = False
    pos_fourier_graph_dim: Optional[int] = None
    causal: bool = True
    dtype: Dtype = jnp.float32

    @property
    def _pos_dim(self) -> int:
        if not self.concat_pos_encoding:
            return self.embed_dim
        assert self.pos_fourier_graph_dim is not None
        return self.pos_fourier_graph_dim

    def setup(self):
        self.token_embed = Embed(self.max_tokens, self.embed_dim,
                                 dtype=self.dtype)
        self.to_dim = Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.fc1 = Dense(self.text_embed_dim, dtype=self.dtype)  # unused
        self.init_norm = LNGamma(dtype=self.dtype)
        for i in range(self.depth):
            setattr(self, f"layers_{i}_0",
                    TorchMHA(self.dim, self.heads, causal=self.causal,
                             dtype=self.dtype))
            hidden = int(self.dim * self.ff_mult)
            setattr(self, f"layers_{i}_1_0", LNGamma(dtype=self.dtype))
            setattr(self, f"layers_{i}_1_1",
                    Dense(hidden, use_bias=False, dtype=self.dtype))
            setattr(self, f"layers_{i}_1_3", LNGamma(dtype=self.dtype))
            setattr(self, f"layers_{i}_1_4",
                    Dense(self.dim, use_bias=False, dtype=self.dtype))
        self.final_norm = LNGamma(dtype=self.dtype)
        self.to_logits = Dense(self.logits_dim, use_bias=False,
                               dtype=self.dtype)

    def __call__(self, output_ids: jax.Array, *, return_loss: bool = False,
                 ignore_padding_zeros: bool = False):
        labels = output_ids[:, 1:] if return_loss else None
        x = self.token_embed(output_ids)
        pe = positional_encoding_1d(x.shape[1], self._pos_dim, dtype=x.dtype)
        pe = jnp.broadcast_to(pe[None], (x.shape[0],) + pe.shape)
        x = (jnp.concatenate([x, pe], axis=-1) if self.concat_pos_encoding
             else x + pe)
        x = self.to_dim(x)
        x = self.init_norm(x)
        self.fc1(jnp.zeros((1, 1), self.dtype))   # vestigial, import parity
        for i in range(self.depth):
            x = getattr(self, f"layers_{i}_0")(x) + x
            h = getattr(self, f"layers_{i}_1_0")(x)
            h = gelu(getattr(self, f"layers_{i}_1_1")(h))
            h = getattr(self, f"layers_{i}_1_3")(h)
            x = getattr(self, f"layers_{i}_1_4")(h) + x
        x = self.final_norm(x)
        logits = self.to_logits(x)
        if not return_loss:
            return logits
        return cross_entropy_mean(
            logits[:, :-1], labels,
            ignore_index=0 if ignore_padding_zeros else None)


def generate_gpt_mha(model, variables, start_ids, key, *,
                     tokens_to_generate: int = 32, filter_thres: float = 0.9,
                     temperature: float = 1.0,
                     use_gumbel_sample: bool = True) -> jax.Array:
    """Fixed-shape generation for the MHA-based GPT (full-prefix forward
    per token over a masked static buffer — the fused-QKV MHA has no
    per-position cache; the cached path is ``generate_gpt``).  The whole
    decode is ONE jitted ``lax.scan`` over positions (zero host
    round-trips), each step a full forward on the static buffer."""
    b, t0 = start_ids.shape
    total = t0 + tokens_to_generate
    ids0 = jnp.zeros((b, total), start_ids.dtype)
    ids0 = jax.lax.dynamic_update_slice(ids0, start_ids, (0, 0))

    @jax.jit
    def decode(ids, keys):
        def step(ids, pk):
            pos, k = pk
            logits = model.apply(variables, ids)
            logits_t = jax.vmap(lambda l, p: l[p])(logits,
                                                   jnp.full((b,), pos))
            if use_gumbel_sample:
                sampled = gumbel_sample(
                    k, top_k_filter(logits_t, filter_thres), temperature)
            else:
                sampled = jnp.argmax(logits_t, axis=-1)
            return jax.lax.dynamic_update_index_in_dim(
                ids, sampled.astype(ids.dtype), pos + 1, axis=1), None

        positions = jnp.arange(t0 - 1, total - 1)
        return jax.lax.scan(step, ids, (positions, keys))[0]

    return decode(ids0, jax.random.split(key, total - t0))
