"""Sequence parallelism (sp): shard the LENGTH axis of activations.

The QM9 configurations run at L <= 64, where data parallelism alone
saturates the chips — but the audio-lineage assemblies (``models/audio.py``,
reference ``model.py:1-210``) inherit 2**15-sample sequences from
archinetai/audio-diffusion-pytorch, where per-chip ACTIVATION memory (not
params — that is FSDP's job, ``parallel/fsdp.py``) sets the batch ceiling.
Sequence parallelism shards the ``(b, L, C)`` activations' L axis over the
mesh's second ('model') axis so each chip holds ``L / n_model`` of every
feature map, composing with batch sharding over 'data'.

This is pure GSPMD: the only annotation is the PLACEMENT of the step's
inputs (``shard_batch_sp``), and ``jit`` propagates it through the whole
UNet.  XLA inserts, per op:

  * halo exchanges (``ppermute`` of boundary columns) for the k>1 convs
    and the strided down/upsamples on the sharded L axis;
  * an all-gather of K/V over 'model' for self-attention while Q stays
    L-sharded (each chip computes its rows of the attention matrix);
  * ``psum`` for the L-reductions — GroupNorm statistics, attention
    softmax normalizers, and the final loss mean;
  * the transposes of all of the above in the backward pass.

The random noise drawn inside the diffusion objectives is counter-based
(threefry keyed per element), so its VALUES are placement-invariant: the
sp step computes the same loss as the replicated/DP oracle up to
reduction order (pinned by ``tests/test_sp.py``).

Params stay replicated here (they are small relative to long-L activation
maps); compose with ``parallel/tp.py`` on the same 'model' axis or
``parallel/fsdp.py`` on 'data' when params dominate instead.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def seq_sharding(mesh: Mesh, batch_axis: str = "data",
                 seq_axis: str = "model") -> NamedSharding:
    """(b, L, ...) sharding: batch over `batch_axis`, length over `seq_axis`."""
    return NamedSharding(mesh, P(batch_axis, seq_axis))


def shard_seq(mesh: Mesh, tree: Any, batch_axis: str = "data",
              seq_axis: str = "model") -> Any:
    """Device-put a pytree of (b, L, ...) arrays with L sharded.

    Rank-1 leaves replicate, rank-2 leaves shard batch only (per-example
    vectors like conditioning scalars have no length axis), rank>=3 leaves
    shard (batch, length).
    """
    def put(x):
        if x.ndim >= 3:
            spec = P(batch_axis, seq_axis)
        elif x.ndim == 2:
            spec = P(batch_axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def shard_batch_sp(mesh: Mesh, conditioning: Any, target: Any,
                   batch_axis: str = "data", seq_axis: str = "model",
                   ) -> Tuple[Any, Any]:
    """Place a diffusion train-step batch sequence-parallel.

    ``conditioning`` (b, n) shards batch-only; ``target`` (b, L, C) shards
    (batch, length).  Matches ``make_diffusion_train_step``'s signature
    (state, conditioning, target, key).
    """
    cond = jax.device_put(conditioning,
                          NamedSharding(mesh, P(batch_axis)))
    tgt = jax.device_put(target,
                         NamedSharding(mesh, P(batch_axis, seq_axis)))
    return cond, tgt
