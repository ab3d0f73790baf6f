"""Sequence parallelism (parallel/sp.py) on the 8-device virtual CPU mesh:
placement routing, and train-step equivalence of a (data, model)-mesh
sequence-sharded step vs the replicated single-device oracle.

The reference trains replicated on one GPU (`generative.py:1130-1134`); SP
is framework scaling machinery for the long-L audio-lineage assemblies
(reference `model.py:1-210`, 2**15-sample sequences) where ACTIVATION
memory, not params, sets the per-chip batch ceiling (SURVEY §2.10).
"""
import numpy as np
import pytest

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from moleculediffusiontransformer_tpu.parallel import (replicate,
                                                       seq_sharding,
                                                       shard_batch_sp,
                                                       shard_seq)
from moleculediffusiontransformer_tpu.parallel.tp import make_mesh_2d
from moleculediffusiontransformer_tpu.train import (TrainState,
                                                    make_diffusion_train_step)

from test_models_train import tiny_model


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices("cpu")) >= 8
    return make_mesh_2d(4, 2, backend="cpu")


@pytest.fixture(scope="module")
def tiny_state():
    model = tiny_model()
    seq = np.linspace(-1, 1, 2 * 12, dtype=np.float32).reshape(2, 12)
    target = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6)))
    variables = model.init(jax.random.PRNGKey(0), seq, target,
                           jax.random.PRNGKey(2))
    return model, variables


def test_seq_sharding_spec(mesh):
    s = seq_sharding(mesh)
    assert s.spec == P("data", "model")


def test_shard_batch_sp_placement(mesh):
    cond = np.zeros((8, 12), np.float32)
    target = np.zeros((8, 8, 6), np.float32)
    cond_s, tgt_s = shard_batch_sp(mesh, cond, target)
    assert cond_s.sharding.spec == P("data")
    assert tgt_s.sharding.spec == P("data", "model")
    # per-chip activation shard: batch/4 x L/2, the whole point of sp
    assert tgt_s.addressable_shards[0].data.shape == (2, 4, 6)


def test_shard_seq_rank_routing(mesh):
    tree = {
        "scalar_per_example": np.zeros((8,), np.float32),        # replicate
        "cond": np.zeros((8, 12), np.float32),                   # batch only
        "acts": np.zeros((8, 16, 4), np.float32),                # (b, L)
        "acts4": np.zeros((8, 16, 4, 2), np.float32),            # (b, L)
    }
    out = shard_seq(mesh, tree)
    assert out["scalar_per_example"].sharding.spec == P()
    assert out["cond"].sharding.spec == P("data")
    assert out["acts"].sharding.spec == P("data", "model")
    assert out["acts4"].sharding.spec == P("data", "model")


def test_sp_train_step_equals_replicated_oracle(mesh, tiny_state):
    """One jitted diffusion train step with the target's LENGTH axis sharded
    over 'model' (GSPMD inserts conv halo exchanges, attention K/V gathers,
    and norm-stat psums) must match the single-device replicated oracle:
    same losses over 3 steps, same params after (SGD — linear in the grad,
    so reduction-order-robust, mirroring test_fsdp.py)."""
    model, variables = tiny_state
    tx = optax.sgd(1e-3)
    state = TrainState.create(variables["params"], tx)
    step = make_diffusion_train_step(model, tx, donate=False)

    cond = np.random.RandomState(0).randn(8, 12).astype(np.float32)
    target = np.random.RandomState(1).randn(8, 8, 6).astype(np.float32)
    key = jax.random.PRNGKey(7)

    # oracle: replicated single-device
    state_1 = state
    losses_1 = []
    for _ in range(3):
        state_1, l = step(state_1, cond, target, key)
        losses_1.append(float(l))

    # sp: batch over 'data', length over 'model'
    state_sp = replicate(mesh, state)
    cond_s, tgt_s = shard_batch_sp(mesh, cond, target)
    key_r = jax.device_put(key, NamedSharding(mesh, P()))
    losses_sp = []
    for _ in range(3):
        state_sp, l = step(state_sp, cond_s, tgt_s, key_r)
        losses_sp.append(float(l))

    np.testing.assert_allclose(losses_1, losses_sp, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_1.params),
                    jax.tree_util.tree_leaves(state_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sp_audio_model1d_long_sequence(mesh):
    """The MOTIVATING case: an audio-lineage Model1d (reference
    `model.py:1-210`) at L=256 with the waveform's length axis sharded —
    loss and gradients equal the replicated oracle."""
    from moleculediffusiontransformer_tpu.diffusion import (
        UniformDistribution)
    from moleculediffusiontransformer_tpu.models import Model1d

    model = Model1d(in_channels=4, diffusion_type="v",
                    diffusion_sigma_distribution=UniformDistribution(),
                    channels=16, multipliers=(1, 2), factors=(2,),
                    num_blocks=(1,), attentions=(0,), patch_size=2,
                    attention_heads=2, attention_features=8,
                    attention_multiplier=2)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (8, 256, 4)))
    key = jax.random.PRNGKey(0)
    variables = model.init(jax.random.PRNGKey(2), x[:2], key)

    f = jax.jit(jax.value_and_grad(
        lambda p, xx, kk: model.apply({"params": p}, xx, kk)))
    loss_1, g_1 = f(variables["params"], x, key)

    params_r = replicate(mesh, variables["params"])
    x_s = jax.device_put(x, seq_sharding(mesh))
    key_r = jax.device_put(key, NamedSharding(mesh, P()))
    loss_sp, g_sp = f(params_r, x_s, key_r)

    np.testing.assert_allclose(float(loss_1), float(loss_sp), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_1),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
