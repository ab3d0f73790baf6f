"""FSDP (ZeRO-3 over the 'data' axis, parallel/fsdp.py) on the 8-device
virtual CPU mesh: spec correctness, per-chip memory, step equivalence vs
replicated DP, sharding-preserving updates, trainer integration.

The reference trains replicated on one GPU (`generative.py:1130-1134`);
FSDP is framework scaling machinery beyond the reference (SURVEY §2.10).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from moleculediffusiontransformer_tpu.core.config import TrainConfig
from moleculediffusiontransformer_tpu.parallel import (fsdp_specs, make_mesh,
                                                       replicate, shard_batch,
                                                       shard_state_fsdp,
                                                       state_sharding)
from moleculediffusiontransformer_tpu.train import (TrainState,
                                                    make_diffusion_train_step,
                                                    make_optimizer)

from test_models_train import tiny_model


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices("cpu")) >= 8
    return make_mesh(8, backend="cpu")


@pytest.fixture(scope="module")
def tiny_state():
    model = tiny_model()
    seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
    target = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6))
    variables = model.init(jax.random.PRNGKey(0), seq, target,
                           jax.random.PRNGKey(2))
    return model, variables


def test_fsdp_specs_shard_every_divisible_large_leaf(mesh, tiny_state):
    _, variables = tiny_state
    specs = fsdp_specs(variables["params"], mesh, min_elements=8)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P))
    assert len(leaves) == len(spec_leaves)
    n_sharded = 0
    for x, s in zip(leaves, spec_leaves):
        axes = [a for a in s if a is not None]
        if x.size < 8 or not any(d % 8 == 0 for d in x.shape):
            assert s == P(), (x.shape, s)
            continue
        # exactly one dim sharded, it is divisible, and it is the largest
        # divisible dim
        assert axes == ["data"], (x.shape, s)
        i = list(s).index("data")
        assert x.shape[i] % 8 == 0
        assert x.shape[i] == max(d for d in x.shape if d % 8 == 0)
        n_sharded += 1
    assert n_sharded >= 10  # the tiny model has many 16-dim kernels


def test_fsdp_state_memory_is_sharded(mesh, tiny_state):
    """Sharded leaves must hold ~1/8 of their bytes per device — the whole
    point of FSDP (params + both Adam moments)."""
    model, variables = tiny_state
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)
    placed, specs = shard_state_fsdp(state, mesh, min_elements=8)
    total = per_dev = sharded_total = 0
    for x, s in zip(jax.tree_util.tree_leaves(placed),
                    jax.tree_util.tree_leaves(
                        specs, is_leaf=lambda s: isinstance(s, P))):
        nbytes = x.size * x.dtype.itemsize
        total += nbytes
        shard = x.addressable_shards[0].data
        per_dev += shard.size * x.dtype.itemsize
        if s != P():
            sharded_total += nbytes
            assert shard.size == x.size // 8, (x.shape, s)
    # the tiny model's big kernels dominate: per-device footprint must be
    # well under half the replicated footprint
    assert sharded_total / total > 0.5
    assert per_dev <= total - sharded_total * 7 // 8 + 8


def test_fsdp_step_matches_replicated_dp(mesh, tiny_state):
    """3 FSDP train steps == 3 replicated-DP steps (same data, same keys);
    the output state must STAY fsdp-sharded across steps."""
    model, variables = tiny_state
    tx = optax.sgd(1e-3)  # linear in the grad: reduction-order-robust
    state = TrainState.create(variables["params"], tx)

    cond = np.random.RandomState(0).randn(16, 12).astype(np.float32)
    target = np.random.RandomState(1).randn(16, 8, 6).astype(np.float32)
    key = jax.random.PRNGKey(0)
    cond_s, target_s = shard_batch(mesh, (cond, target))
    key_r = replicate(mesh, key)

    step_dp = make_diffusion_train_step(model, tx, donate=False)
    state_dp = replicate(mesh, state)

    fstate, specs = shard_state_fsdp(state, mesh, min_elements=8)
    step_f = make_diffusion_train_step(
        model, tx, donate=False,
        state_sharding=state_sharding(specs, mesh))

    losses_dp, losses_f = [], []
    for _ in range(3):
        state_dp, l1 = step_dp(state_dp, cond_s, target_s, key_r)
        fstate, l2 = step_f(fstate, cond_s, target_s, key_r)
        losses_dp.append(float(l1))
        losses_f.append(float(l2))
    np.testing.assert_allclose(losses_dp, losses_f, rtol=1e-5)

    for a, b, s in zip(jax.tree_util.tree_leaves(state_dp.params),
                       jax.tree_util.tree_leaves(fstate.params),
                       jax.tree_util.tree_leaves(
                           fsdp_specs(state.params, mesh, min_elements=8),
                           is_leaf=lambda s: isinstance(s, P))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        if s != P():  # out_shardings pinned: updates must not re-replicate
            assert b.addressable_shards[0].data.size == b.size // 8


def test_fsdp_composes_with_gradient_accumulation(mesh, tiny_state):
    """accumulation_steps>1 under FSDP must equal the one-big-batch FSDP
    step (the scan's grad accumulator inherits the param shardings)."""
    model, variables = tiny_state
    tx = optax.sgd(1e-3)
    state = TrainState.create(variables["params"], tx)
    fstate, specs = shard_state_fsdp(state, mesh, min_elements=8)
    sh = state_sharding(specs, mesh)

    cond = np.random.RandomState(2).randn(16, 12).astype(np.float32)
    target = np.random.RandomState(3).randn(16, 8, 6).astype(np.float32)
    cond_s, target_s = shard_batch(mesh, (cond, target))
    key_r = replicate(mesh, jax.random.PRNGKey(5))

    s1, _ = make_diffusion_train_step(model, tx, donate=False,
                                      state_sharding=sh)(
        fstate, cond_s, target_s, key_r)
    s2, _ = make_diffusion_train_step(model, tx, donate=False,
                                      accumulation_steps=2,
                                      state_sharding=sh)(
        fstate, cond_s, target_s, key_r)
    # A=2 averages two half-batch grads with per-microbatch keys — not
    # identical to A=1 (exact A-equivalence is pinned in
    # test_models_train.py), but with lr=1e-3 and grad-norm clip 0.5 the
    # two updates differ by at most 2·lr·clip = 2e-3 per param ...
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(a, b, atol=2.5e-3)
    # ... and the accumulated update must STAY fsdp-sharded (the scan's
    # grad accumulator inherits the param shardings)
    for p, s in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(
                        fsdp_specs(state.params, mesh, min_elements=8),
                        is_leaf=lambda s: isinstance(s, P))):
        if s != P():
            assert p.addressable_shards[0].data.size == p.size // 8


def test_train_diffusion_fsdp_end_to_end(mesh):
    """TrainConfig(param_sharding='fsdp') through the real trainer: loss
    falls, state leaves come back fsdp-sharded."""
    from moleculediffusiontransformer_tpu.train import train_diffusion
    model = tiny_model()
    rng = np.random.RandomState(0)
    X = rng.randn(32, 8, 6).astype(np.float32)
    y = rng.randn(32, 12).astype(np.float32)

    def data_iter():
        for i in range(0, 32, 16):
            yield X[i:i + 16], y[i:i + 16]

    cfg = TrainConfig(learning_rate=1e-3, epochs=4, print_loss_every=1,
                      preflight_memory_check=False, prefetch=0,
                      param_sharding="fsdp", fsdp_min_elements=8)
    with jax.default_device(jax.devices("cpu")[0]):
        state, logger = train_diffusion(
            model, data_iter, cfg, init_conditioning=y[:2],
            init_target=X[:2], mesh=mesh)
    losses = [r["loss"] for r in logger.history if "loss" in r]
    assert len(losses) >= 8
    assert losses[-1] < losses[0]
    big = [p for p in jax.tree_util.tree_leaves(state.params)
           if p.size >= 8 and any(d % 8 == 0 for d in p.shape)]
    assert big and all(
        p.addressable_shards[0].data.size == p.size // 8 for p in big)


def test_train_diffusion_fsdp_msgpack_resume(mesh, tmp_path):
    """msgpack checkpoint resume under FSDP: the restored host tree must be
    re-placed into its FSDP shardings (trainer `_place`), continuing from
    the saved step with sharded leaves."""
    from moleculediffusiontransformer_tpu.train import train_diffusion
    model = tiny_model()
    rng = np.random.RandomState(1)
    X = rng.randn(16, 8, 6).astype(np.float32)
    y = rng.randn(16, 12).astype(np.float32)

    def data_iter():
        yield X, y

    ckdir = str(tmp_path / "ck")
    cfg = TrainConfig(learning_rate=1e-3, epochs=2, print_loss_every=1,
                      preflight_memory_check=False, prefetch=0,
                      param_sharding="fsdp", fsdp_min_elements=8)
    with jax.default_device(jax.devices("cpu")[0]):
        s1, _ = train_diffusion(model, data_iter, cfg, init_conditioning=y[:2],
                                init_target=X[:2], mesh=mesh,
                                checkpoint_dir=ckdir)
        cfg2 = TrainConfig(**{**cfg.__dict__, "epochs": 1})
        s2, _ = train_diffusion(model, data_iter, cfg2,
                                init_conditioning=y[:2], init_target=X[:2],
                                mesh=mesh, checkpoint_dir=ckdir, resume=True)
    assert int(s2.step) == int(s1.step) + 1
    big = [p for p in jax.tree_util.tree_leaves(s2.params)
           if p.size >= 8 and any(d % 8 == 0 for d in p.shape)]
    assert big and all(
        p.addressable_shards[0].data.size == p.size // 8 for p in big)


def test_fsdp_orbax_sharded_restore(mesh, tiny_state, tmp_path):
    """Checkpoint round-trip straight into FSDP placement: restored leaves
    land sharded (no host staging then re-shard) and equal the originals."""
    from moleculediffusiontransformer_tpu.core.checkpoint_orbax import (
        OrbaxCheckpointer, shard_restore_target)
    model, variables = tiny_state
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)
    placed, specs = shard_state_fsdp(state, mesh, min_elements=8)

    ck = OrbaxCheckpointer(str(tmp_path / "ck"), async_save=False)
    ck.save(7, jax.device_get(placed))
    restored = ck.restore(shard_restore_target(placed, mesh,
                                               param_spec=specs))
    for a, b, s in zip(jax.tree_util.tree_leaves(placed.params),
                       jax.tree_util.tree_leaves(restored.params),
                       jax.tree_util.tree_leaves(
                           fsdp_specs(state.params, mesh, min_elements=8),
                           is_leaf=lambda s: isinstance(s, P))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if s != P():
            assert b.addressable_shards[0].data.size == b.size // 8
