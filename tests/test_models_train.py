"""QM model + trainer tests: loss/grad sanity, jitted sampling, inpainting,
DP train step on the 8-device virtual mesh, tiny overfit, checkpoint resume."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.core.config import TrainConfig
from moleculediffusiontransformer_tpu.models import (QMDiffusion,
                                                     QMDiffusionBase,
                                                     QMDiffusionForward,
                                                     inpaint, sample)
from moleculediffusiontransformer_tpu.parallel import make_mesh, shard_batch
from moleculediffusiontransformer_tpu.train import (TrainState,
                                                    make_diffusion_train_step,
                                                    make_optimizer)


def tiny_model(**kw):
    defaults = dict(max_length=8, channels=16, pred_dim=6, text_embed_dim=16,
                    embed_dim_position=8, context_embedding_max_length=12,
                    multipliers=(1, 2), factors=(2,), num_blocks=(1,),
                    attentions=(1,), attention_heads=2, attention_features=8,
                    pre_transformer=1, patch_size=1)
    defaults.update(kw)
    return QMDiffusion(**defaults)


@pytest.fixture(scope="module")
def tiny():
    model = tiny_model()
    seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
    target = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 6))
    variables = model.init(jax.random.PRNGKey(0), seq, target,
                           jax.random.PRNGKey(2))
    return model, variables, seq, target


def test_loss_finite_and_differentiable(tiny):
    model, variables, seq, target = tiny
    loss = model.apply(variables, seq, target, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: model.apply({"params": p}, seq, target,
                                           jax.random.PRNGKey(3)))(
        variables["params"])
    norms = [float(jnp.max(jnp.abs(g)))
             for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_sample_shape_and_range(tiny):
    model, variables, seq, _ = tiny
    out = sample(model, variables, seq, jax.random.PRNGKey(4), num_steps=6,
                 cond_scale=2.0, clamp=True)
    assert out.shape == (2, 8, 6)
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-6)


def test_sample_deterministic_given_key(tiny):
    model, variables, seq, _ = tiny
    a = sample(model, variables, seq, jax.random.PRNGKey(7), num_steps=4)
    b = sample(model, variables, seq, jax.random.PRNGKey(7), num_steps=4)
    assert np.allclose(a, b)


def test_inpaint_preserves_masked_region(tiny):
    model, variables, seq, target = tiny
    mask = jnp.zeros((2, 8, 6), bool).at[:, :4].set(True)
    out = inpaint(model, variables, seq, target, mask, jax.random.PRNGKey(5),
                  num_steps=5, num_resamples=2)
    assert np.allclose(out[:, :4], target[:, :4])
    assert not np.allclose(out[:, 4:], target[:, 4:])


def test_dp_train_step_on_mesh(tiny):
    """Gradient all-reduce over the 8-device virtual CPU mesh: the
    sharded-batch step must equal the single-device step."""
    import optax
    model, variables, _, _ = tiny
    assert len(jax.devices("cpu")) >= 8, \
        "conftest must force an 8-device virtual CPU mesh"
    # SGD so the param delta is linear in the gradient: adam's eps
    # normalization amplifies benign reduction-order noise at step 1
    tx = optax.sgd(1e-3)
    state = TrainState.create(variables["params"], tx)
    step_fn = make_diffusion_train_step(model, tx, donate=False)

    cond = np.random.RandomState(0).randn(16, 12).astype(np.float32)
    target = np.random.RandomState(1).randn(16, 8, 6).astype(np.float32)
    key = jax.random.PRNGKey(0)

    mesh = make_mesh(8, backend="cpu")
    cpu0 = jax.devices("cpu")[0]

    # single CPU device
    state1 = jax.device_put(state, cpu0)
    state1, loss1 = step_fn(state1, jax.device_put(jnp.asarray(cond), cpu0),
                            jax.device_put(jnp.asarray(target), cpu0),
                            jax.device_put(key, cpu0))

    # sharded over the mesh
    from moleculediffusiontransformer_tpu.parallel import replicate
    state8 = replicate(mesh, state)
    cond_s, target_s = shard_batch(mesh, (cond, target))
    state8, loss8 = step_fn(state8, cond_s, target_s, replicate(mesh, key))

    assert np.allclose(float(loss1), float(loss8), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_overfit_tiny_batch():
    """End-to-end: loss decreases markedly when overfitting one batch —
    the framework's analog of the reference's smoke notebook (SURVEY §4)."""
    model = tiny_model()
    seq = jnp.linspace(-1, 1, 4 * 12).reshape(4, 12)
    target = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (4, 8, 6)))
    variables = model.init(jax.random.PRNGKey(0), seq, target,
                           jax.random.PRNGKey(2))
    config = TrainConfig(learning_rate=2e-3, grad_clip_norm=1.0)
    tx = make_optimizer(config)
    state = TrainState.create(variables["params"], tx)
    step_fn = make_diffusion_train_step(model, tx, donate=False)
    key = jax.random.PRNGKey(9)
    losses = []
    for i in range(60):
        state, loss = step_fn(state, seq, target, key)
        losses.append(float(loss))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.5 * first, (first, last)


def test_checkpoint_roundtrip(tmp_path, tiny):
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        restore_checkpoint, save_checkpoint)
    model, variables, seq, target = tiny
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)
    path = save_checkpoint(str(tmp_path / "ck.msgpack"), state)
    restored = restore_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_tensor_parallel_2d_mesh(tiny):
    """2-D (data, model) mesh: tensor-parallel params + sharded batch must
    reproduce the single-device loss exactly (GSPMD inserts collectives)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from moleculediffusiontransformer_tpu.parallel.tp import (
        make_mesh_2d, tensor_parallel_specs)
    model, variables, _, _ = tiny
    assert len(jax.devices("cpu")) >= 8
    mesh2 = make_mesh_2d(4, 2, backend="cpu")
    tx = optax.sgd(1e-3)
    state = TrainState.create(variables["params"], tx)
    step_fn = make_diffusion_train_step(model, tx, donate=False)

    cond = np.random.RandomState(0).randn(16, 12).astype(np.float32)
    target = np.random.RandomState(1).randn(16, 8, 6).astype(np.float32)
    key = jax.random.PRNGKey(0)
    cpu0 = jax.devices("cpu")[0]

    s1 = jax.device_put(state, cpu0)
    s1, loss1 = step_fn(s1, jax.device_put(jnp.asarray(cond), cpu0),
                        jax.device_put(jnp.asarray(target), cpu0),
                        jax.device_put(key, cpu0))

    specs = tensor_parallel_specs(state.params, mesh2)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)) if len(s) > 0)
    assert n_sharded > 0, "expected some tensor-parallel params"
    params_tp = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh2, s)),
        state.params, specs)
    s2 = TrainState.create(params_tp, tx)
    dsh = NamedSharding(mesh2, P("data"))
    s2, loss2 = step_fn(s2, jax.device_put(cond, dsh),
                        jax.device_put(target, dsh),
                        jax.device_put(key, NamedSharding(mesh2, P())))
    assert np.allclose(float(loss1), float(loss2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_and_encoder_train_steps():
    """The AR-transformer (CE + CFG dropout) and encoder (MSE) train steps
    decrease loss on a fixed batch."""
    import optax
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence, MoleculeTransformerSequenceEncoder)
    from moleculediffusiontransformer_tpu.train import (
        make_encoder_train_step, make_transformer_train_step)
    key = jax.random.PRNGKey(0)
    # learnable mapping: distinct id rows, targets a function of the row
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 8, size=(8, 8)), jnp.int32)
    props = jnp.asarray(np.tanh(
        np.asarray(ids, np.float32)[:, :6].repeat(2, axis=1) / 4 - 1))

    tm = MoleculeTransformerSequence(dim=32, depth=2, logits_dim=8,
                                     dim_head=8, heads=4, text_embed_dim=16,
                                     max_text_len=12)
    v = tm.init({"params": key}, props, ids, key=key)
    tx = optax.adam(1e-3)
    state = TrainState.create(v["params"], tx)
    step = make_transformer_train_step(tm, tx, donate=False)
    losses = []
    for _ in range(60):
        state, loss = step(state, props, ids, key)
        losses.append(float(loss))
    # CE floor stays high under 25% conditioning dropout; require a clear
    # downward trend rather than halving
    assert losses[-1] < 0.65 * losses[0], (losses[0], losses[-1])

    enc = MoleculeTransformerSequenceEncoder(dim=32, depth=2, heads=4,
                                             logits_dim=1,
                                             logits_dim_length=12,
                                             max_length=8, max_tokens=8,
                                             embed_dim=16)
    ve = enc.init(key, ids)
    state = TrainState.create(ve["params"], tx)
    estep = make_encoder_train_step(enc, tx, donate=False)
    losses = []
    for _ in range(30):
        state, loss = estep(state, ids, props)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_remat_train_step_matches(tiny):
    """jax.checkpoint rematerialization must not change the step's result."""
    import optax
    model, variables, _, _ = tiny
    tx = optax.sgd(1e-3)
    cond = np.random.RandomState(0).randn(4, 12).astype(np.float32)
    target = np.random.RandomState(1).randn(4, 8, 6).astype(np.float32)
    key = jax.random.PRNGKey(0)
    outs = []
    for remat in (False, True):
        state = TrainState.create(variables["params"], tx)
        step = make_diffusion_train_step(model, tx, donate=False,
                                         remat=remat)
        state, loss = step(state, jnp.asarray(cond), jnp.asarray(target),
                           key)
        outs.append((float(loss), state.params))
    assert np.allclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gradient_accumulation_matches_microbatch_average(tiny):
    """accumulation_steps=A must produce EXACTLY the averaged gradient of
    the A independent microbatches (same folded keys), i.e. the full-batch
    semantics at 1/A the activation footprint."""
    import optax
    model, variables, _, _ = tiny
    tx = optax.sgd(1e-3)
    cond = jnp.asarray(np.random.RandomState(0).randn(8, 12), jnp.float32)
    target = jnp.asarray(np.random.RandomState(1).randn(8, 8, 6), jnp.float32)
    key = jax.random.PRNGKey(3)

    # CPU-pinned: the equality is exact there; on the tunneled TPU the
    # scan-vs-separate-calls reduction order adds benign noise
    with jax.default_device(jax.devices("cpu")[0]):
        state = TrainState.create(variables["params"], tx)
        step = make_diffusion_train_step(model, tx, donate=False,
                                         accumulation_steps=2)
        state_a, loss_a = step(state, cond, target, key)

        # oracle: two independent half-batch grads with the step's own keys
        folded = jax.random.fold_in(key, 0)
        keys = jax.random.split(folded, 2)

        def loss_fn(p, c, t, k):
            return model.apply({"params": p}, c, t, k)

        losses, grads = [], []
        for i in range(2):
            l, g = jax.value_and_grad(loss_fn)(
                state.params, cond[4 * i:4 * i + 4],
                target[4 * i:4 * i + 4], keys[i])
            losses.append(float(l))
            grads.append(g)
        avg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
        updates, _ = tx.update(avg, state.opt_state, state.params)
        params_o = optax.apply_updates(state.params, updates)

        assert np.allclose(float(loss_a), np.mean(losses), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                        jax.tree_util.tree_leaves(params_o)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_preflight_memory_check(tiny):
    """The preflight guard compiles the step, reports an estimate, and
    raises cleanly when the estimate exceeds the (spoofed) device limit."""
    import optax
    from moleculediffusiontransformer_tpu.train import preflight_memory_check
    model, variables, _, _ = tiny
    tx = optax.sgd(1e-3)
    state = TrainState.create(variables["params"], tx)
    step = make_diffusion_train_step(model, tx, donate=False)
    cond = jnp.zeros((4, 12))
    target = jnp.zeros((4, 8, 6))
    key = jax.random.PRNGKey(0)
    info = preflight_memory_check(step, state, cond, target, key)
    assert info["ok"]
    if "estimated_bytes" not in info:
        pytest.skip("backend provides no memory analysis")
    assert info["estimated_bytes"] > 0
    # spoof a tiny device limit via the margin machinery: monkeypatch
    # memory_stats through a fake device is brittle across backends, so
    # instead verify the raise path by calling the internal comparison
    # directly with a margin that forces failure when a real limit exists.
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        stats = None
    if stats and stats.get("bytes_limit"):
        with pytest.raises(RuntimeError, match="preflight"):
            preflight_memory_check(step, state, cond, target, key,
                                   margin=-1.0)


def test_in_epoch_eval_cadence(tiny, tmp_path):
    """eval_every_steps must produce mid-epoch eval records + checkpoints
    (reference `generative.py:1139-1172` evals every print_loss steps
    INSIDE the epoch)."""
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        latest_checkpoint)
    from moleculediffusiontransformer_tpu.train import train_diffusion

    model, _, seq, target = tiny
    cfg = TrainConfig(learning_rate=1e-3, epochs=1, print_loss_every=100,
                      eval_every_steps=2)
    X = np.tile(np.asarray(target), (4, 1, 1))
    y = np.tile(np.asarray(seq), (4, 1))

    def data_iter():
        for i in range(0, 8, 2):
            yield X[i:i + 2], y[i:i + 2]

    evals = []
    mesh = make_mesh(1, backend="cpu")
    state, logger = train_diffusion(
        model, data_iter, cfg, init_conditioning=y[:2], init_target=X[:2],
        mesh=mesh, eval_fn=lambda s: (evals.append(int(s.step))
                                      or {"eval_loss": 0.0}),
        checkpoint_dir=str(tmp_path))
    # 4 steps/epoch, cadence 2 -> in-epoch evals at steps 2 and 4, plus the
    # end-of-epoch eval
    assert evals == [2, 4, 4]
    in_epoch = [r for r in logger.history if r.get("in_epoch")]
    assert [r["step"] for r in in_epoch] == [2, 4]
    assert latest_checkpoint(str(tmp_path)) is not None


def test_orbax_checkpointer_async_roundtrip(tmp_path, tiny):
    """Production checkpoint tier (core/checkpoint_orbax.py): async saves
    must commit (after wait_until_finished), retention must prune, and
    restore must reproduce the saved state exactly."""
    from moleculediffusiontransformer_tpu.core.checkpoint_orbax import (
        OrbaxCheckpointer)
    model, variables, seq, target = tiny
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)
    step_fn = make_diffusion_train_step(model, tx, donate=False)
    key = jax.random.PRNGKey(0)

    states = {}
    with OrbaxCheckpointer(str(tmp_path / "orbax"), keep=2,
                           async_save=True) as ck:
        for i in range(4):
            state, _ = step_fn(state, seq, target, key)
            states[i + 1] = jax.device_get(state)
            assert ck.save(int(state.step), jax.device_get(state))
        ck.wait_until_finished()
        assert ck.all_steps() == [3, 4]          # keep=2 pruned 1, 2
        restored = ck.restore(jax.device_get(state))
        for a, b in zip(jax.tree_util.tree_leaves(states[4]),
                        jax.tree_util.tree_leaves(restored)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        # restore an older retained step too
        r3 = ck.restore(jax.device_get(state), step=3)
        for a, b in zip(jax.tree_util.tree_leaves(states[3]),
                        jax.tree_util.tree_leaves(r3)):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_orbax_sharded_restore_on_mesh(tmp_path, tiny):
    """Mesh-aware restore: leaves come back placed in the requested
    NamedSharding across the 8-device virtual mesh (no host-side
    full-tree staging), values identical."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from moleculediffusiontransformer_tpu.core.checkpoint_orbax import (
        OrbaxCheckpointer, shard_restore_target)
    from moleculediffusiontransformer_tpu.parallel.mesh import make_mesh

    model, variables, _, _ = tiny
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)
    host = jax.device_get(state)

    mesh = make_mesh(8, backend="cpu")
    with OrbaxCheckpointer(str(tmp_path / "orbax"), async_save=False) as ck:
        ck.save(0, host)
        ck.wait_until_finished()
        target = shard_restore_target(host, mesh)
        restored = ck.restore(target)

    for a, b in zip(jax.tree_util.tree_leaves(host.params),
                    jax.tree_util.tree_leaves(restored.params)):
        assert isinstance(b, jax.Array)
        assert len(b.sharding.device_set) == 8   # replicated over the mesh
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_train_diffusion_orbax_backend_resume(tmp_path, tiny):
    """train_diffusion with checkpoint_backend='orbax': async checkpoints
    must commit by trainer exit, and resume must continue from the saved
    step with identical state to the saved one."""
    from moleculediffusiontransformer_tpu.core.checkpoint_orbax import (
        OrbaxCheckpointer)
    from moleculediffusiontransformer_tpu.train import train_diffusion
    from moleculediffusiontransformer_tpu.parallel.mesh import make_mesh

    model, _, seq, target = tiny
    X = np.tile(np.asarray(target), (4, 1, 1))
    y = np.tile(np.asarray(seq), (4, 1))

    def data_iter():
        for i in range(0, 8, 2):
            yield X[i:i + 2], y[i:i + 2]

    cfg = TrainConfig(learning_rate=1e-3, epochs=1, print_loss_every=100,
                      checkpoint_backend="orbax", prefetch=0,
                      preflight_memory_check=False)
    mesh = make_mesh(1, backend="cpu")
    ckdir = str(tmp_path / "orbax_ck")
    state1, _ = train_diffusion(model, data_iter, cfg,
                                init_conditioning=y[:2], init_target=X[:2],
                                mesh=mesh, checkpoint_dir=ckdir)
    with OrbaxCheckpointer(ckdir) as ck:
        assert ck.latest_step() == 4        # 4 steps in the epoch, committed
    # resume: a fresh trainer continues from step 4, not 0
    state2, _ = train_diffusion(model, data_iter, cfg,
                                init_conditioning=y[:2], init_target=X[:2],
                                mesh=mesh, checkpoint_dir=ckdir, resume=True)
    assert int(state2.step) == 8


def test_orbax_accepts_relative_directory(tmp_path, tiny, monkeypatch):
    """The orbax tier must accept the same relative checkpoint_dir the
    msgpack tier does (tensorstore itself requires absolute paths)."""
    from moleculediffusiontransformer_tpu.core.checkpoint_orbax import (
        OrbaxCheckpointer)
    model, variables, _, _ = tiny
    tx = make_optimizer(TrainConfig())
    state = jax.device_get(TrainState.create(variables["params"], tx))
    monkeypatch.chdir(tmp_path)
    with OrbaxCheckpointer("rel_ckpts", async_save=False) as ck:
        ck.save(0, state)
        ck.wait_until_finished()
        assert ck.latest_step() == 0
        restored = ck.restore(state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_cosine_decays_and_constant_is_default():
    """lr_schedule='cosine': warmup ramps the effective step size up, decay
    shrinks it toward learning_rate * lr_min_ratio; the default stays the
    reference's fixed-LR Adam (identical update trajectory)."""
    import optax

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}

    def step_sizes(tx, n):
        state = tx.init(params)
        sizes = []
        for _ in range(n):
            updates, state = tx.update(grads, state, params)
            sizes.append(float(jnp.max(jnp.abs(updates["w"]))))
        return sizes

    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="cosine",
                      lr_warmup_steps=4, lr_decay_steps=16,
                      lr_min_ratio=0.1)
    sizes = step_sizes(make_optimizer(cfg), 16)
    assert sizes[0] < sizes[3] < sizes[4] * 1.01          # warmup ramps up
    assert sizes[-1] < sizes[4] * 0.25                    # cosine decays
    assert sizes[-1] > 0                                  # floor > 0

    # default config == plain fixed-LR Adam + clip (reference parity)
    base = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(2e-4))
    np.testing.assert_allclose(step_sizes(make_optimizer(TrainConfig()), 5),
                               step_sizes(base, 5), rtol=0, atol=0)

    with pytest.raises(ValueError):
        make_optimizer(TrainConfig(lr_schedule="cosine"))  # needs decay_steps
    with pytest.raises(ValueError):
        make_optimizer(TrainConfig(lr_schedule="bogus"))


def test_lr_schedule_position_survives_checkpoint_resume(tmp_path):
    """The cosine schedule is indexed by the optimizer state's own count,
    so save->restore->step must produce EXACTLY the update a never-
    interrupted run produces at that step."""
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        restore_checkpoint, save_step_checkpoint)

    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="cosine",
                      lr_warmup_steps=2, lr_decay_steps=12,
                      lr_min_ratio=0.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}

    # uninterrupted oracle: 6 updates
    state = tx.init(params)
    oracle = []
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
        oracle.append(np.asarray(updates["w"]))

    # interrupted: 3 updates, checkpoint, restore into a fresh tx, 3 more
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
    path = save_step_checkpoint(str(tmp_path), jax.device_get(state), 3)
    tx2 = make_optimizer(cfg)
    restored = restore_checkpoint(path, tx2.init(params))
    for i in range(3, 6):
        updates, restored = tx2.update(grads, restored, params)
        np.testing.assert_array_equal(np.asarray(updates["w"]), oracle[i])
