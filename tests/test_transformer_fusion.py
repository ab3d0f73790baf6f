"""The fused Transformer1d Pallas megakernel (ops/transformer_fusion.py)
must be numerically interchangeable with the module composition — forward
(interpret mode on CPU, fp32: ~1e-6), gradients (custom-vjp backward = the
slow path's autodiff), and the flax dispatch wiring itself.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.nn.attention import Transformer1d
from moleculediffusiontransformer_tpu.ops import transformer_fusion as tf

CPU = jax.devices("cpu")[0]


def _make(cross, num_layers=2, C=64, heads=4, d=16, mult=2):
    return Transformer1d(num_layers=num_layers, channels=C, num_heads=heads,
                         head_features=d, multiplier=mult,
                         context_features=C if cross else None)


def _data(cross, B=8, L=16, C=64, M=12):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, C))
    ctx = (jax.random.normal(jax.random.PRNGKey(1), (B, M, C))
           if cross else None)
    return x, ctx


@pytest.mark.parametrize("cross", [True, False])
@pytest.mark.parametrize("shape", [(8, 16, 64, 12), (6, 4, 32, 5),
                                   (16, 16, 64, 12), (2, 64, 64, 12)])
def test_fused_forward_matches_module(cross, shape):
    B, L, C, M = shape
    with jax.default_device(CPU):
        mod = _make(cross, C=C)
        x, ctx = _data(cross, B=B, L=L, C=C, M=M)
        args = (x, ctx) if cross else (x,)
        v = mod.init(jax.random.PRNGKey(0), *args)
        ref = mod.apply(v, *args)
        out = tf.transformer1d_fused(
            v["params"], x, ctx if cross else None, num_layers=2, heads=4,
            head_dim=16, multiplier=2,
            context_features=C if cross else None, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


@pytest.mark.parametrize("cross", [True, False])
@pytest.mark.parametrize("pallas_bwd", [True, False])
def test_fused_gradients_match_module(cross, pallas_bwd):
    """Both backward implementations — the Pallas segment chain (default)
    and the legacy rematerializing XLA autodiff — must reproduce the slow
    path's gradients for params, x AND context."""
    with jax.default_device(CPU):
        mod = _make(cross)
        x, ctx = _data(cross)
        args = (x, ctx) if cross else (x,)
        v = mod.init(jax.random.PRNGKey(0), *args)

        def loss_fused(params, x, ctx):
            with tf.fused_backward(pallas_bwd):
                out = tf.transformer1d_fused(
                    params, x, ctx if cross else None, num_layers=2,
                    heads=4, head_dim=16, multiplier=2,
                    context_features=64 if cross else None, interpret=True)
            return jnp.sum(out ** 2)

        def loss_slow(params, x, ctx):
            a = (x, ctx) if cross else (x,)
            return jnp.sum(mod.apply({"params": params}, *a) ** 2)

        argn = (0, 1, 2) if cross else (0, 1)
        gf = jax.grad(loss_fused, argnums=argn)(v["params"], x, ctx)
        gs = jax.grad(loss_slow, argnums=argn)(v["params"], x, ctx)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cross", [True, False])
def test_fused_gradients_grid_accumulation(cross):
    """grid > 1 (pack < batch): the backward kernels accumulate weight
    grads ACROSS grid programs (zeroed at program 0, `+=` after — TPU
    grids are sequential).  Every other gradient test's geometry resolves
    to pack == batch, so this is the only coverage of the revisit
    accumulation that production training (flagship grid up to 16)
    actually runs."""
    B, L, C = 16, 64, 64
    assert tf._choose_pack(B, L, C) < B  # really grid > 1
    with jax.default_device(CPU):
        mod = _make(cross)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, L, C))
        ctx = (jax.random.normal(jax.random.PRNGKey(1), (B, 12, C))
               if cross else None)
        args = (x, ctx) if cross else (x,)
        v = mod.init(jax.random.PRNGKey(2), *args)

        def loss_fused(params, x, ctx):
            with tf.fused_backward(True):
                out = tf.transformer1d_fused(
                    params, x, ctx, num_layers=2, heads=4, head_dim=16,
                    multiplier=2, context_features=C if cross else None,
                    interpret=True)
            return jnp.sum(out ** 2)

        def loss_slow(params, x, ctx):
            a = (x, ctx) if cross else (x,)
            return jnp.sum(mod.apply({"params": params}, *a) ** 2)

        argn = (0, 1, 2) if cross else (0, 1)
        gf = jax.grad(loss_fused, argnums=argn)(v["params"], x, ctx)
        gs = jax.grad(loss_slow, argnums=argn)(v["params"], x, ctx)
        # slightly looser than the grid==1 test: sequential per-program
        # partial sums vs XLA's tree reduction reorder fp32 adds (worst
        # observed: 1 of 4096 elements at 3.2e-4 rel)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)


def test_unflatten_grads_roundtrip():
    """unflatten_grads must invert flatten_params exactly (shapes, dtypes,
    tree structure) — the grad-tree reassembly the Pallas backward uses."""
    mod = _make(True)
    x, ctx = _data(True)
    v = mod.init(jax.random.PRNGKey(0), x, ctx)
    flat = tf.flatten_params(v["params"], 2, True)
    rebuilt = tf.unflatten_grads(flat, v["params"], 2, True)
    ref_leaves = jax.tree_util.tree_leaves_with_path(v["params"])
    new_leaves = jax.tree_util.tree_leaves_with_path(rebuilt)
    assert len(ref_leaves) == len(new_leaves)
    for (pa, a), (pb, b) in zip(ref_leaves, new_leaves):
        assert pa == pb
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dispatch_uses_kernel_and_matches():
    """With fusion enabled, Transformer1d.__call__ must route through the
    pallas kernel (same params, same output) — the end-to-end wiring the
    pure-function tests can't see."""
    with jax.default_device(CPU):
        mod = _make(True)
        x, ctx = _data(True)
        v = mod.init(jax.random.PRNGKey(0), x, ctx)
        ref = mod.apply(v, x, ctx)

        jaxpr = None
        try:
            tf._INTERPRET = True
            with tf.fused():
                assert tf.fusion_enabled()
                out = mod.apply(v, x, ctx)
                jaxpr = str(jax.make_jaxpr(
                    lambda p, a, c: mod.apply({"params": p}, a, c))(
                        v["params"], x, ctx))
        finally:
            tf._INTERPRET = False
        assert "pallas_call" in jaxpr
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        # disable_fusion pins the composition even when globally enabled
        mod2 = Transformer1d(num_layers=2, channels=64, num_heads=4,
                             head_features=16, multiplier=2,
                             context_features=64, disable_fusion=True)
        with tf.fused():
            jaxpr2 = str(jax.make_jaxpr(
                lambda p, a, c: mod2.apply({"params": p}, a, c))(
                    v["params"], x, ctx))
        assert "pallas_call" not in jaxpr2


def test_fusable_gate():
    x = jnp.zeros((4, 16, 64))
    ctx = jnp.zeros((4, 12, 64))
    assert tf.fusable(x, ctx, use_rel_pos=False, context_features=64)
    assert tf.fusable(x, None, use_rel_pos=False, context_features=None)
    assert not tf.fusable(x, ctx, use_rel_pos=True, context_features=64)
    assert not tf.fusable(jnp.zeros((4, 16, 24)), None, False, None)
    # context presence must match the config (slow path asserts/ignores)
    assert not tf.fusable(x, None, use_rel_pos=False, context_features=64)
    assert not tf.fusable(x, ctx, use_rel_pos=False, context_features=None)
    # long sequences take the XLA composition + flash attention: at
    # L=1024 the kernel measured neutral end-to-end and at 2**15 audio
    # scale it breaks XLA's whole-graph VMEM stack allocation
    assert tf.fusable(jnp.zeros((2, 512, 64)), None, False, None)
    assert not tf.fusable(jnp.zeros((2, 1024, 64)), None, False, None)


def test_vmem_budget_planning():
    """The flagship's C=512 stage exceeds Mosaic's default 16 MB scoped
    VMEM (measured: compile OOM at downsamples_1) — the plan must raise
    the limit for it, keep small geometries on the default, and reject
    configs beyond the 100 MB cap entirely."""
    # bench geometry (C=128): well under the default — no override
    small = tf._weight_bank_bytes(128, 512, 128, 4, 2, 2)
    est_small = tf._fwd_vmem_estimate(small, 16, 16, 128, 16 * 12, 128, 0, 2)
    assert est_small < tf._VMEM_DEFAULT_BYTES * 3 // 4
    from jax.experimental.pallas import tpu as pltpu
    assert tf._compiler_params(pltpu, False, est_small) == {}
    # flagship C=512 stage: banks alone > 16 MB -> raised limit
    big = tf._weight_bank_bytes(512, 512, 128, 4, 2, 2)
    assert big > tf._VMEM_DEFAULT_BYTES
    cp = tf._compiler_params(
        pltpu, False, tf._fwd_vmem_estimate(big, 32, 2, 512, 12, 128, 0, 2))
    lim = cp["compiler_params"].vmem_limit_bytes
    assert tf._VMEM_DEFAULT_BYTES < lim <= tf._VMEM_CAP_BYTES
    # interpret mode never sets compiler params
    assert tf._compiler_params(pltpu, True, 10 * big) == {}
    # a config whose weights cannot fit even the cap is not fusable
    x = jnp.zeros((4, 16, 2048), jnp.bfloat16)
    assert not tf.fusable(x, None, use_rel_pos=False, context_features=None,
                          num_layers=16, heads=8, head_dim=256,
                          multiplier=4)
    # the flagship stage IS fusable (fits the raised cap)
    xf = jnp.zeros((512, 2, 512), jnp.bfloat16)
    ctxf = jnp.zeros((512, 12, 128), jnp.bfloat16)
    assert tf.fusable(xf, ctxf, use_rel_pos=False, context_features=128,
                      num_layers=4, heads=8, head_dim=64, multiplier=2)


def test_training_step_with_fusion_enabled():
    """A full QMDiffusion train step with the fused path enabled must run
    and produce a loss close to the slow path (same params, same key)."""
    from moleculediffusiontransformer_tpu.models import QMDiffusion
    with jax.default_device(CPU):
        model = QMDiffusion(
            max_length=16, channels=32, pred_dim=8, text_embed_dim=16,
            embed_dim_position=16, context_embedding_max_length=12,
            multipliers=(1, 2), factors=(2,), num_blocks=(1,),
            attentions=(1,), attention_heads=2, attention_features=16,
            pre_transformer=1, patch_size=1)
        key = jax.random.PRNGKey(0)
        cond = jnp.zeros((4, 12))
        target = jax.random.normal(key, (4, 16, 8))
        v = model.init(key, cond, target, key)
        loss_slow = model.apply(v, cond, target, key)

        def loss_fn(params):
            return model.apply({"params": params}, cond, target, key)

        try:
            tf._INTERPRET = True
            with tf.fused():
                loss_fused, grads = jax.value_and_grad(loss_fn)(v["params"])
        finally:
            tf._INTERPRET = False
        np.testing.assert_allclose(float(loss_fused), float(loss_slow),
                                   rtol=1e-5)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))


def test_fusion_production_default_resolution():
    """With no explicit toggle the fused path resolves from MDT_FUSION /
    the default backend; explicit enable_fusion()/fused() always wins."""
    import os
    prev_enabled, prev_auto = tf._ENABLED, tf._AUTO
    prev_env = os.environ.get("MDT_FUSION")
    try:
        tf._ENABLED = None
        os.environ["MDT_FUSION"] = "1"
        tf._AUTO = None
        assert tf.fusion_enabled()
        os.environ["MDT_FUSION"] = "0"
        tf._AUTO = None
        assert not tf.fusion_enabled()
        with tf.fused(True):
            assert tf.fusion_enabled()      # explicit beats auto
        assert not tf.fusion_enabled()
        tf._ENABLED = False
        os.environ["MDT_FUSION"] = "1"
        tf._AUTO = None
        assert not tf.fusion_enabled()      # forced off beats env
    finally:
        tf._ENABLED, tf._AUTO = prev_enabled, prev_auto
        if prev_env is None:
            os.environ.pop("MDT_FUSION", None)
        else:
            os.environ["MDT_FUSION"] = prev_env


def test_production_sampling_path_uses_kernel():
    """The PUBLIC sampling surface (models.sample — what design.* and the
    examples call) must route through the Pallas kernel when fusion is on:
    the round-2 verdict found the fused path was bench-only in practice."""
    from moleculediffusiontransformer_tpu.models import QMDiffusion, sample
    with jax.default_device(CPU):
        model = QMDiffusion(
            max_length=16, channels=32, pred_dim=8, text_embed_dim=16,
            embed_dim_position=16, context_embedding_max_length=12,
            multipliers=(1, 2), factors=(2,), num_blocks=(1,),
            attentions=(1,), attention_heads=2, attention_features=16,
            pre_transformer=1, patch_size=1)
        key = jax.random.PRNGKey(0)
        props = jnp.zeros((2, 12))
        target = jnp.zeros((2, 16, 8))
        v = jax.jit(model.init)(key, props, target, key)
        ref = sample(model, v, props, key, num_steps=2, cond_scale=2.0)
        ref = np.asarray(ref)
        # the fusion flag is trace-time: drop the cached unfused trace of
        # the jitted `sample` so the fused flag can take effect
        jax.clear_caches()

        def fn(params, props, key):
            return sample(model, {"params": params}, props, key,
                          num_steps=2, cond_scale=2.0)

        try:
            tf._INTERPRET = True
            with tf.fused(True):
                jaxpr = str(jax.make_jaxpr(fn)(v["params"], props, key))
                out = fn(v["params"], props, key)
        finally:
            tf._INTERPRET = False
            jax.clear_caches()  # don't leak the fused trace to later tests
        assert "pallas_call" in jaxpr
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_cfg_null_half_shared_kv_exact():
    """The shared-KV null-half variant (round-2 verdict item 3): with the
    cfg_uniform_null_half flag active, the opt-in enabled, and a batch
    whose second half shares ONE context table, the fused dispatch must
    split the batch, run the null half through the dense shared-KV
    kernel, and still be output-equal to the slow composition."""
    tf.enable_sharedkv(True)
    try:
        _run_shared_kv_checks()
    finally:
        tf.enable_sharedkv(False)
        tf._SHAREDKV = None


def _run_shared_kv_checks():
    with jax.default_device(CPU):
        mod = _make(True)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 64))
        ctx_cond = jax.random.normal(jax.random.PRNGKey(1), (4, 12, 64))
        null_row = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 64))
        ctx = jnp.concatenate(
            [ctx_cond, jnp.broadcast_to(null_row, (4, 12, 64))], axis=0)
        v = mod.init(jax.random.PRNGKey(3), x, ctx)
        ref = mod.apply(v, x, ctx)

        try:
            tf._INTERPRET = True
            with tf.fused(True), tf.cfg_uniform_null_half(True):
                out = mod.apply(v, x, ctx)
                jaxpr = str(jax.make_jaxpr(
                    lambda p, a, c: mod.apply({"params": p}, a, c))(
                        v["params"], x, ctx))
        finally:
            tf._INTERPRET = False
        # two kernel launches: the conditioned half + the shared-KV half
        assert jaxpr.count("pallas_call") >= 2
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

        # a NON-uniform null half under the same flag must take the exact
        # packed fallback (the dispatch verifies uniformity at runtime
        # via lax.cond — the trace-time flag alone is not trusted)
        ctx_bad = jnp.concatenate(
            [ctx_cond, jax.random.normal(jax.random.PRNGKey(9),
                                         (4, 12, 64))], axis=0)
        ref_bad = mod.apply(v, x, ctx_bad)
        try:
            tf._INTERPRET = True
            with tf.fused(True), tf.cfg_uniform_null_half(True):
                out_bad = mod.apply(v, x, ctx_bad)
        finally:
            tf._INTERPRET = False
        np.testing.assert_allclose(np.asarray(out_bad), np.asarray(ref_bad),
                                   atol=2e-5)

        # direct: the uniform variant == slow with broadcast context
        out_u = tf.transformer1d_fused(
            v["params"], x[4:], null_row, num_layers=2, heads=4,
            head_dim=16, multiplier=2, context_features=64,
            interpret=True, uniform_ctx=True)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref[4:]),
                                   atol=2e-5)

        # the uniform variant stays differentiable (legacy backward):
        # d(context) is the broadcast-summed cotangent
        def loss_u(params, xx, cc):
            o = tf.transformer1d_fused(
                params, xx, cc, num_layers=2, heads=4, head_dim=16,
                multiplier=2, context_features=64, interpret=True,
                uniform_ctx=True)
            return jnp.sum(o ** 2)

        def loss_s(params, xx, cc):
            o = mod.apply({"params": params}, xx,
                          jnp.broadcast_to(cc, (4, 12, 64)))
            return jnp.sum(o ** 2)

        gu = jax.grad(loss_u, argnums=(0, 1, 2))(v["params"], x[4:],
                                                 null_row)
        gs = jax.grad(loss_s, argnums=(0, 1, 2))(v["params"], x[4:],
                                                 null_row)
        for a, b in zip(jax.tree_util.tree_leaves(gu),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_fusion_composes_with_dp_mesh():
    """Kernel x sharding: a DP train step over the 8-device virtual CPU
    mesh with the megakernel enabled (interpret) must reproduce the
    unfused mesh step's loss (round-2 verdict item 9)."""
    import optax
    from moleculediffusiontransformer_tpu.models import QMDiffusion
    from moleculediffusiontransformer_tpu.parallel import (make_mesh,
                                                           replicate,
                                                           shard_batch)
    from moleculediffusiontransformer_tpu.train import (
        TrainState, make_diffusion_train_step)
    assert len(jax.devices("cpu")) >= 8
    model = QMDiffusion(
        max_length=16, channels=32, pred_dim=8, text_embed_dim=16,
        embed_dim_position=16, context_embedding_max_length=12,
        multipliers=(1, 2), factors=(2,), num_blocks=(1,),
        attentions=(1,), attention_heads=2, attention_features=16,
        pre_transformer=1, patch_size=1)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(3)
    cond = rng.randn(8, 12).astype(np.float32)
    target = rng.randn(8, 16, 8).astype(np.float32)
    with jax.default_device(CPU):
        v = jax.jit(model.init)(key, jnp.asarray(cond[:2]),
                                jnp.asarray(target[:2]), key)
        tx = optax.sgd(1e-3)
        mesh = make_mesh(8, backend="cpu")
        cond_s, target_s = shard_batch(mesh, (cond, target))
        key_s = replicate(mesh, key)

        losses, params = [], []
        for use_fused in (False, True):
            state = replicate(mesh, TrainState.create(v["params"], tx))
            step = make_diffusion_train_step(model, tx, donate=False)
            try:
                tf._INTERPRET = use_fused
                with tf.fused(use_fused):
                    state, loss = step(state, cond_s, target_s, key_s)
            finally:
                tf._INTERPRET = False
            losses.append(float(loss))
            params.append(state.params)
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params[0]),
                        jax.tree_util.tree_leaves(params[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


# ------------------------------------------------ fused resnet stacks ------

def _resnet_tree(key, cin, cout, use_mapping, cm=24):
    from moleculediffusiontransformer_tpu.nn.blocks import ResnetBlock1d
    mod = ResnetBlock1d(cout, num_groups=8, use_mapping=use_mapping)
    x = jnp.zeros((2, 8, cin))
    mp = jnp.zeros((2, cm)) if use_mapping else None
    return mod, mod.init(jax.random.PRNGKey(key), x, mp)["params"]


@pytest.mark.parametrize("use_mapping", [True, False])
def test_resnet_stack_fused_matches_composition(use_mapping):
    from moleculediffusiontransformer_tpu.ops import resnet_fusion as rf
    with jax.default_device(CPU):
        B, L, C, CM = 4, 16, 32, 24
        trees = [_resnet_tree(i, C, C, use_mapping, CM)[1] for i in range(3)]
        x = jax.random.normal(jax.random.PRNGKey(9), (B, L, C))
        mp = (jax.random.normal(jax.random.PRNGKey(10), (B, CM))
              if use_mapping else None)
        out, outs = rf.resnet_stack_fused(trees, x, mp, collect=True,
                                          interpret=True)
        # composition oracle
        from moleculediffusiontransformer_tpu.nn.blocks import ResnetBlock1d
        h = x
        for t in trees:
            h = ResnetBlock1d(C, num_groups=8,
                              use_mapping=use_mapping).apply(
                {"params": t}, h, mp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(h),
                                   atol=2e-5)
        assert len(outs) == 3
        np.testing.assert_allclose(np.asarray(outs[-1]), np.asarray(h),
                                   atol=2e-5)


def test_resnet_stack_fused_skip_concat_and_proj():
    """UpsampleBlock layout: per-block skip concat widens the input, the
    1x1 to_out projection brings it back — exercised with skip_scale."""
    from moleculediffusiontransformer_tpu.ops import resnet_fusion as rf
    from moleculediffusiontransformer_tpu.nn.blocks import ResnetBlock1d
    with jax.default_device(CPU):
        B, L, C = 4, 8, 32
        scale = 2 ** -0.5
        trees = [_resnet_tree(20 + i, 2 * C, C, True)[1] for i in range(2)]
        x = jax.random.normal(jax.random.PRNGKey(11), (B, L, C))
        mp = jax.random.normal(jax.random.PRNGKey(12), (B, 24))
        skips = [jax.random.normal(jax.random.PRNGKey(13 + i), (B, L, C))
                 for i in range(2)]
        out, _ = rf.resnet_stack_fused(trees, x, mp, list(skips),
                                       skip_scale=scale, interpret=True)
        h = x
        for t, sk in zip(trees, skips):
            h = jnp.concatenate([h, sk * scale], axis=-1)
            h = ResnetBlock1d(C, num_groups=8, use_mapping=True).apply(
                {"params": t}, h, mp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(h),
                                   atol=2e-5)


def test_resnet_stack_fused_gradients():
    from moleculediffusiontransformer_tpu.ops import resnet_fusion as rf
    from moleculediffusiontransformer_tpu.nn.blocks import ResnetBlock1d
    with jax.default_device(CPU):
        B, L, C = 2, 8, 16
        trees = [_resnet_tree(30 + i, C, C, True)[1] for i in range(2)]
        x = jax.random.normal(jax.random.PRNGKey(14), (B, L, C))
        mp = jax.random.normal(jax.random.PRNGKey(15), (B, 24))

        def loss_fused(trees, x):
            out, _ = rf.resnet_stack_fused(trees, x, mp, interpret=True)
            return jnp.sum(out ** 2)

        def loss_slow(trees, x):
            h = x
            for t in trees:
                h = ResnetBlock1d(C, num_groups=8, use_mapping=True).apply(
                    {"params": t}, h, mp)
            return jnp.sum(h ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1))(trees, x)
        gs = jax.grad(loss_slow, argnums=(0, 1))(trees, x)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def _tpu_available():
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


@pytest.mark.tpu_hw
@pytest.mark.skipif(not _tpu_available(), reason="needs a TPU backend")
def test_fused_compiled_on_tpu_matches_bf16_composition():
    """The COMPILED Mosaic kernel (not interpret mode) must match the bf16
    XLA composition on the real chip to ~2 bf16 ulps."""
    mod = Transformer1d(num_layers=2, channels=64, num_heads=4,
                        head_features=16, multiplier=2, context_features=64,
                        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 16, 64), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (16, 12, 64),
                            jnp.bfloat16)
    v = jax.jit(mod.init)(key, x, ctx)
    ref = jax.jit(lambda: mod.apply(v, x, ctx))()
    out = jax.jit(lambda: tf.transformer1d_fused(
        v["params"], x, ctx, num_layers=2, heads=4, head_dim=16,
        multiplier=2, context_features=64, interpret=False))()
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert d / scale < 0.05, (d, scale)


@pytest.mark.tpu_hw
@pytest.mark.skipif(not _tpu_available(), reason="needs a TPU backend")
def test_fused_compiled_on_tpu_c512_raised_vmem():
    """The flagship's C=512 stage: its ~22 MB weight banks exceed Mosaic's
    default 16 MB scoped VMEM — this geometry only compiles through the
    raised `vmem_limit_bytes` plan (regression test for the flagship
    compile OOM)."""
    mod = Transformer1d(num_layers=4, channels=512, num_heads=8,
                        head_features=64, multiplier=2,
                        context_features=128, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 2, 512), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (8, 12, 128),
                            jnp.bfloat16)
    v = jax.jit(mod.init)(key, x, ctx)
    ref = jax.jit(lambda: mod.apply(v, x, ctx))()
    out = jax.jit(lambda: tf.transformer1d_fused(
        v["params"], x, ctx, num_layers=4, heads=8, head_dim=64,
        multiplier=2, context_features=128, interpret=False))()
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert d / scale < 0.05, (d, scale)


def test_fused_random_config_sweep_matches_module():
    """Config-fuzz the megakernel: random (layers, channels, heads,
    head_dim, multiplier, cross) combinations in the fusable envelope —
    forward parity everywhere, gradients on a subset (interpret-mode
    grads are expensive).  The fixed-config tests above pin the flagship
    geometry; this pins the knob wiring."""
    import random
    rng = random.Random(3)
    with jax.default_device(CPU):
        for case in range(6):
            cross = rng.random() < 0.5
            nl = rng.choice([1, 2, 3])
            C = rng.choice([32, 64])
            heads = rng.choice([2, 4])
            d = rng.choice([8, 16])
            mult = rng.choice([1, 2])
            B, L, M = rng.choice([2, 4]), rng.choice([4, 16]), rng.choice(
                [5, 12])
            mod = _make(cross, num_layers=nl, C=C, heads=heads, d=d,
                        mult=mult)
            key = jax.random.PRNGKey(case)
            x = jax.random.normal(key, (B, L, C))
            ctx = (jax.random.normal(jax.random.PRNGKey(case + 100),
                                     (B, M, C)) if cross else None)
            args = (x, ctx) if cross else (x,)
            v = mod.init(jax.random.PRNGKey(0), *args)
            assert tf.fusable(x, ctx, False, C if cross else None,
                              num_layers=nl, heads=heads, head_dim=d,
                              multiplier=mult), (case, nl, C, heads, d)
            ref = mod.apply(v, *args)
            out = tf.transformer1d_fused(
                v["params"], x, ctx, num_layers=nl, heads=heads,
                head_dim=d, multiplier=mult,
                context_features=C if cross else None, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5,
                err_msg=f"case {case}: nl={nl} C={C} h={heads} d={d} "
                        f"mult={mult} cross={cross}")
            if case < 2:   # grads on the first two configs
                def loss_fused(params):
                    o = tf.transformer1d_fused(
                        params, x, ctx, num_layers=nl, heads=heads,
                        head_dim=d, multiplier=mult,
                        context_features=C if cross else None,
                        interpret=True)
                    return jnp.sum(o ** 2)

                def loss_slow(params):
                    return jnp.sum(mod.apply({"params": params},
                                             *args) ** 2)

                gf = jax.grad(loss_fused)(v["params"])
                gs = jax.grad(loss_slow)(v["params"])
                for a, b in zip(jax.tree_util.tree_leaves(gf),
                                jax.tree_util.tree_leaves(gs)):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=1e-4,
                        atol=1e-5)


def test_trace_flags_invalidate_stale_inner_jit_traces():
    """Toggling a trace-time flag must invalidate already-cached jit
    traces: module-level jitted entry points (``qm_diffusion.sample``)
    key their inner cache on avals + static args, NOT on these globals,
    so before the fix the first trace at a geometry decided the mode for
    the whole process (an ``export_sampler(allow_tpu_custom_calls=False)``
    artifact even captured tpu_custom_call this way)."""

    @jax.jit
    def probe(x):
        return x + (1.0 if tf.fusion_enabled() else 0.0)

    with tf.fused(True):
        hot = float(probe(1.0))
        with tf.fused(False):   # same avals — must NOT reuse the trace
            cold = float(probe(1.0))
        assert float(probe(1.0)) == hot  # restored on context exit
    assert (hot, cold) == (2.0, 1.0)

    @jax.jit
    def probe_bwd(x):
        return x + (1.0 if tf._FUSED_BWD else 0.0)

    prev = tf._FUSED_BWD
    try:
        tf.enable_fused_backward(True)
        assert float(probe_bwd(1.0)) == 2.0
        tf.enable_fused_backward(False)
        assert float(probe_bwd(1.0)) == 1.0
    finally:
        tf.enable_fused_backward(prev)

    @jax.jit
    def probe_kv(x):
        return x + (1.0 if tf._sharedkv_opt_in() else 0.0)

    prev = tf._SHAREDKV
    try:
        tf.enable_sharedkv(True)
        assert float(probe_kv(1.0)) == 2.0
        tf.enable_sharedkv(False)
        assert float(probe_kv(1.0)) == 1.0
    finally:
        tf._set_trace_flag("_SHAREDKV", prev)
