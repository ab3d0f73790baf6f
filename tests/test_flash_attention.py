"""Blockwise flash attention (ops/flash_attention.py) vs the one-shot
softmax composition — interpret mode on CPU (same kernel program the TPU
compiles).  The online-softmax rescaling must be exact, not approximate.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.ops.flash_attention import (
    _flash_jnp, flash_attention)


def _qkv(key, bh, n, m, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (bh, n, d), dtype)
    k = jax.random.normal(kk, (bh, m, d), dtype)
    v = jax.random.normal(kv, (bh, m, d), dtype)
    return q, k, v


@pytest.mark.parametrize("n,m,block_q,block_kv", [
    (256, 256, 128, 128),   # multi-block both ways
    (512, 256, 128, 256),   # rectangular, cross-attention shape
    (128, 1024, 128, 256),  # long KV sweep (4 online rescales)
])
def test_flash_matches_one_shot_fp32(n, m, block_q, block_kv):
    q, k, v = _qkv(jax.random.PRNGKey(0), 4, n, m, 16)
    want = _flash_jnp(q, k, v, 16 ** -0.5)
    got = flash_attention(q, k, v, block_q=block_q, block_kv=block_kv,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_flash_single_block_degenerates():
    """One KV block = plain softmax attention (no rescale steps)."""
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 128, 128, 32)
    want = _flash_jnp(q, k, v, 32 ** -0.5)
    got = flash_attention(q, k, v, block_q=128, block_kv=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_flash_bf16_close_to_fp32_oracle():
    q, k, v = _qkv(jax.random.PRNGKey(2), 2, 256, 256, 16, jnp.bfloat16)
    want = _flash_jnp(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), 16 ** -0.5)
    got = flash_attention(q, k, v, block_q=128, block_kv=128,
                          interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=2e-2)


def test_flash_extreme_logits_stable():
    """Large-magnitude scores across blocks: the running max must keep the
    kernel finite where a naive exp(s) overflows."""
    q, k, v = _qkv(jax.random.PRNGKey(3), 2, 128, 512, 16)
    q = q * 40.0  # logits ~ +-400 after the dot
    want = _flash_jnp(q, k, v, 1.0)
    got = flash_attention(q, k, v, scale=1.0, block_q=128, block_kv=128,
                          interpret=True)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_flash_indivisible_falls_back():
    q, k, v = _qkv(jax.random.PRNGKey(4), 2, 130, 130, 16)
    want = _flash_jnp(q, k, v, 16 ** -0.5)
    got = flash_attention(q, k, v, block_q=128, block_kv=128,
                          interpret=True)   # 130 % 128 != 0 -> jnp path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_flash_equals_packed_sdpa_at_dispatch_shape():
    """At the long-L shape where packed_sdpa routes to flash on TPU, the
    kernel must equal the einsum path packed_sdpa uses everywhere else."""
    from moleculediffusiontransformer_tpu.nn.attention import packed_sdpa
    b, h, n, d = 2, 2, 512, 32
    key = jax.random.PRNGKey(6)
    q, k, v = _qkv(key, b * h, n, n, d)
    q4 = q.reshape(b, h, n, d)
    k4 = k.reshape(b, h, n, d)
    v4 = v.reshape(b, h, n, d)
    want = packed_sdpa(q4, k4, v4, d ** -0.5, jnp.float32)  # einsum on CPU
    got = flash_attention(q, k, v, block_q=256, block_kv=256,
                          interpret=True).reshape(b, h, n, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_flash_grads_match_composition():
    """The custom-vjp streaming backward (dQ and dK/dV kernels) must equal
    the composition's grads."""
    q, k, v = _qkv(jax.random.PRNGKey(5), 2, 256, 256, 16)

    def f_ref(q, k, v):
        return jnp.sum(_flash_jnp(q, k, v, 16 ** -0.5) ** 2)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_kv=128,
                                       interpret=True) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-4)


def test_mdt_flash_gate_controls_routing(monkeypatch):
    """packed_sdpa's long-L auto-route must honor MDT_FLASH: ON traces the
    Pallas kernel into the jaxpr, OFF keeps the einsum composition."""
    import importlib
    from moleculediffusiontransformer_tpu.nn import attention as attn_mod
    fa = importlib.import_module(
        "moleculediffusiontransformer_tpu.ops.flash_attention")

    monkeypatch.setattr(fa, "_on_tpu", lambda: True)
    # Pin the routing *machinery* at a CPU-cheap length; the production
    # threshold value itself is pinned by test_default_threshold_is_2048.
    monkeypatch.setattr(fa, "LONG_SEQ_THRESHOLD", 512)
    b, h, n, d = 1, 2, 512, 32
    q, k, v = (x.reshape(b, h, n, d) for x in _qkv(
        jax.random.PRNGKey(8), b * h, n, n, d))

    def jaxpr_text():
        return str(jax.make_jaxpr(
            lambda q, k, v: attn_mod.packed_sdpa(q, k, v, d ** -0.5,
                                                 jnp.float32))(q, k, v))

    monkeypatch.setenv("MDT_FLASH", "0")
    assert "pallas_call" not in jaxpr_text()
    monkeypatch.setenv("MDT_FLASH", "1")
    assert "pallas_call" in jaxpr_text()


def test_default_threshold_is_2048(monkeypatch):
    """The production auto-route threshold is evidence-based: hardware A/B
    (PERF.md flash table) has XLA's one-shot softmax winning at L=512 and
    L=1024 and flash winning from L=2048 — packed_sdpa must NOT route a
    1024-length call even with flash enabled."""
    import importlib
    from moleculediffusiontransformer_tpu.nn import attention as attn_mod
    fa = importlib.import_module(
        "moleculediffusiontransformer_tpu.ops.flash_attention")

    assert fa.LONG_SEQ_THRESHOLD == 2048
    monkeypatch.setattr(fa, "_on_tpu", lambda: True)
    monkeypatch.setenv("MDT_FLASH", "1")
    b, h, n, d = 1, 2, 1024, 32
    q, k, v = (x.reshape(b, h, n, d) for x in _qkv(
        jax.random.PRNGKey(11), b * h, n, n, d))
    jaxpr = str(jax.make_jaxpr(
        lambda q, k, v: attn_mod.packed_sdpa(q, k, v, d ** -0.5,
                                             jnp.float32))(q, k, v))
    assert "pallas_call" not in jaxpr


def test_flash_module_level_integration(monkeypatch):
    """The FULL Attention module at a long-L audio shape, run through the
    interpret-mode flash route (MDT_FLASH_INTERPRET), must equal the
    composition (MDT_FLASH=0) in outputs AND grads — pins the module's
    head folding / reshapes / custom vjp end-to-end on CPU."""
    import importlib
    fa = importlib.import_module(
        "moleculediffusiontransformer_tpu.ops.flash_attention")
    from moleculediffusiontransformer_tpu.nn.attention import Attention

    # interpret mode is O(L^2)-slow on CPU: exercise the route at 512
    monkeypatch.setattr(fa, "LONG_SEQ_THRESHOLD", 512)

    module = Attention(features=32, head_features=16, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 512, 32))
    variables = module.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        return jnp.sum(module.apply({"params": params}, x) ** 2)

    monkeypatch.setenv("MDT_FLASH", "0")
    out_ref = module.apply(variables, x)
    g_ref = jax.grad(loss, argnums=(0, 1))(variables["params"], x)

    monkeypatch.delenv("MDT_FLASH", raising=False)
    monkeypatch.setenv("MDT_FLASH_INTERPRET", "1")
    out_fl = module.apply(variables, x)
    g_fl = jax.grad(loss, argnums=(0, 1))(variables["params"], x)

    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref),
                               atol=5e-6, rtol=5e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-4)


def _tpu_available():
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


@pytest.mark.tpu_hw
@pytest.mark.skipif(not _tpu_available(), reason="needs a TPU backend")
def test_flash_compiled_on_tpu_matches_composition():
    """The COMPILED Mosaic kernels (forward AND backward, not interpret
    mode) must match the XLA one-shot composition on the real chip at a
    long-L audio shape, in bf16."""
    q, k, v = _qkv(jax.random.PRNGKey(7), 4, 1024, 1024, 64, jnp.bfloat16)

    ref = jax.jit(lambda q, k, v: _flash_jnp(q, k, v, 64 ** -0.5))(q, k, v)
    out = jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v)
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert d / scale < 0.05, (d, scale)

    def f_ref(q, k, v):
        return jnp.sum(_flash_jnp(q, k, v, 64 ** -0.5)
                       .astype(jnp.float32) ** 2)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
    g_fl = jax.jit(jax.grad(f_flash, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        da = float(jnp.max(jnp.abs(b.astype(jnp.float32)
                                   - a.astype(jnp.float32))))
        sa = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-6
        assert da / sa < 0.08, (da, sa)


def test_flash_random_shape_sweep_fwd_and_grads():
    """Shape-fuzz the streaming kernels (interpret): random (bh, n, m, d,
    block_q, block_kv) in the 128-multiple envelope — forward vs the
    one-shot softmax everywhere, dQ/dK/dV on a subset (the grid index
    maps and the lse/di lane-broadcast tiling must hold at every block
    partition, not just the three fixed cases above)."""
    import random
    rng = random.Random(11)
    for case in range(6):
        d = rng.choice([8, 16, 32])
        n = rng.choice([128, 256, 384, 512])
        m = rng.choice([128, 256, 512, 768])
        block_q = rng.choice([b for b in (128, 256) if n % b == 0])
        block_kv = rng.choice([b for b in (128, 256) if m % b == 0])
        bh = rng.choice([1, 2, 4])
        q, k, v = _qkv(jax.random.PRNGKey(case), bh, n, m, d)
        scale = d ** -0.5
        want = _flash_jnp(q, k, v, scale)
        got = flash_attention(q, k, v, block_q=block_q, block_kv=block_kv,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6, rtol=2e-6,
            err_msg=f"case {case}: bh={bh} n={n} m={m} d={d} "
                    f"bq={block_q} bkv={block_kv}")
        if case < 2:
            def loss_f(q, k, v):
                return jnp.sum(flash_attention(
                    q, k, v, block_q=block_q, block_kv=block_kv,
                    interpret=True) ** 2)

            def loss_s(q, k, v):
                return jnp.sum(_flash_jnp(q, k, v, scale) ** 2)

            gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
            gs = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
            for a, b in zip(gf, gs):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-5, rtol=5e-5)
