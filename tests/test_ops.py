"""ops layer: Pallas attention kernel parity with the jnp composition.
On non-TPU backends the dispatch falls back to jnp (kernel covered on the
real chip; the force_jnp path is covered everywhere)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.ops import attention


def _qkv(bh=8, n=16, m=24, d=64, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, n, d).astype(np.float32), dtype)
    k = jnp.asarray(rng.randn(bh, m, d).astype(np.float32), dtype)
    v = jnp.asarray(rng.randn(bh, m, d).astype(np.float32), dtype)
    return q, k, v


def test_attention_jnp_reference_math():
    q, k, v = _qkv()
    out = attention(q, k, v, force_jnp=True)
    # manual reference
    s = np.einsum("bnd,bmd->bnm", np.asarray(q), np.asarray(k)) * (64 ** -0.5)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bnm,bmd->bnd", p, np.asarray(v))
    assert np.allclose(np.asarray(out), ref, atol=2e-5)


def test_attention_pallas_matches_jnp():
    if jax.default_backend() != "tpu":
        pytest.skip("pallas kernel requires a TPU backend")
    q, k, v = _qkv()
    ref = attention(q, k, v, force_jnp=True)
    out = attention(q, k, v)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_pallas_bf16():
    if jax.default_backend() != "tpu":
        pytest.skip("pallas kernel requires a TPU backend")
    q, k, v = _qkv(dtype=jnp.bfloat16)
    ref = attention(q, k, v, force_jnp=True)
    out = attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    assert np.allclose(np.asarray(out, np.float32),
                       np.asarray(ref, np.float32), atol=3e-2)


def test_packed_attention_matches_jnp():
    from moleculediffusiontransformer_tpu.ops import packed_attention
    from moleculediffusiontransformer_tpu.ops.attention import _attention_jnp
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(128, 16, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(128, 12, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(128, 12, 64).astype(np.float32))
    ref = _attention_jnp(q, k, v, 64 ** -0.5)
    out = packed_attention(q, k, v)   # pallas on TPU, jnp fallback elsewhere
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
