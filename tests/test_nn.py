"""Network-layer tests: shape/param-count parity and golden numerical parity
against the reference PyTorch modules (weights imported bit-exactly).

Layout note: ours is channels-last (b, L, C); the torch reference is
channels-first (b, C, L).  Comparisons transpose at the boundary.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.nn import (
    Attention, Conv1d, ConvTranspose1d, GroupNorm, LearnedPositionalEmbedding,
    Transformer1d, UNet1d, UNetCFG1d, XUNet1d, patchify,
    positional_encoding_1d, state_dict_to_params, unpatchify)
from moleculediffusiontransformer_tpu.core.utils import count_parameters
from moleculediffusiontransformer_tpu.core import config as cfg

TOL = 2e-5


def to_jax(t):
    return jnp.asarray(t.detach().cpu().numpy())


def import_params(module, torch_module, *init_args, **init_kwargs):
    params = module.init(jax.random.PRNGKey(0), *init_args, **init_kwargs)
    imported = state_dict_to_params(torch_module.state_dict(),
                                    params["params"])
    return {"params": imported}


# ------------------------------------------------------------ primitives ---

def test_patchify_roundtrip():
    x = jnp.arange(2 * 12 * 6, dtype=jnp.float32).reshape(2, 12, 6)
    y = patchify(x, 4)
    assert y.shape == (2, 3, 24)
    assert jnp.allclose(unpatchify(y, 4), x)


def test_patchify_matches_einops(reference):
    import torch
    torch.manual_seed(0)
    from einops import rearrange
    x = np.random.RandomState(0).randn(2, 5, 12).astype(np.float32)  # b c L
    ref = rearrange(torch.tensor(x), "b c (l p) -> b (c p) l", p=4).numpy()
    ours = patchify(jnp.asarray(x.transpose(0, 2, 1)), 4)  # (b, L, c) in
    assert np.allclose(np.transpose(ours, (0, 2, 1)), ref, atol=1e-6)


def test_conv_transpose_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    for factor in (2, 3, 4):
        tconv = torch.nn.ConvTranspose1d(6, 8, kernel_size=factor * 2,
                                         stride=factor,
                                         padding=factor // 2 + factor % 2,
                                         output_padding=factor % 2)
        x = torch.randn(2, 6, 10)
        with torch.no_grad():
            ref = tconv(x).numpy()
        ours_mod = ConvTranspose1d(8, kernel_size=factor * 2, stride=factor,
                                   padding=factor // 2 + factor % 2,
                                   output_padding=factor % 2)
        variables = import_params(ours_mod, tconv,
                                  to_jax(x).transpose(0, 2, 1))
        out = ours_mod.apply(variables, to_jax(x).transpose(0, 2, 1))
        assert out.shape == (2, 10 * factor, 8)
        assert np.allclose(np.transpose(out, (0, 2, 1)), ref, atol=TOL)


def test_groupnorm_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    gn = torch.nn.GroupNorm(num_groups=4, num_channels=16)
    with torch.no_grad():
        gn.weight.uniform_(-1, 1)
        gn.bias.uniform_(-1, 1)
    x = torch.randn(3, 16, 9)
    with torch.no_grad():
        ref = gn(x).numpy()
    ours = GroupNorm(4)
    variables = import_params(ours, gn, to_jax(x).transpose(0, 2, 1))
    out = ours.apply(variables, to_jax(x).transpose(0, 2, 1))
    assert np.allclose(np.transpose(out, (0, 2, 1)), ref, atol=TOL)


def test_learned_positional_embedding_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.LearnedPositionalEmbedding(dim=16)
    x = torch.rand(5)
    with torch.no_grad():
        ref = ref_mod(x).numpy()
    ours = LearnedPositionalEmbedding(16)
    variables = import_params(ours, ref_mod, to_jax(x))
    out = ours.apply(variables, to_jax(x))
    assert np.allclose(out, ref, atol=TOL)


def test_positional_encoding_1d_matches_reference(reference):
    import torch
    torch.manual_seed(0)
    for channels, length in ((64, 12), (15, 7)):
        ref_mod = reference.graphmodel.PositionalEncoding1D(channels)
        dummy = torch.zeros(2, length, channels)
        with torch.no_grad():
            ref = ref_mod(dummy).numpy()
        ours = positional_encoding_1d(length, channels)
        assert np.allclose(ours, ref[0], atol=1e-6)


# ------------------------------------------------------------- attention ---

def test_attention_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.Attention(
        features=32, head_features=8, num_heads=4, use_rel_pos=False)
    x = torch.randn(2, 6, 32)
    with torch.no_grad():
        ref = ref_mod(x).numpy()
    ours = Attention(32, head_features=8, num_heads=4)
    variables = import_params(ours, ref_mod, to_jax(x))
    out = ours.apply(variables, to_jax(x))
    assert np.allclose(out, ref, atol=TOL)


def test_cross_attention_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.Attention(
        features=32, head_features=8, num_heads=4, context_features=20,
        use_rel_pos=False)
    x, ctx = torch.randn(2, 6, 32), torch.randn(2, 9, 20)
    with torch.no_grad():
        ref = ref_mod(x, context=ctx).numpy()
    ours = Attention(32, head_features=8, num_heads=4, context_features=20)
    variables = import_params(ours, ref_mod, to_jax(x), context=to_jax(ctx))
    out = ours.apply(variables, to_jax(x), context=to_jax(ctx))
    assert np.allclose(out, ref, atol=TOL)


def test_transformer1d_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.Transformer1d(
        num_layers=2, channels=32, num_heads=4, head_features=8,
        multiplier=2, context_features=20)
    x, ctx = torch.randn(2, 32, 6), torch.randn(2, 9, 20)
    with torch.no_grad():
        ref = ref_mod(x, context=ctx).numpy()
    ours = Transformer1d(2, 32, num_heads=4, head_features=8, multiplier=2,
                         context_features=20)
    xl = to_jax(x).transpose(0, 2, 1)
    variables = import_params(ours, ref_mod, xl, context=to_jax(ctx))
    out = ours.apply(variables, xl, context=to_jax(ctx))
    assert np.allclose(np.transpose(out, (0, 2, 1)), ref, atol=TOL)


# ------------------------------------------------------------------ UNet ---

SMALL_UNET = dict(
    in_channels=6, channels=16, multipliers=(1, 2), factors=(2,),
    num_blocks=(2,), attentions=(1,), patch_size=2, resnet_groups=8,
    attention_heads=4, attention_features=8, attention_multiplier=2,
)


def _ref_unet_kwargs():
    kw = dict(SMALL_UNET)
    kw["multipliers"] = list(kw["multipliers"])
    kw["factors"] = list(kw["factors"])
    kw["num_blocks"] = list(kw["num_blocks"])
    kw["attentions"] = list(kw["attentions"])
    kw["attention_use_rel_pos"] = False
    return kw


def test_unet_base_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.UNet1d(**_ref_unet_kwargs())
    ref_mod.eval()
    # length 32: at tiny lengths the Transformer1d GroupNorm(32)
    # normalizes over <4 values and amplifies fp32 noise ~1000x
    x, t = torch.randn(2, 6, 32), torch.rand(2)
    with torch.no_grad():
        ref = ref_mod(x, t).numpy()
    ours = UNet1d(**SMALL_UNET)
    xl = to_jax(x).transpose(0, 2, 1)
    variables = import_params(ours, ref_mod, xl, to_jax(t))
    out = ours.apply(variables, xl, to_jax(t))
    assert out.shape == (2, 32, 6)
    assert np.allclose(np.transpose(out, (0, 2, 1)), ref, atol=1e-4)


def test_unet_pre_transformer_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    kw = _ref_unet_kwargs()
    kw["pre_transformer"] = 1
    ref_mod = reference.modules.UNet1d(**kw)
    ref_mod.eval()
    # length 32: at tiny lengths the Transformer1d GroupNorm(32)
    # normalizes over <4 values and amplifies fp32 noise ~1000x
    x, t = torch.randn(2, 6, 32), torch.rand(2)
    with torch.no_grad():
        ref = ref_mod(x, t).numpy()
    ours = UNet1d(pre_transformer=1, **SMALL_UNET)
    xl = to_jax(x).transpose(0, 2, 1)
    variables = import_params(ours, ref_mod, xl, to_jax(t))
    out = ours.apply(variables, xl, to_jax(t))
    assert np.allclose(np.transpose(out, (0, 2, 1)), ref, atol=1e-4)


@pytest.mark.parametrize("scale", [1.0, 5.0])
def test_unet_cfg_matches_torch(reference, scale):
    """CFG parity incl. the batched-CFG restructuring at scale != 1
    (reference runs two sequential passes, `modules.py:1248-1253`)."""
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.UNetCFG1d(
        context_embedding_max_length=12, context_embedding_features=24,
        **_ref_unet_kwargs())
    ref_mod.eval()
    # length 32: at tiny lengths the Transformer1d GroupNorm(32)
    # normalizes over <4 values and amplifies fp32 noise ~1000x
    x, t = torch.randn(2, 6, 32), torch.rand(2)
    emb = torch.randn(2, 12, 24)
    with torch.no_grad():
        ref = ref_mod(x, t, embedding=emb, embedding_scale=scale).numpy()
    ours = UNetCFG1d(context_embedding_max_length=12,
                     context_embedding_features=24, **SMALL_UNET)
    xl = to_jax(x).transpose(0, 2, 1)
    variables = import_params(ours, ref_mod, xl, to_jax(t),
                              embedding=to_jax(emb))
    out = ours.apply(variables, xl, to_jax(t), embedding=to_jax(emb),
                     embedding_scale=scale)
    assert np.allclose(np.transpose(out, (0, 2, 1)), ref, atol=1e-4)


def test_unet_cfg_mask_proba_uses_fixed_embedding():
    """embedding_mask_proba=1 must equal explicit null conditioning."""
    ours = UNetCFG1d(context_embedding_max_length=12,
                     context_embedding_features=24, **SMALL_UNET)
    x = jnp.ones((2, 32, 6))
    t = jnp.full((2,), 0.3)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 24))
    variables = ours.init(jax.random.PRNGKey(0), x, t, embedding=emb)
    out_masked = ours.apply(variables, x, t, embedding=emb,
                            embedding_mask_proba=1.0,
                            rngs={"cfg": jax.random.PRNGKey(2)})
    # scale=0 blends to the pure null output
    out_null = ours.apply(variables, x, t, embedding=emb,
                          embedding_scale=0.0)
    assert np.allclose(out_masked, out_null, atol=1e-6)


def test_param_counts_match_notebook_presets():
    """Exact parameter-count parity with the shipped notebooks:
    18,322,684 (forward, Forward_Diffusion.ipynb cell 50) and
    90,965,554 (inverse, Inverse_Diffusion.ipynb cell 61)."""
    fwd = cfg.forward_diffusion_qm9()
    unet_fwd = XUNet1d(
        type="cfg", in_channels=fwd.pred_dim, channels=fwd.channels,
        patch_size=fwd.patch_size, multipliers=(1, 2, 4), factors=(4, 4),
        num_blocks=fwd.num_blocks, attentions=fwd.attentions,
        attention_heads=8, attention_features=64, attention_multiplier=2,
        context_embedding_features=fwd.conditioning_features,
        context_embedding_max_length=fwd.context_embedding_max_length)
    x = jnp.zeros((1, fwd.max_length, fwd.pred_dim))
    emb = jnp.zeros((1, fwd.context_embedding_max_length,
                     fwd.conditioning_features))
    params = unet_fwd.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                           embedding=emb)
    # task model adds fc1: Linear(1, 64) = 128 params
    assert count_parameters(params, verbose=False) + 128 == 18_322_684

    inv = cfg.inverse_diffusion_qm9(vocab_size=22)
    unet_inv = XUNet1d(
        type="cfg", in_channels=inv.pred_dim, channels=inv.channels,
        patch_size=inv.patch_size, multipliers=(1, 2, 4), factors=(4, 4),
        num_blocks=inv.num_blocks, attentions=inv.attentions,
        attention_heads=8, attention_features=64, attention_multiplier=2,
        pre_transformer=inv.pre_transformer,
        context_embedding_features=inv.conditioning_features,
        context_embedding_max_length=inv.context_embedding_max_length)
    x = jnp.zeros((1, inv.max_length, inv.pred_dim))
    emb = jnp.zeros((1, inv.context_embedding_max_length,
                     inv.conditioning_features))
    params = unet_inv.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                           embedding=emb)
    assert count_parameters(params, verbose=False) + 128 == 90_965_554


def test_packed_sdpa_matches_unpacked():
    """Block-diagonal MXU packing must be numerically equivalent to the
    plain batched attention (masked entries contribute exact zeros)."""
    from moleculediffusiontransformer_tpu.nn.attention import packed_sdpa
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (16, 8, 16, 64))          # bh=128, G=8
    k = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 12, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (16, 8, 12, 64))
    packed = packed_sdpa(q, k, v, 0.125, jnp.float32)
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision="highest") * 0.125
    p = jax.nn.softmax(sim, axis=-1)
    unpacked = jnp.einsum("bhnm,bhmd->bhnd", p, v, precision="highest")
    assert np.allclose(packed, unpacked, atol=2e-5)
    # odd bh that packing can't divide falls back to the plain path
    q1, k1, v1 = q[:3, :1], k[:3, :1], v[:3, :1]          # bh=3
    assert np.allclose(packed_sdpa(q1, k1, v1, 0.125, jnp.float32),
                       jnp.einsum("bhnm,bhmd->bhnd",
                                  jax.nn.softmax(jnp.einsum(
                                      "bhnd,bhmd->bhnm", q1, k1,
                                      precision="highest") * 0.125, -1),
                                  v1, precision="highest"), atol=2e-5)


def test_relative_position_bias_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.RelativePositionBias(
        num_buckets=32, max_distance=128, num_heads=4)
    with torch.no_grad():
        ref = ref_mod(10, 10).numpy()
    from moleculediffusiontransformer_tpu.nn import RelativePositionBias
    ours = RelativePositionBias(32, 128, 4)
    variables = import_params(ours, ref_mod, 10, 10)
    out = ours.apply(variables, 10, 10)
    assert np.allclose(out, ref, atol=1e-6)


def test_attention_rel_pos_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    ref_mod = reference.modules.Attention(
        features=32, head_features=8, num_heads=4, use_rel_pos=True,
        rel_pos_num_buckets=16, rel_pos_max_distance=32)
    x = torch.randn(2, 12, 32)
    with torch.no_grad():
        ref = ref_mod(x).numpy()
    ours = Attention(32, head_features=8, num_heads=4, use_rel_pos=True,
                     rel_pos_num_buckets=16, rel_pos_max_distance=32)
    variables = import_params(ours, ref_mod, to_jax(x))
    out = ours.apply(variables, to_jax(x))
    assert np.allclose(out, ref, atol=TOL)


def test_conv1d_lowering_dispatch():
    """fp32 must lower via im2col (exact dot semantics for parity); bf16
    rides XLA's native conv (PERF.md round-3 A/B: +6-7% flagship
    sampling) and must agree with the im2col formulation to bf16 noise
    across stride/dilation/padding geometries."""
    from moleculediffusiontransformer_tpu.nn.primitives import (
        conv1d, conv1d_im2col, conv1d_native)
    key = jax.random.PRNGKey(0)
    for (k, stride, pad, dil) in [(3, 1, 1, 1), (1, 1, 0, 1), (4, 2, 1, 1),
                                  (3, 1, 2, 2), (9, 1, 4, 1)]:
        x = jax.random.normal(key, (4, 32, 24))
        w = jax.random.normal(jax.random.PRNGKey(k), (k, 24, 16)) * 0.1
        # fp32: dispatch == im2col bit-exactly
        a = conv1d(x, w, stride=stride, pad_lo=pad, pad_hi=pad, dilation=dil)
        b = conv1d_im2col(x, w, stride=stride, pad_lo=pad, pad_hi=pad,
                          dilation=dil)
        assert a.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # bf16: dispatch == native, and native ~= im2col
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        nat = conv1d(xb, wb, stride=stride, pad_lo=pad, pad_hi=pad,
                     dilation=dil, dtype=jnp.bfloat16)
        im = conv1d_im2col(xb, wb, stride=stride, pad_lo=pad, pad_hi=pad,
                           dilation=dil, dtype=jnp.bfloat16)
        assert nat.dtype == jnp.bfloat16 and nat.shape == im.shape
        np.testing.assert_allclose(np.asarray(nat, np.float32),
                                   np.asarray(im, np.float32),
                                   rtol=2e-2, atol=2e-2)
        direct = conv1d_native(xb, wb, stride=stride, pad_lo=pad,
                               pad_hi=pad, dilation=dil,
                               dtype=jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(nat, np.float32),
                                      np.asarray(direct, np.float32))


def test_conv_transpose_bf16_native_matches_im2col():
    """bf16 ConvTranspose1d lowers through lhs-dilated native conv; it
    must agree with the fp32 im2col reference route to bf16 noise across
    the UNet's upsample geometries (factor 4 kernel 8, factor 2 kernel 4,
    output_padding)."""
    for (k, stride, pad, opad) in [(8, 4, 2, 0), (4, 2, 1, 0),
                                   (4, 2, 1, 1), (3, 1, 1, 0)]:
        mod32 = ConvTranspose1d(features=12, kernel_size=k, stride=stride,
                                padding=pad, output_padding=opad)
        mod16 = ConvTranspose1d(features=12, kernel_size=k, stride=stride,
                                padding=pad, output_padding=opad,
                                dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(k), (2, 16, 10))
        v = mod32.init(jax.random.PRNGKey(0), x)
        ref = mod32.apply(v, x)
        out = mod16.apply(v, x.astype(jnp.bfloat16))
        assert out.dtype == jnp.bfloat16
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), rtol=3e-2, atol=3e-2)
