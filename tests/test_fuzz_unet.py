"""Config-envelope fuzz for UNet1d (hypothesis): random small geometries
(depth, multipliers, factors, attentions, patch size, groups) must
construct, forward to the right shape, and stay finite — the arity/
divisibility bugs a user hits first when deviating from the notebook
presets.  Runs eager (no per-config recompiles).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.nn.unet import UNet1d

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def unet_configs(draw):
    num_layers = draw(st.integers(min_value=1, max_value=2))
    factors = tuple(draw(st.sampled_from([2, 4]))
                    for _ in range(num_layers))
    # channels at attention levels must divide Transformer1d's GroupNorm(32)
    # — the reference hardcodes 32 groups too (`modules.py` to_in), so <32-
    # channel attention levels are invalid THERE as well; stay in the valid
    # envelope (channels 32, multipliers {1,2} keep every level divisible).
    cfg = dict(
        in_channels=draw(st.sampled_from([1, 2, 3])),
        channels=32,
        multipliers=tuple([1] + [draw(st.sampled_from([1, 2]))
                                 for _ in range(num_layers)]),
        factors=factors,
        num_blocks=tuple(draw(st.sampled_from([1, 2]))
                         for _ in range(num_layers)),
        attentions=tuple(draw(st.sampled_from([0, 1]))
                         for _ in range(num_layers + 1)),
        patch_size=draw(st.sampled_from([1, 2])),
        resnet_groups=draw(st.sampled_from([2, 4])),
        attention_heads=2,
        attention_features=8,
        attention_multiplier=2,
    )
    total = cfg["patch_size"] * int(np.prod(factors))
    length = total * draw(st.sampled_from([2, 4]))
    return cfg, length


@settings(max_examples=15, deadline=None)
@given(unet_configs())
def test_unet_random_geometry_forward(cfg_len):
    cfg, length = cfg_len
    model = UNet1d(**cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, length, cfg["in_channels"])).astype(np.float32))
    t = jnp.full((2,), 0.4, jnp.float32)
    with jax.disable_jit():
        variables = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(variables, x, t)
    assert out.shape == x.shape, (cfg, length)
    assert bool(jnp.all(jnp.isfinite(out))), (cfg, length)


@st.composite
def golden_configs(draw):
    """Valid-envelope configs buildable by BOTH implementations: channels
    32 with multipliers {1,2} keep every attention level divisible by the
    Transformer1d GroupNorm(32); length >=32 avoids the tiny-length
    GroupNorm noise amplification (CLAUDE.md parity rule)."""
    num_layers = draw(st.integers(min_value=1, max_value=2))
    return dict(
        in_channels=draw(st.sampled_from([2, 6])),
        channels=32,
        multipliers=tuple([1] + [draw(st.sampled_from([1, 2]))
                                 for _ in range(num_layers)]),
        factors=tuple(draw(st.sampled_from([2]))
                      for _ in range(num_layers)),
        num_blocks=tuple(draw(st.sampled_from([1, 2]))
                         for _ in range(num_layers)),
        attentions=tuple(draw(st.sampled_from([0, 1]))
                         for _ in range(num_layers + 1)),
        patch_size=draw(st.sampled_from([1, 2])),
        resnet_groups=8,
        attention_heads=draw(st.sampled_from([2, 4])),
        attention_features=8,
        attention_multiplier=2,
    )


@settings(max_examples=6, deadline=None)
@given(golden_configs(), st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_unet_random_geometry_golden_vs_torch(reference, cfg, seed):
    """Config-fuzz GOLDEN parity: a torch oracle built with the SAME
    random geometry, weights imported mechanically, outputs within 1e-4
    at length 64 — catches config-wiring bugs (block arity, skip routing,
    attention placement) the fixed-config goldens cannot."""
    import torch
    from moleculediffusiontransformer_tpu.nn.torch_import import (
        state_dict_to_params)
    torch.manual_seed(seed)
    ref_kw = {k: (list(v) if isinstance(v, tuple) else v)
              for k, v in cfg.items()}
    ref_kw["attention_use_rel_pos"] = False
    ref_mod = reference.modules.UNet1d(**ref_kw)
    ref_mod.eval()
    length = 64
    x = torch.randn(2, cfg["in_channels"], length)
    t = torch.rand(2)
    with torch.no_grad():
        ref = ref_mod(x, t).numpy()

    ours = UNet1d(**cfg)
    xl = jnp.asarray(x.numpy()).transpose(0, 2, 1)
    tj = jnp.asarray(t.numpy())
    with jax.disable_jit():
        params = ours.init(jax.random.PRNGKey(0), xl, tj)
        variables = {"params": state_dict_to_params(
            ref_mod.state_dict(), params["params"])}
        out = ours.apply(variables, xl, tj)
    got = np.transpose(np.asarray(out), (0, 2, 1))
    assert np.allclose(got, ref, atol=1e-4), (
        cfg, seed, float(np.abs(got - ref).max()))


@settings(max_examples=4, deadline=None)
@given(golden_configs(),
       st.integers(min_value=0, max_value=2 ** 31 - 1),
       st.sampled_from([1.0, 3.0]),
       st.sampled_from([(8, 16), (12, 24)]))
def test_unet_cfg_random_geometry_golden_vs_torch(reference, cfg, seed,
                                                  scale, ctx):
    """Config-fuzz GOLDEN parity for the CFG UNet: random geometry +
    context dims + embedding scale vs a same-config torch oracle — the
    batched-CFG restructuring (one doubled pass vs the reference's two
    sequential passes, `modules.py:1248-1253`) must hold everywhere in
    the envelope, not just at the notebook config."""
    import torch
    from moleculediffusiontransformer_tpu.nn.torch_import import (
        state_dict_to_params)
    from moleculediffusiontransformer_tpu.nn.unet import UNetCFG1d
    ctx_len, ctx_feat = ctx
    torch.manual_seed(seed)
    ref_kw = {k: (list(v) if isinstance(v, tuple) else v)
              for k, v in cfg.items()}
    ref_kw["attention_use_rel_pos"] = False
    ref_mod = reference.modules.UNetCFG1d(
        context_embedding_max_length=ctx_len,
        context_embedding_features=ctx_feat, **ref_kw)
    ref_mod.eval()
    x = torch.randn(2, cfg["in_channels"], 64)
    t = torch.rand(2)
    emb = torch.randn(2, ctx_len, ctx_feat)
    with torch.no_grad():
        ref = ref_mod(x, t, embedding=emb,
                      embedding_scale=scale).numpy()

    ours = UNetCFG1d(context_embedding_max_length=ctx_len,
                     context_embedding_features=ctx_feat, **cfg)
    xl = jnp.asarray(x.numpy()).transpose(0, 2, 1)
    tj = jnp.asarray(t.numpy())
    ej = jnp.asarray(emb.numpy())
    with jax.disable_jit():
        params = ours.init(jax.random.PRNGKey(0), xl, tj, embedding=ej)
        variables = {"params": state_dict_to_params(
            ref_mod.state_dict(), params["params"])}
        out = ours.apply(variables, xl, tj, embedding=ej,
                         embedding_scale=scale)
    got = np.transpose(np.asarray(out), (0, 2, 1))
    assert np.allclose(got, ref, atol=1e-4), (
        cfg, seed, scale, ctx, float(np.abs(got - ref).max()))
