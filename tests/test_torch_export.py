"""Checkpoint interchange round-trip: flax params -> torch state_dict.

``params_to_state_dict`` must be the exact inverse of
``state_dict_to_params`` so a model fine-tuned here loads into the
reference's torch tooling (reference checkpoints README.md:44-60).
Round-trips are checked bit-exactly against REAL reference modules.
"""
import numpy as np
import pytest

import jax

from moleculediffusiontransformer_tpu.nn import (
    Transformer1d, UNetCFG1d, flax_path_to_torch_key, params_to_state_dict,
    state_dict_to_params, torch_key_to_path)


def to_jax(t):
    import jax.numpy as jnp
    return jnp.asarray(t.detach().cpu().numpy())


SMALL_UNET = dict(
    in_channels=6, channels=16, multipliers=(1, 2), factors=(2,),
    num_blocks=(2,), attentions=(1,), patch_size=2, resnet_groups=8,
    attention_heads=4, attention_features=8, attention_multiplier=2,
)


def _ref_cfg_unet(reference):
    import torch
    torch.manual_seed(0)
    kw = dict(SMALL_UNET)
    for k in ("multipliers", "factors", "num_blocks", "attentions"):
        kw[k] = list(kw[k])
    kw["attention_use_rel_pos"] = False
    ref_mod = reference.modules.UNetCFG1d(
        context_embedding_max_length=12, context_embedding_features=24, **kw)
    ref_mod.eval()
    return ref_mod


def _our_cfg_unet_params(ref_mod):
    import jax.numpy as jnp
    ours = UNetCFG1d(context_embedding_max_length=12,
                     context_embedding_features=24, **SMALL_UNET)
    x = jnp.zeros((1, 32, 6))
    variables = ours.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                          embedding=jnp.zeros((1, 12, 24)))
    return state_dict_to_params(ref_mod.state_dict(), variables["params"])


def test_key_inversion_on_reference_keys(reference):
    """flax_path_to_torch_key inverts torch_key_to_path for every key of a
    real reference module (incl. multi-index Sequential merges)."""
    ref_mod = _ref_cfg_unet(reference)
    for key in ref_mod.state_dict():
        assert flax_path_to_torch_key(torch_key_to_path(key)) == key


def test_unet_cfg_roundtrip_bit_exact(reference):
    """import -> export reproduces every reference parameter bit-exactly,
    keyed exactly like the reference's own state_dict."""
    ref_mod = _ref_cfg_unet(reference)
    sd = ref_mod.state_dict()
    params = _our_cfg_unet_params(ref_mod)
    exported = params_to_state_dict(params, like=sd.keys())
    param_names = {n for n, _ in ref_mod.named_parameters()}
    assert param_names <= set(exported)
    for key in param_names:
        ours, ref = exported[key], sd[key].detach().cpu().numpy()
        assert ours.shape == ref.shape, key
        assert np.array_equal(ours, ref), key


def test_exported_state_dict_loads_into_fresh_torch_module(reference):
    """torch.load_state_dict accepts the exported dict and the loaded module
    is numerically identical to the source of the weights."""
    import torch
    ref_mod = _ref_cfg_unet(reference)
    params = _our_cfg_unet_params(ref_mod)
    exported = params_to_state_dict(params, like=ref_mod.state_dict().keys())

    fresh = _ref_cfg_unet(reference)
    # clobber: prove the load actually moves weights
    with torch.no_grad():
        for p in fresh.parameters():
            p.add_(1.0)
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()}, strict=False)
    assert not unexpected, unexpected
    # only deterministic buffers may be missing
    assert all(m.rsplit(".", 1)[-1] in
               ("inv_freq", "beta", "window", "pos_indices")
               for m in missing), missing

    x, t = torch.randn(2, 6, 32), torch.rand(2)
    emb = torch.randn(2, 12, 24)
    with torch.no_grad():
        out_src = ref_mod(x, t, embedding=emb).numpy()
        out_new = fresh(x, t, embedding=emb).numpy()
    assert np.array_equal(out_src, out_new)


def test_transformer1d_roundtrip_bit_exact(reference):
    """Second family: Transformer1d (MQA attention, null-KV, in_proj)."""
    import torch
    import jax.numpy as jnp
    torch.manual_seed(1)
    ref_mod = reference.modules.Transformer1d(
        num_layers=2, channels=32, num_heads=4, head_features=8,
        multiplier=2, context_features=20)
    ref_mod.eval()
    ours = Transformer1d(2, 32, num_heads=4, head_features=8, multiplier=2,
                         context_features=20)
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32)),
                          context=jnp.zeros((1, 4, 20)))
    params = state_dict_to_params(ref_mod.state_dict(), variables["params"])
    sd = ref_mod.state_dict()
    exported = params_to_state_dict(params, like=sd.keys())
    for name, _ in ref_mod.named_parameters():
        assert np.array_equal(exported[name],
                              sd[name].detach().cpu().numpy()), name


def test_export_without_like_uses_canonical_keys(reference):
    """Bare export (no ``like``) emits canonical torch keys that re-import
    to the identical flax tree (full inverse on the flax side)."""
    ref_mod = _ref_cfg_unet(reference)
    params = _our_cfg_unet_params(ref_mod)
    exported = params_to_state_dict(params)
    reimported = state_dict_to_params(exported, params)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(reimported)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        assert np.array_equal(np.asarray(va), np.asarray(vb)), pa


def test_export_strict_raises_on_unknown_like_key(reference):
    ref_mod = _ref_cfg_unet(reference)
    params = _our_cfg_unet_params(ref_mod)
    with pytest.raises(KeyError):
        params_to_state_dict(params, like=["not.a.real.key"], strict=True)
    assert params_to_state_dict(params, like=["not.a.real.key"],
                                strict=False) == {}
