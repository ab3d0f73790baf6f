"""MoE feed-forward (nn/moe.py) + expert parallelism (parallel/ep.py).

Both are TPU-native EXTENSIONS beyond the reference (its zoo is
dense-only, `transformer.py:4578-4790`): a GShard/Switch einsum MoE whose
stacked experts shard over an 8-device virtual mesh's 'expert' axis.

Pins: (1) the sparse dispatch/combine equals a per-token dense oracle
when capacity is unconstrained; (2) over-capacity tokens contribute
EXACTLY zero (residual pass-through); (3) the Switch aux loss matches its
formula; (4) an expert-sharded CE loss + grads equal the single-device
oracle (placement never changes math); (5) sharding specs target only the
stacked expert leaves.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from moleculediffusiontransformer_tpu.nn.moe import (MoEFeedForward,
                                                     moe_capacity)
from moleculediffusiontransformer_tpu.parallel import (expert_parallel_specs,
                                                       make_mesh_ep,
                                                       shard_batch_ep,
                                                       shard_params_ep)


def _erf_gelu(x):
    from scipy.special import erf
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _route_oracle(x2d, params, top_k):
    """numpy top-k routing: returns (idx (t,k), gates (t,k), probs (t,e))."""
    logits = x2d @ np.asarray(params["router"], np.float64)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    idx = np.argsort(-p, axis=-1, kind="stable")[:, :top_k]
    gates = np.take_along_axis(p, idx, axis=-1)
    gates = gates / gates.sum(-1, keepdims=True)
    return idx, gates, p


def _moe_oracle(x, params, top_k, cap):
    """Per-token dense loop with GShard slot-major capacity semantics."""
    b, n, d = x.shape
    x2d = x.reshape(b * n, d).astype(np.float64)
    idx, gates, _ = _route_oracle(x2d, params, top_k)
    w_in = np.asarray(params["w_in"], np.float64)
    w_out = np.asarray(params["w_out"], np.float64)
    e = w_in.shape[0]
    y = np.zeros_like(x2d)
    fill = np.zeros(e, np.int64)
    for j in range(top_k):          # slot-major: all slot-0 picks first
        for t in range(x2d.shape[0]):
            ex = int(idx[t, j])
            if fill[ex] >= cap:
                continue
            fill[ex] += 1
            h = _erf_gelu(x2d[t] @ w_in[ex])
            y[t] += gates[t, j] * (h @ w_out[ex])
    return y.reshape(b, n, d)


@pytest.fixture(scope="module")
def moe_setup():
    b, n, d, e, k = 2, 6, 8, 4, 2
    module = MoEFeedForward(dim=d, num_experts=e, mult=2, top_k=k,
                            capacity_factor=float(e))  # cap >= t: no drops
    x = jax.random.normal(jax.random.PRNGKey(3), (b, n, d))
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    return module, params, x, (b, n, d, e, k)


def test_moe_matches_dense_per_token_oracle(moe_setup):
    module, params, x, (b, n, d, e, k) = moe_setup
    y = module.apply({"params": params}, x)
    cap = moe_capacity(b * n, e, k, float(e))
    assert cap >= b * n  # unconstrained: the oracle never drops
    ref = _moe_oracle(np.asarray(x), params, k, cap)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)


def test_moe_capacity_drops_are_exactly_zero():
    """cap=1: each expert serves ONE token; every other token's output row
    is exactly 0 (so x + moe(x) passes it through unchanged)."""
    b, n, d, e = 1, 8, 8, 2
    module = MoEFeedForward(dim=d, num_experts=e, mult=2, top_k=1,
                            capacity_factor=e / (b * n))  # cap == 1
    x = jax.random.normal(jax.random.PRNGKey(7), (b, n, d))
    params = module.init(jax.random.PRNGKey(1), x)["params"]
    assert moe_capacity(b * n, e, 1, e / (b * n)) == 1
    y = np.asarray(module.apply({"params": params}, x)).reshape(b * n, d)

    idx, _, _ = _route_oracle(
        np.asarray(x).reshape(b * n, d).astype(np.float64), params, 1)
    seen, kept = set(), []
    for t in range(b * n):
        ex = int(idx[t, 0])
        (kept.append(t) if ex not in seen else None)
        seen.add(ex)
    dropped = [t for t in range(b * n) if t not in kept]
    assert dropped, "test needs over-capacity tokens"
    assert np.all(y[dropped] == 0.0)
    assert np.all(np.abs(y[kept]).max(axis=-1) > 0)


def test_moe_aux_loss_matches_switch_formula(moe_setup):
    module, params, x, (b, n, d, e, k) = moe_setup
    _, state = module.apply({"params": params}, x, mutable=["aux_loss"])
    aux = float(state["aux_loss"]["load_balance"][0])
    idx, _, probs = _route_oracle(
        np.asarray(x).reshape(b * n, d).astype(np.float64), params, k)
    frac = np.bincount(idx[:, 0], minlength=e) / (b * n)
    expect = e * float((frac * probs.mean(0)).sum())
    np.testing.assert_allclose(aux, expect, rtol=1e-5)


def test_expert_parallel_specs_target_stacked_experts_only(moe_setup):
    module, params, x, (b, n, d, e, k) = moe_setup
    specs = expert_parallel_specs({"moe": params}, e)
    assert specs["moe"]["w_in"] == P("expert")
    assert specs["moe"]["w_out"] == P("expert")
    assert specs["moe"]["router"] == P()


@pytest.fixture(scope="module")
def gpt_moe():
    from moleculediffusiontransformer_tpu.models import MoleculeTransformerGPT
    model = MoleculeTransformerGPT(
        dim=16, depth=2, max_tokens=12, logits_dim=12, dim_head=8, heads=2,
        ff_mult=2, embed_dim=8, ff_num_experts=4, ff_expert_top_k=2,
        ff_expert_capacity_factor=4.0)
    ids = jax.random.randint(jax.random.PRNGKey(2), (8, 10), 1, 12)
    variables = model.init(jax.random.PRNGKey(0), ids)
    return model, variables, ids


def test_gpt_moe_forward_and_loss_finite(gpt_moe):
    model, variables, ids = gpt_moe
    logits = model.apply(variables, ids)
    assert logits.shape == (8, 10, 12)
    loss = model.apply(variables, ids, return_loss=True)
    assert np.isfinite(float(loss))
    # every layer carries stacked experts
    for i in range(model.depth):
        assert variables["params"][f"layers_{i}_1_moe"]["w_in"].shape == \
            (4, 16, 32)


def test_ep_sharded_loss_and_grads_match_single_device(gpt_moe):
    """(data=2, expert=4) mesh: expert-sharded params + batch-sharded ids
    give the SAME CE loss and grads as one device."""
    model, variables, ids = gpt_moe
    mesh = make_mesh_ep(2, 4, backend="cpu")

    def loss_fn(params):
        return model.apply({"params": params}, ids_in, return_loss=True)

    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        ids_in = jnp.asarray(np.asarray(ids))
        l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"])

    placed, specs = shard_params_ep(mesh, variables["params"], 4)
    for i in range(model.depth):
        leaf = placed[f"layers_{i}_1_moe"]["w_in"]
        assert leaf.addressable_shards[0].data.shape[0] == 1  # 4 experts / 4
    ids_in = shard_batch_ep(mesh, jnp.asarray(np.asarray(ids)))
    l_ep, g_ep = jax.jit(jax.value_and_grad(loss_fn))(placed)

    np.testing.assert_allclose(float(l_ref), float(l_ep), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gpt_moe_trains_with_aux_loss(gpt_moe):
    """make_gpt_train_step: CE falls over SGD steps; aux_loss_weight>0
    actually reaches the router (its grad differs from the pure-CE one)."""
    import optax
    from moleculediffusiontransformer_tpu.train import (TrainState,
                                                        make_gpt_train_step)
    model, variables, ids = gpt_moe
    tx = optax.adam(3e-3)
    key = jax.random.PRNGKey(0)

    state = TrainState.create(variables["params"], tx)
    step = make_gpt_train_step(model, tx, donate=False,
                               aux_loss_weight=1e-2)
    losses = []
    for _ in range(12):
        state, loss = step(state, ids, key)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    def total(params, w):
        s = TrainState.create(params, tx)
        st = make_gpt_train_step(model, tx, donate=False,
                                 aux_loss_weight=w)
        _, l = st(s, ids, key)
        return float(l)

    # the aux term is really in the objective: loss(w>0) != loss(w=0)
    assert total(variables["params"], 1.0) != \
        total(variables["params"], 0.0)


def test_gpt_moe_cached_decode_matches_full_forward():
    """The MoE FF works inside the cached decode step: last-position logits
    from decode_step equal the full forward's (routing is per-token, so a
    1-token call routes identically when capacity admits the whole batch)."""
    from moleculediffusiontransformer_tpu.models import MoleculeTransformerGPT
    model = MoleculeTransformerGPT(
        dim=16, depth=2, max_tokens=12, logits_dim=12, dim_head=8, heads=2,
        ff_mult=2, embed_dim=8, ff_num_experts=2, ff_expert_top_k=1,
        ff_expert_capacity_factor=2.0)
    ids = jax.random.randint(jax.random.PRNGKey(5), (3, 6), 1, 12)
    variables = model.init(jax.random.PRNGKey(4), ids)
    full = model.apply(variables, ids)

    caches = model.apply(variables, 3, 6, method=type(model).init_cache)
    for pos in range(6):
        step_logits, caches = model.apply(
            variables, ids[:, pos], pos, caches,
            method=type(model).decode_step)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(full[:, -1]), atol=1e-5)
