"""Pipeline parallelism (parallel/pp.py) on the virtual CPU mesh: GPipe
microbatching over the AR decoder trunk must be EXACT vs the sequential
forward — forward logits, the MSE training objective, and its gradients.

The reference runs the depth-N stack as a Python loop on one GPU
(`transformer.py:660-676`); pp is framework scaling machinery for the
depth-growth axis (docs/SCALING.md).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from moleculediffusiontransformer_tpu.models import (
    MoleculeTransformer, MoleculeTransformerSequence)
from moleculediffusiontransformer_tpu.parallel import make_mesh
from moleculediffusiontransformer_tpu.parallel.pp import (
    pipeline_forward, split_microbatches, stack_layer_params,
    unstack_layer_params)

KW = dict(dim=32, depth=4, logits_dim=6, dim_head=8, heads=4,
          text_embed_dim=16, max_text_len=12, pos_fourier_graph_dim=8)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices("cpu")) >= 4
    return make_mesh(4, axis_name="stage", backend="cpu")


@pytest.fixture(scope="module")
def tiny():
    model = MoleculeTransformer(**KW)
    seq = jnp.linspace(-1, 1, 4 * 12).reshape(4, 12)
    vecs = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 6))
    variables = model.init(jax.random.PRNGKey(0), seq, vecs,
                           cond_drop_prob=0.0)
    return model, variables["params"], seq, vecs


def test_stack_unstack_roundtrip(tiny):
    model, params, _, _ = tiny
    stacked, rest = stack_layer_params(params, model.depth)
    back = unstack_layer_params(stacked, rest)
    assert set(back) == set(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_microbatches_rejects_indivisible():
    with pytest.raises(ValueError):
        split_microbatches(jnp.zeros((5, 3)), 2)


def test_pipeline_forward_matches_sequential(mesh, tiny):
    model, params, seq, vecs = tiny
    want = model.apply({"params": params}, seq, vecs, cond_drop_prob=0.0)
    for n_micro in (1, 2, 4):
        got = pipeline_forward(model, params, seq, vecs, mesh=mesh,
                               n_micro=n_micro)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_pipeline_loss_and_grads_match_sequential(mesh, tiny):
    """jax.grad through the pipeline (scan + ppermute transpose = the GPipe
    backward) must equal the sequential loss gradients."""
    model, params, seq, vecs = tiny

    def loss_seq(p):
        return model.apply({"params": p}, seq, vecs, cond_drop_prob=0.0,
                           return_loss=True)

    def loss_pp(p):
        return pipeline_forward(model, p, seq, vecs, mesh=mesh, n_micro=2,
                                return_loss=True)

    l1, g1 = jax.value_and_grad(loss_seq)(params)
    l2, g2 = jax.value_and_grad(loss_pp)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_forward_token_decoder(mesh):
    """The token-ID decoder (the paper's inverse transformer) pipelines
    too: logits, shifted-CE loss, and grads match the sequential stack."""
    model = MoleculeTransformerSequence(
        dim=32, depth=4, logits_dim=10, dim_head=8, heads=4,
        text_embed_dim=16, max_text_len=12)
    seq = jnp.linspace(-1, 1, 4 * 12).reshape(4, 12)
    ids = jax.random.randint(jax.random.PRNGKey(3), (4, 6), 0, 10)
    params = model.init(jax.random.PRNGKey(0), seq, ids,
                        cond_drop_prob=0.0)["params"]

    want = model.apply({"params": params}, seq, ids, cond_drop_prob=0.0)
    got = pipeline_forward(model, params, seq, ids, mesh=mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_seq(p):
        return model.apply({"params": p}, seq, ids, cond_drop_prob=0.0,
                           return_loss=True)

    def loss_pp(p):
        return pipeline_forward(model, p, seq, ids, mesh=mesh, n_micro=2,
                                return_loss=True)

    l1, g1 = jax.value_and_grad(loss_seq)(params)
    l2, g2 = jax.value_and_grad(loss_pp)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_composes_with_dp(tiny):
    """2-D ('data', 'stage') mesh: microbatch contents sharded over 'data',
    layers over 'stage' — same logits and loss grads as sequential."""
    model, params, seq, vecs = tiny
    devs = np.asarray(jax.devices("cpu")[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("data", "stage"))

    want = model.apply({"params": params}, seq, vecs, cond_drop_prob=0.0)
    got = pipeline_forward(model, params, seq, vecs, mesh=mesh2, n_micro=2,
                           data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_seq(p):
        return model.apply({"params": p}, seq, vecs, cond_drop_prob=0.0,
                           return_loss=True)

    def loss_pp(p):
        return pipeline_forward(model, p, seq, vecs, mesh=mesh2, n_micro=2,
                                return_loss=True, data_axis="data")

    g1 = jax.grad(loss_seq)(params)
    g2 = jax.grad(loss_pp)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
