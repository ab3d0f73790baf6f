"""End-to-end design-API tests: generate_from_conditioning and
inpaint_from_draft_and_conditioning through the public pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.data.preprocess import MinMaxScaler
from moleculediffusiontransformer_tpu.data.qm9 import (prepare_qm9,
                                                       synthetic_qm9)
from moleculediffusiontransformer_tpu.design import (
    generate_from_conditioning, inpaint_from_draft_and_conditioning)
from moleculediffusiontransformer_tpu.models import QMDiffusion


@pytest.fixture(scope="module")
def setup():
    smiles, props = synthetic_qm9(n=128, seed=2)
    data = prepare_qm9(smiles, props, mode="inverse_diffusion", max_length=16)
    model = QMDiffusion(max_length=16, channels=16, pred_dim=data.vocab_size,
                        text_embed_dim=16, embed_dim_position=8,
                        context_embedding_max_length=12,
                        multipliers=(1, 2), factors=(2,), num_blocks=(1,),
                        attentions=(1,), attention_heads=2,
                        attention_features=8, pre_transformer=0,
                        patch_size=1)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.asarray(data.y_train[:2]),
                           jnp.asarray(data.X_train[:2]), key)
    return model, variables, data


def test_generate_from_conditioning(setup):
    model, variables, data = setup
    scaler = data.scaler
    raw_props = scaler.inverse_transform(data.y_test[:3])
    report = generate_from_conditioning(
        model, variables, raw_props, data.tokenizer, jax.random.PRNGKey(1),
        scaler=scaler, training_smiles=data.smiles, cond_scale=2.0,
        timesteps=6)
    assert len(report["smiles"]) == 3
    assert report["raw_samples"].shape == (3, 16, data.vocab_size)
    assert 0.0 <= report["validity_fraction"] <= 1.0


def test_inpaint_from_draft(setup):
    model, variables, data = setup
    draft = data.smiles[0]
    raw_props = data.scaler.inverse_transform(data.y_test[:1])[0]
    report = inpaint_from_draft_and_conditioning(
        model, variables, draft, raw_props, fixed_positions=[0, 1],
        tokenizer=data.tokenizer, key=jax.random.PRNGKey(2),
        scaler=data.scaler, num_resamples=1, timesteps=5,
        num_candidates=2, training_smiles=data.smiles)
    assert len(report["smiles"]) == 2
    # the frozen positions keep the draft's leading characters
    for s in report["smiles"]:
        assert s[:2] == draft[:2] or len(draft) < 2


def test_generate_from_conditioning_mesh_serving(setup):
    """Batch-parallel serving: generate_from_conditioning(mesh=...) shards
    the request over the 8-device virtual mesh and must decode the SAME
    molecules as the single-device path for an evenly-dividing batch, and
    still produce a full-size valid report under padding (batch 6 on 8
    devices)."""
    from moleculediffusiontransformer_tpu.parallel.mesh import make_mesh
    model, variables, data = setup
    scaler = data.scaler
    mesh = make_mesh(8, backend="cpu")
    raw8 = scaler.inverse_transform(
        np.tile(data.y_test[:4], (2, 1)).astype(np.float32))
    kw = dict(scaler=scaler, training_smiles=data.smiles, cond_scale=2.0,
              timesteps=6)
    ref = generate_from_conditioning(model, variables, raw8, data.tokenizer,
                                     jax.random.PRNGKey(3), **kw)
    out = generate_from_conditioning(model, variables, raw8, data.tokenizer,
                                     jax.random.PRNGKey(3), mesh=mesh, **kw)
    assert out["smiles"] == ref["smiles"]          # bit-identical serving
    np.testing.assert_allclose(out["raw_samples"], ref["raw_samples"],
                               atol=1e-5)
    # padded case: 6 requests on 8 devices -> report covers exactly 6
    out6 = generate_from_conditioning(model, variables, raw8[:6],
                                      data.tokenizer, jax.random.PRNGKey(4),
                                      mesh=mesh, **kw)
    assert len(out6["smiles"]) == 6
    assert out6["raw_samples"].shape[0] == 6
