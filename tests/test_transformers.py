"""Transformer-stack tests: golden parity vs the reference torch models
(imported weights), cached-decode == full-forward consistency, generation
shape/determinism, and notebook param counts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.core import config as cfg
from moleculediffusiontransformer_tpu.core.utils import count_parameters
from moleculediffusiontransformer_tpu.models.transformers import (
    MoleculeTransformer, MoleculeTransformerGPT, MoleculeTransformerSequence,
    MoleculeTransformerSequenceEncoder,
    MoleculeTransformerSequenceInternaldim, forward_with_cond_scale,
    generate_gpt, generate_sequence, generate_vectors)
from moleculediffusiontransformer_tpu.nn import state_dict_to_params

TOL = 3e-5


def to_jax(t):
    return jnp.asarray(t.detach().cpu().numpy())


def import_params(module, torch_module, *args, **kwargs):
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args,
                            **kwargs)
    return {"params": state_dict_to_params(torch_module.state_dict(),
                                           shapes["params"])}


SEQ_KW = dict(dim=32, depth=2, logits_dim=24, dim_head=8, heads=4,
              text_embed_dim=16, max_text_len=12)


def _data():
    import torch
    torch.manual_seed(0)
    seq = torch.rand(2, 12) * 2 - 1
    ids = torch.tensor([[1, 2, 3, 4, 5], [2, 3, 4, 5, 6]])
    return seq, ids


def test_sequence_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    ref = reference_transformer.MoleculeTransformerSequence(**SEQ_KW)
    ref.eval()
    seq, ids = _data()
    with torch.no_grad():
        r_logits = ref(sequences=seq, output=ids, cond_drop_prob=0.0).numpy()
        r_loss = float(ref(sequences=seq, output=ids, cond_drop_prob=0.0,
                           return_loss=True))
    ours = MoleculeTransformerSequence(**SEQ_KW)
    sj, ij = to_jax(seq), to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, sj, ij,
                              key=jax.random.PRNGKey(1))
    o_logits = ours.apply(variables, sj, ij, cond_drop_prob=0.0)
    assert np.allclose(o_logits, r_logits, atol=TOL)
    o_loss = float(ours.apply(variables, sj, ij, cond_drop_prob=0.0,
                              return_loss=True))
    assert abs(o_loss - r_loss) < 1e-4


def test_sequence_cfg_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    ref = reference_transformer.MoleculeTransformerSequence(**SEQ_KW)
    ref.eval()
    seq, ids = _data()
    with torch.no_grad():
        r = ref.forward_with_cond_scale(sequences=seq, output=ids,
                                        cond_scale=3.0).numpy()
    ours = MoleculeTransformerSequence(**SEQ_KW)
    sj, ij = to_jax(seq), to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, sj, ij, key=jax.random.PRNGKey(1))
    o = forward_with_cond_scale(ours, variables, sj, ij, cond_scale=3.0)
    assert np.allclose(o, r, atol=TOL)


def test_internaldim_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    kw = dict(SEQ_KW, max_tokens=24, embed_dim=16, one_kv_head=True)
    ref = reference_transformer.MoleculeTransformerSequenceInternaldim(**kw)
    ref.eval()
    seq, ids = _data()
    with torch.no_grad():
        r = ref(sequences=seq, output=ids, cond_drop_prob=0.0).numpy()
    ours = MoleculeTransformerSequenceInternaldim(**kw)
    sj, ij = to_jax(seq), to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, sj, ij, key=jax.random.PRNGKey(1))
    o = ours.apply(variables, sj, ij, cond_drop_prob=0.0)
    assert np.allclose(o, r, atol=TOL)


def test_continuous_transformer_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, logits_dim=6, dim_head=8, heads=4,
              text_embed_dim=16, max_text_len=12, pos_fourier_graph_dim=8)
    ref = reference_transformer.MoleculeTransformer(**kw)
    ref.eval()
    seq, _ = _data()
    vecs = torch.randn(2, 6, 5)       # torch layout (b, logits_dim, L)
    with torch.no_grad():
        r = ref(sequences=seq, output=vecs, cond_drop_prob=0.0).numpy()
    ours = MoleculeTransformer(**kw)
    sj = to_jax(seq)
    vj = to_jax(vecs).transpose(0, 2, 1)   # ours is channels-last
    variables = import_params(ours, ref, sj, vj, key=jax.random.PRNGKey(1))
    o = ours.apply(variables, sj, vj, cond_drop_prob=0.0)
    assert np.allclose(o, r, atol=TOL)


def test_continuous_generate_matches_torch(reference_transformer):
    """Golden parity for the continuous vector-feedback generate
    (reference `transformer.py:602-634`): raw CFG-blended logits fed back,
    no sampling, effective cond_scale 3 (the reference never forwards its
    cond_scale arg)."""
    import torch
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, logits_dim=6, dim_head=8, heads=4,
              text_embed_dim=16, max_text_len=12, pos_fourier_graph_dim=8)
    ref = reference_transformer.MoleculeTransformer(**kw)
    ref.eval()
    seq, _ = _data()
    with torch.no_grad():
        r = ref.generate(seq, tokens_to_generate=7).numpy()  # (2, 6, 7)
    ours = MoleculeTransformer(**kw)
    sj = to_jax(seq)
    variables = import_params(ours, ref, sj, jnp.zeros((2, 5, 6)),
                              key=jax.random.PRNGKey(1))
    o = generate_vectors(ours, variables, sj, tokens_to_generate=7)
    assert o.shape == (2, 7, 6)
    assert np.allclose(np.asarray(o).transpose(0, 2, 1), r, atol=2e-5)


def test_encoder_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, logits_dim=12, logits_dim_length=1,
              max_length=8, max_tokens=24, heads=4, embed_dim=16)
    ref = reference_transformer.MoleculeTransformerSequenceEncoder(**kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 0, 0, 0, 0], [2, 3, 4, 5, 6, 0, 0, 0]])
    with torch.no_grad():
        r = ref(ids).numpy()
    ours = MoleculeTransformerSequenceEncoder(**kw)
    ij = to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, ij)
    o = ours.apply(variables, ij)
    assert o.shape == r.shape
    assert np.allclose(o, r, atol=TOL)


def test_gpt_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, max_tokens=24, logits_dim=24, dim_head=8,
              heads=4, embed_dim=16)
    ref = reference_transformer.MoleculeTransformerGPT(**kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 0], [2, 3, 4, 5, 6]])
    with torch.no_grad():
        r = ref(output=ids).numpy()
        r_loss = float(ref(output=ids, return_loss=True,
                           ignore_padding_zeros=True))
    ours = MoleculeTransformerGPT(**kw)
    ij = to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, ij)
    o = ours.apply(variables, ij)
    assert np.allclose(o, r, atol=TOL)
    o_loss = float(ours.apply(variables, ij, return_loss=True,
                              ignore_padding_zeros=True))
    assert abs(o_loss - r_loss) < 1e-4


def test_gpt_pytorch_mha_matches_torch(reference_transformer):
    """Golden parity for MoleculeTransformerGPTPyTorch (reference
    `transformer.py:5270-5444`, last duplicate wins), BOTH ways around the
    reference's causal-mask bug.  The reference calls torch MHA with
    ``is_causal=True`` but NO attn_mask; on torch 2.x that hint is silently
    ignored (probed here), so the reference model is genuinely non-causal:

      * causal=False must match the RAW reference exactly (quirk parity);
      * causal=True (our default/fix) must match a mask-corrected oracle
        (the same torch module called with an explicit causal attn_mask).
    """
    import torch
    from moleculediffusiontransformer_tpu.models.transformers import (
        MoleculeTransformerGPTPyTorch)
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, max_tokens=24, logits_dim=24, heads=4,
              embed_dim=16, text_embed_dim=16)
    ref = reference_transformer.MoleculeTransformerGPTPyTorch(**kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 7], [2, 3, 4, 5, 6]])
    n = ids.shape[1]
    with torch.no_grad():
        # confirm the quirk on this torch build: is_causal hint is a no-op
        mha = ref.layers[0][0]
        x = torch.randn(2, n, kw["dim"])
        hinted = mha(x, x, x, is_causal=True, need_weights=False)[0]
        unmasked = mha(x, x, x, need_weights=False)[0]
        assert torch.allclose(hinted, unmasked, atol=1e-6), \
            "torch is_causal semantics changed; revisit this test"
        r = ref(output=ids).numpy()
        r_loss = float(ref(output=ids, return_loss=True))
        r_loss_pad = float(ref(output=ids, return_loss=True,
                               ignore_padding_zeros=True))
    ij = to_jax(ids).astype(jnp.int32)

    # 1) quirk parity: causal=False == raw reference
    ours_q = MoleculeTransformerGPTPyTorch(causal=False, **kw)
    variables = import_params(ours_q, ref, ij)
    o = ours_q.apply(variables, ij)
    assert o.shape == r.shape
    assert np.allclose(o, r, atol=TOL)
    o_loss = float(ours_q.apply(variables, ij, return_loss=True))
    assert abs(o_loss - r_loss) < 1e-4
    o_loss_pad = float(ours_q.apply(variables, ij, return_loss=True,
                                    ignore_padding_zeros=True))
    assert abs(o_loss_pad - r_loss_pad) < 1e-4

    # 2) corrected parity: causal=True == the torch module with the causal
    #    mask ACTUALLY applied (monkey-patch each MHA call with attn_mask)
    causal_mask = torch.triu(torch.ones(n, n, dtype=torch.bool), diagonal=1)
    with torch.no_grad():
        x = ref.token_embed(ids.long())
        x = x + ref.p_enc_1d_graph(torch.ones(2, n, ref.pos_fourier_graph_dim))
        x = ref.init_norm(ref.to_dim(x))
        for self_attn, ff in ref.layers:
            x = self_attn(x, x, x, attn_mask=causal_mask,
                          need_weights=False)[0] + x
            x = ff(x) + x
        r_fixed = ref.to_logits(ref.final_norm(x)).numpy()
    ours_c = MoleculeTransformerGPTPyTorch(**kw)   # causal=True default
    o_c = ours_c.apply(variables, ij)
    assert np.allclose(o_c, r_fixed, atol=TOL)
    assert not np.allclose(o_c, r, atol=1e-3)      # the quirk is material


def test_gpt_pytorch_mha_concat_pos_matches_torch(reference_transformer):
    """concat_pos_encoding=True variant (reference `transformer.py:5295-5300`:
    to_dim input widens to embed_dim + pos_fourier_graph_dim)."""
    import torch
    from moleculediffusiontransformer_tpu.models.transformers import (
        MoleculeTransformerGPTPyTorch)
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, max_tokens=24, logits_dim=24, heads=4,
              embed_dim=16, text_embed_dim=16, concat_pos_encoding=True,
              pos_fourier_graph_dim=8)
    ref = reference_transformer.MoleculeTransformerGPTPyTorch(**kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 7], [2, 3, 4, 5, 6]])
    with torch.no_grad():
        r = ref(output=ids).numpy()
    # raw-reference oracle -> quirk mode (see test above for why)
    ours = MoleculeTransformerGPTPyTorch(causal=False, **kw)
    ij = to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, ij)
    o = ours.apply(variables, ij)
    assert np.allclose(o, r, atol=TOL)


def test_generate_gpt_mha_deterministic_and_prefix():
    """generate_gpt_mha: shape, prefix preservation, argmax determinism,
    and gumbel determinism given a fixed key."""
    from moleculediffusiontransformer_tpu.models.transformers import (
        MoleculeTransformerGPTPyTorch, generate_gpt_mha)
    model = MoleculeTransformerGPTPyTorch(dim=32, depth=2, max_tokens=24,
                                          logits_dim=24, heads=4,
                                          embed_dim=16, text_embed_dim=16)
    start = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), start)
    out = generate_gpt_mha(model, variables, start, jax.random.PRNGKey(1),
                           tokens_to_generate=6)
    assert out.shape == (2, 8)
    assert np.array_equal(np.asarray(out[:, :2]), np.asarray(start))
    assert np.asarray(out).max() < 24 and np.asarray(out).min() >= 0
    out2 = generate_gpt_mha(model, variables, start, jax.random.PRNGKey(1),
                            tokens_to_generate=6)
    assert np.array_equal(np.asarray(out), np.asarray(out2))
    g1 = generate_gpt_mha(model, variables, start, jax.random.PRNGKey(2),
                          tokens_to_generate=6, use_gumbel_sample=False)
    g2 = generate_gpt_mha(model, variables, start, jax.random.PRNGKey(3),
                          tokens_to_generate=6, use_gumbel_sample=False)
    assert np.array_equal(np.asarray(g1), np.asarray(g2))  # argmax: key-free


def test_cached_decode_matches_full_forward():
    """The KV-cached decode path must produce the same logits as the full
    forward at every position (cond and null halves)."""
    key = jax.random.PRNGKey(0)
    model = MoleculeTransformerSequence(**SEQ_KW)
    seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
    ids = jnp.array([[1, 2, 3, 4, 5], [2, 3, 4, 5, 6]], jnp.int32)
    variables = model.init({"params": key}, seq, ids, key=key)

    full = model.apply(variables, seq, ids, cond_drop_prob=0.0)

    cond = model.apply(variables, seq,
                       method=MoleculeTransformerSequence.embed_conditioning)
    cond = cond[:, :model.max_text_len]
    text_mask = jnp.ones(cond.shape[:2], bool)
    cross_kvs = model.apply(variables, cond,
                            method=MoleculeTransformerSequence.cross_kv)
    caches = model.apply(variables, 2, ids.shape[1],
                         method=MoleculeTransformerSequence.init_cache)
    from moleculediffusiontransformer_tpu.nn.embeddings import (
        positional_encoding_1d)
    pe = positional_encoding_1d(ids.shape[1], model.dim)
    for pos in range(ids.shape[1]):
        emb = model.apply(variables, ids[:, pos:pos + 1],
                          method=lambda m, t: m.token_embed(t))
        x_t = emb + pe[pos][None, None]
        logits_t, caches = model.apply(
            variables, x_t, jnp.asarray(pos), cross_kvs, caches, text_mask,
            method=MoleculeTransformerSequence.decode_step)
        assert np.allclose(logits_t, full[:, pos], atol=2e-5), pos


def test_generate_deterministic_and_shapes():
    key = jax.random.PRNGKey(0)
    model = MoleculeTransformerSequence(**SEQ_KW)
    seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
    ids = jnp.array([[1, 2], [2, 3]], jnp.int32)
    variables = model.init({"params": key}, seq, ids, key=key)
    start = jnp.array([[1], [2]], jnp.int32)
    a = generate_sequence(model, variables, seq, start, key,
                          tokens_to_generate=6, cond_scale=3.0)
    b = generate_sequence(model, variables, seq, start, key,
                          tokens_to_generate=6, cond_scale=3.0)
    assert a.shape == (2, 7)
    assert np.array_equal(a, b)
    assert np.array_equal(a[:, 0], start[:, 0])
    assert np.all(np.asarray(a) >= 0) and np.all(np.asarray(a) < 24)


def test_generate_random_start_token():
    """start_ids=None draws one uniform start token per row (reference
    `transformer.py:805-808`) and must equal an explicit call with the
    same drawn tokens and the post-split key."""
    key = jax.random.PRNGKey(4)
    model = MoleculeTransformerSequence(**SEQ_KW)
    seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
    ids = jnp.array([[1, 2], [2, 3]], jnp.int32)
    variables = model.init({"params": key}, seq, ids, key=key)
    out = generate_sequence(model, variables, seq, None, key,
                            tokens_to_generate=5, cond_scale=2.0)
    assert out.shape == (2, 6)
    k2, ks = jax.random.split(key)
    start = jax.random.randint(ks, (2, 1), 0, model.logits_dim)
    explicit = generate_sequence(model, variables, seq, start, k2,
                                 tokens_to_generate=5, cond_scale=2.0)
    assert np.array_equal(out, explicit)
    assert np.array_equal(np.asarray(out[:, :1]), np.asarray(start))


def test_gpt_generate_shapes():
    key = jax.random.PRNGKey(0)
    model = MoleculeTransformerGPT(dim=32, depth=2, max_tokens=24,
                                   logits_dim=24, dim_head=8, heads=4,
                                   embed_dim=16)
    ids = jnp.array([[1, 2, 3], [2, 3, 4]], jnp.int32)
    variables = model.init(key, ids)
    out = generate_gpt(model, variables, ids[:, :1], key,
                       tokens_to_generate=5)
    assert out.shape == (2, 6)


def test_param_counts_match_notebook_presets():
    """2,407,712 (inverse transformer, Inverse_Transformer.ipynb cell 46)
    and 3,162,496 (forward encoder, Forward_Transformer.ipynb cell 57)."""
    t = cfg.inverse_transformer_qm9()
    model = MoleculeTransformerSequence(
        dim=t.dim, depth=t.depth, logits_dim=t.logits_dim,
        dim_head=t.dim_head, heads=t.heads, text_embed_dim=t.text_embed_dim,
        max_text_len=t.max_text_len)
    seq = jnp.zeros((1, 12))
    ids = jnp.zeros((1, 4), jnp.int32)
    shapes = jax.eval_shape(model.init,
                            {"params": jax.random.PRNGKey(0)}, seq, ids,
                            key=jax.random.PRNGKey(0))
    n = sum(int(np.prod(x.shape)) for x in
            jax.tree_util.tree_leaves(shapes["params"]))
    assert n == 2_407_712, n

    e = cfg.forward_transformer_qm9()
    enc = MoleculeTransformerSequenceEncoder(
        dim=e.dim, depth=e.depth, logits_dim=e.logits_dim,
        logits_dim_length=e.logits_dim_length, max_length=e.max_length,
        max_tokens=e.max_tokens, heads=e.heads, embed_dim=e.embed_dim,
        ff_mult=e.ff_mult)
    shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64), jnp.int32))
    n = sum(int(np.prod(x.shape)) for x in
            jax.tree_util.tree_leaves(shapes["params"]))
    assert n == 3_162_496, n


def test_gpt_ffcnn_glu_matches_torch(reference_transformer):
    """FF-CNN (causal depthwise conv sandwiches) + GLU variant golden parity."""
    import torch
    torch.manual_seed(0)
    kw = dict(dim=32, depth=2, max_tokens=24, logits_dim=24, dim_head=8,
              heads=4, embed_dim=16)
    ref = reference_transformer.MoleculeTransformerGPT(
        FF_conv_kernel=3, FF_inner_conv_kernel=3, FF_glu=True,
        use_null_kv=False, **kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 5, 6], [2, 3, 4, 5, 6, 7]])
    with torch.no_grad():
        r = ref(output=ids).numpy()
    ours = MoleculeTransformerGPT(ff_conv_kernel=3, ff_inner_conv_kernel=3,
                                  ff_glu=True, use_null_kv=False, **kw)
    ij = to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, ij)
    o = ours.apply(variables, ij)
    assert np.allclose(o, r, atol=TOL)


def test_gpt_concat_pos_encoding_matches_torch(reference_transformer):
    import torch
    torch.manual_seed(0)
    kw = dict(dim=32, depth=1, max_tokens=24, logits_dim=24, dim_head=8,
              heads=4, embed_dim=16)
    ref = reference_transformer.MoleculeTransformerGPT(
        concat_pos_encoding=True, pos_fourier_graph_dim=8, **kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 0]])
    with torch.no_grad():
        r = ref(output=ids).numpy()
    ours = MoleculeTransformerGPT(concat_pos_encoding=True,
                                  pos_fourier_graph_dim=8, **kw)
    ij = to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, ij)
    o = ours.apply(variables, ij)
    assert np.allclose(o, r, atol=TOL)


def test_gpt_gnn_attention_matches_torch(reference_transformer):
    """Dense-GCN message passing on the attention matrix (GNN_layers>0)."""
    import torch
    if not hasattr(reference_transformer, "GraphConvLayers"):
        pytest.skip("reference GraphConvLayers unavailable")
    torch.manual_seed(0)
    kw = dict(dim=32, depth=1, max_tokens=24, logits_dim=24, dim_head=8,
              heads=4, embed_dim=16)
    # one_kv_head=False: the reference's GNN rearrange assumes multi-head
    # KV and crashes otherwise (`transformer.py:1434` with (b, j, d) inputs)
    ref = reference_transformer.MoleculeTransformerGPT(
        GNN_layers=2, use_null_kv=False, one_kv_head=False, **kw)
    ref.eval()
    ids = torch.tensor([[1, 2, 3, 4, 5, 6], [3, 4, 5, 6, 7, 1]])
    with torch.no_grad():
        r = ref(output=ids).numpy()
    ours = MoleculeTransformerGPT(gnn_layers=2, use_null_kv=False,
                                  one_kv_head=False, **kw)
    ij = to_jax(ids).astype(jnp.int32)
    variables = import_params(ours, ref, ij)
    o = ours.apply(variables, ij)
    assert np.allclose(o, r, atol=1e-4)


def test_packed_shared_kv_sdpa_equals_plain():
    """The decode-path MXU packing must be numerically equivalent to the
    plain batched einsum for every mask combination."""
    from moleculediffusiontransformer_tpu.nn.transformer_blocks import (
        NEG_INF, packed_shared_kv_sdpa)
    rng = np.random.RandomState(0)
    b, h, n, d, j = 32, 8, 1, 16, 17
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, j, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, j, d), jnp.float32)
    masks = [None,
             jnp.asarray(rng.rand(b, 1, n, j) > 0.3),
             jnp.asarray((np.arange(j) <= 8)[None, None, None, :])]
    for mask in masks:
        if mask is not None:  # every row needs >= 1 valid key
            mask = mask.at[..., 0].set(True)
        got = packed_shared_kv_sdpa(q, k, v, mask, jnp.float32)
        assert got is not None
        sim = jnp.einsum("bhnd,bjd->bhnj", q, k,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        if mask is not None:
            sim = jnp.where(mask, sim, NEG_INF)
        att = jax.nn.softmax(sim, axis=-1)
        want = jnp.einsum("bhnj,bjd->bhnd", att, v,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_gpt_random_config_golden_vs_torch(reference_transformer):
    """Config-fuzz GOLDEN parity for the GPT zoo: random combinations of
    the constructor knobs (one_kv_head, null-KV, FF-CNN kernels, GLU,
    concat positions, ff_mult) vs torch oracles built with the same
    config — catches knob-wiring bugs the fixed-variant goldens cannot.
    Deterministic sweep (seeded RNG) rather than hypothesis: each example
    builds a torch module, so examples are expensive."""
    import random
    import torch
    rng = random.Random(7)
    base = dict(dim=32, depth=2, max_tokens=24, logits_dim=24, dim_head=8,
                heads=4, embed_dim=16)
    for case in range(8):
        concat = rng.random() < 0.3
        knobs = dict(
            one_kv_head=rng.random() < 0.5,
            use_null_kv=rng.random() < 0.5,
            ff_mult=rng.choice([2, 4]),
            ff_conv_kernel=rng.choice([0, 3]),
            ff_inner_conv_kernel=rng.choice([0, 3]),
            ff_glu=rng.random() < 0.5,
            concat_pos_encoding=concat,
            pos_fourier_graph_dim=8 if concat else None,
        )
        ref_knobs = {{"ff_conv_kernel": "FF_conv_kernel",
                      "ff_inner_conv_kernel": "FF_inner_conv_kernel",
                      "ff_glu": "FF_glu"}.get(k, k): v
                     for k, v in knobs.items()}
        torch.manual_seed(case)
        ref = reference_transformer.MoleculeTransformerGPT(
            **ref_knobs, **base)
        ref.eval()
        ids = torch.randint(1, 24, (2, 7))
        with torch.no_grad():
            r = ref(output=ids).numpy()
        ours = MoleculeTransformerGPT(**knobs, **base)
        ij = to_jax(ids).astype(jnp.int32)
        variables = import_params(ours, ref, ij)
        o = ours.apply(variables, ij)
        assert np.allclose(o, r, atol=1e-4), (
            case, knobs, float(np.abs(np.asarray(o) - r).max()))


def test_sequence_random_config_golden_vs_torch(reference_transformer):
    """Config-fuzz GOLDEN parity for the Sequence decoder: random (dim,
    depth, logits_dim, dim_head, heads, ff_mult, text_embed_dim,
    max_text_len) vs same-config torch oracles — the MQA + null-KV +
    Fourier-conditioning wiring must hold across the envelope."""
    import random
    import torch
    rng = random.Random(5)
    for case in range(6):
        kw = dict(dim=rng.choice([16, 32]), depth=rng.choice([1, 2, 3]),
                  logits_dim=rng.choice([16, 24]),
                  dim_head=rng.choice([4, 8]), heads=rng.choice([2, 4]),
                  ff_mult=rng.choice([2, 4]),
                  text_embed_dim=rng.choice([8, 16]),
                  max_text_len=rng.choice([8, 12]))
        torch.manual_seed(case)
        ref = reference_transformer.MoleculeTransformerSequence(**kw)
        ref.eval()
        seq = torch.rand(2, kw["max_text_len"]) * 2 - 1
        ids = torch.randint(1, kw["logits_dim"], (2, 6))
        with torch.no_grad():
            r = ref(sequences=seq, output=ids, cond_drop_prob=0.0).numpy()
        ours = MoleculeTransformerSequence(**kw)
        sj, ij = to_jax(seq), to_jax(ids).astype(jnp.int32)
        variables = import_params(ours, ref, sj, ij,
                                  key=jax.random.PRNGKey(1))
        o = ours.apply(variables, sj, ij, cond_drop_prob=0.0)
        assert np.allclose(o, r, atol=1e-4), (
            case, kw, float(np.abs(np.asarray(o) - r).max()))


def test_encoder_internaldim_random_config_golden_vs_torch(
        reference_transformer):
    """Config-fuzz GOLDEN parity for the two remaining families: the
    property encoder (pooling/projection wiring across output geometries)
    and the Internaldim decoder (separate embed vs internal dim)."""
    import random
    import torch
    rng = random.Random(9)
    for case in range(4):
        kw = dict(dim=rng.choice([16, 32]), depth=rng.choice([1, 2]),
                  logits_dim=rng.choice([1, 3]),
                  logits_dim_length=rng.choice([6, 12]),
                  max_length=rng.choice([8, 16]),
                  max_tokens=rng.choice([16, 24]),
                  heads=rng.choice([2, 4]), ff_mult=rng.choice([2, 4]),
                  embed_dim=rng.choice([8, 16]))
        torch.manual_seed(case)
        ref = reference_transformer.MoleculeTransformerSequenceEncoder(**kw)
        ref.eval()
        ids = torch.randint(0, kw["max_tokens"], (2, kw["max_length"]))
        with torch.no_grad():
            r = ref(ids).numpy()
        ours = MoleculeTransformerSequenceEncoder(**kw)
        ij = to_jax(ids).astype(jnp.int32)
        variables = import_params(ours, ref, ij)
        o = ours.apply(variables, ij)
        assert np.allclose(o, r, atol=1e-4), (case, kw)

    for case in range(4):
        kw = dict(dim=rng.choice([16, 32]), depth=rng.choice([1, 2]),
                  logits_dim=rng.choice([16, 24]),
                  dim_head=rng.choice([4, 8]), heads=rng.choice([2, 4]),
                  text_embed_dim=rng.choice([8, 16]),
                  max_text_len=rng.choice([8, 12]),
                  max_tokens=rng.choice([24, 32]),
                  embed_dim=rng.choice([8, 16]),
                  one_kv_head=rng.random() < 0.5)
        torch.manual_seed(case + 50)
        ref = reference_transformer.MoleculeTransformerSequenceInternaldim(
            **kw)
        ref.eval()
        seq = torch.rand(2, kw["max_text_len"]) * 2 - 1
        ids = torch.randint(1, kw["logits_dim"], (2, 6))
        with torch.no_grad():
            r = ref(sequences=seq, output=ids, cond_drop_prob=0.0).numpy()
        ours = MoleculeTransformerSequenceInternaldim(**kw)
        sj, ij = to_jax(seq), to_jax(ids).astype(jnp.int32)
        variables = import_params(ours, ref, sj, ij,
                                  key=jax.random.PRNGKey(1))
        o = ours.apply(variables, sj, ij, cond_drop_prob=0.0)
        assert np.allclose(o, r, atol=1e-4), (case, kw)
