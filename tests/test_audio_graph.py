"""Stage-9 tests: DSP resampling parity vs torch reference, STFT roundtrip,
autoencoder shapes, Model1d family smoke (loss + sampling), graph analogs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.nn import (STFT, AutoEncoder1d,
                                                 Decoder1d, Encoder1d,
                                                 downsample, resample,
                                                 upsample)
from moleculediffusiontransformer_tpu.models import (
    AnalogDiffusionFull, AnalogDiffusionSparse, DiffusionAR1d, Model1d,
    sample_ar, sample_model1d)
from moleculediffusiontransformer_tpu.diffusion.distributions import (
    UniformDistribution)

TINY_UNET = dict(channels=16, multipliers=(1, 2), factors=(2,),
                 num_blocks=(1,), attentions=(0,), patch_size=2,
                 attention_heads=2, attention_features=8,
                 attention_multiplier=2)


def test_resample_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    x = torch.randn(2, 3, 32)
    xl = jnp.asarray(x.numpy().transpose(0, 2, 1))
    for fi, fo in ((2, 1), (1, 3), (4, 1), (1, 2)):
        ref = reference.utils.resample(x, fi, fo).numpy()
        ours = resample(xl, fi, fo)
        assert np.allclose(np.transpose(ours, (0, 2, 1)), ref, atol=2e-5), \
            (fi, fo)


def test_stft_encode_matches_torch(reference):
    import torch
    torch.manual_seed(0)
    st_t = reference.modules.STFT(num_fft=31, hop_length=8)
    st_o = STFT(num_fft=31, hop_length=8)
    w = torch.randn(2, 1, 64)
    a_t, b_t = st_t.encode(w)
    a_o, b_o = jax.jit(st_o.encode, backend="cpu")(
        jnp.asarray(w.numpy().transpose(0, 2, 1)))
    assert np.allclose(a_t.numpy(), np.asarray(a_o), atol=2e-5)
    # phase only compared where magnitude is non-negligible
    mag = a_t.numpy()
    mask = mag > 1e-4
    dphase = np.abs(b_t.numpy() - np.asarray(b_o))
    dphase = np.minimum(dphase, 2 * np.pi - dphase)
    assert dphase[mask].max() < 1e-3


def test_stft_roundtrip():
    """The reference's own istft crashes on modern torch (stacks real
    tensors where complex is required, `modules.py:1445-1455`) — verify
    ours by exact roundtrip instead (recorded deviation)."""
    st = STFT(num_fft=31, hop_length=8, length=64)
    x = np.random.RandomState(0).randn(2, 64, 2).astype(np.float32)
    a, b = jax.jit(st.encode, backend="cpu")(jnp.asarray(x))
    rec = jax.jit(st.decode, backend="cpu")(a, b)
    assert np.allclose(np.asarray(rec), x, atol=1e-5)
    pair = jax.jit(st.encode1d, backend="cpu")(jnp.asarray(x))
    rec2 = jax.jit(st.decode1d, backend="cpu")(pair)
    assert np.allclose(np.asarray(rec2), x, atol=1e-5)


def test_autoencoder_shapes():
    ae = AutoEncoder1d(in_channels=4, channels=8, multipliers=(1, 2),
                       factors=(2,), num_blocks=(1,), patch_size=2,
                       resnet_groups=4, bottleneck_channels=6)
    x = jnp.ones((2, 16, 4))
    variables = ae.init(jax.random.PRNGKey(0), x)
    y, info = ae.apply(variables, x, with_info=True)
    assert y.shape == x.shape
    assert info["latent"].shape == (2, 4, 6)      # /patch2 /factor2
    z = ae.apply(variables, x, method=AutoEncoder1d.encode)
    assert z.shape == (2, 4, 6)


def test_model1d_loss_and_sample():
    model = Model1d(in_channels=4, diffusion_type="v",
                    diffusion_sigma_distribution=UniformDistribution(),
                    **TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))
    key = jax.random.PRNGKey(0)
    variables = model.init(key, x, key)
    loss = model.apply(variables, x, key)
    assert np.isfinite(float(loss))
    noise = jax.random.normal(key, (2, 16, 4))
    out = sample_model1d(model, variables, noise, key, num_steps=4,
                         sampler="v", schedule="linear", clamp=True)
    assert out.shape == (2, 16, 4)
    assert np.all(np.abs(np.asarray(out)) <= 1 + 1e-6)


def test_diffusion_ar1d():
    model = DiffusionAR1d(in_channels=2, chunk_length=8, dropout=0.1,
                          context_channels=(2,), diffusion_type="v",
                          diffusion_sigma_distribution=UniformDistribution(),
                          **TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 2))
    key = jax.random.PRNGKey(0)
    variables = model.init(key, x, key)
    loss = model.apply(variables, x, key)
    assert np.isfinite(float(loss))
    noise = jax.random.normal(key, (2, 16, 2))
    out = sample_ar(model, variables, noise, key, num_steps=3, sampler="v",
                    schedule="linear")
    assert out.shape == (2, 16, 2)


def test_analog_diffusion_sparse_and_full():
    key = jax.random.PRNGKey(0)
    for cls, pred_dim in ((AnalogDiffusionSparse, 3),
                          (AnalogDiffusionFull, 3 + 16)):
        model = cls(max_length=16, channels=16, pred_dim=pred_dim,
                    text_embed_dim=16, embed_dim_position=8,
                    context_embedding_max_length=12, multipliers=(1, 2),
                    factors=(2,), num_blocks=(1,), attentions=(1,),
                    attention_heads=2, attention_features=8, patch_size=1,
                    predict_neighbors=(cls is AnalogDiffusionFull),
                    max_neighbors=4)
        seq = jnp.linspace(-1, 1, 2 * 12).reshape(2, 12)
        packed = jax.random.normal(key, (2, 10, 4 + 16))
        variables = model.init(key, seq, packed, key)
        loss = model.apply(variables, seq, packed, key)
        assert np.isfinite(float(loss)), cls.__name__


def test_model1d_denoise_matches_torch(reference):
    """Model1d with the v-objective: our denoise matches the reference's
    diffusion.denoise_fn with imported weights (audio-lineage assembly)."""
    import torch
    torch.manual_seed(0)
    from moleculediffusiontransformer_tpu.nn import state_dict_to_params
    ref = reference.model.Model1d(
        in_channels=4, channels=16, multipliers=[1, 2], factors=[2],
        num_blocks=[1], attentions=[0], patch_size=2, resnet_groups=8,
        diffusion_type="v",
        diffusion_sigma_distribution=reference.diffusion.UniformDistribution())
    ref.eval()
    from moleculediffusiontransformer_tpu.diffusion.distributions import (
        UniformDistribution)
    ours = Model1d(in_channels=4, channels=16, multipliers=(1, 2),
                   factors=(2,), num_blocks=(1,), attentions=(0,),
                   patch_size=2, resnet_groups=8, diffusion_type="v",
                   diffusion_sigma_distribution=UniformDistribution())
    x = torch.randn(2, 4, 16)
    sigmas = torch.tensor([0.3, 0.7])
    with torch.no_grad():
        r = ref.diffusion.diffusion.denoise_fn(x, sigmas=sigmas).numpy()
    xl = jnp.asarray(x.numpy().transpose(0, 2, 1))
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(ours.init, key, xl, key)
    variables = {"params": state_dict_to_params(ref.state_dict(),
                                                shapes["params"])}
    o = ours.apply(variables, xl, jnp.asarray(sigmas.numpy()),
                   method=Model1d.denoise)
    assert np.allclose(np.transpose(np.asarray(o), (0, 2, 1)), r, atol=3e-5)


# ------------------------------------------------- graph-analog goldens ----

def _graph_conditioning_ref(ref, seq):
    """The reference conditioning head (`graphmodel.py:330-347`), run
    deterministically outside its loss-drawing forward."""
    import torch
    with torch.no_grad():
        cx = ref.GELUact(ref.fc1(seq.unsqueeze(2)))
        return torch.cat((cx, ref.p_enc_1d(cx)), 2)


def test_graph_sparse_denoise_matches_torch(reference):
    """AnalogDiffusionSparse: our conditioning + preconditioned denoise
    match the reference's (`graphmodel.py:225-389`) with imported weights —
    the graph analogs' equivalent of the flagship per-step parity test."""
    import torch
    torch.manual_seed(11)
    from moleculediffusiontransformer_tpu.models import QMDiffusionBase
    from moleculediffusiontransformer_tpu.nn import state_dict_to_params
    ref = reference.graphmodel.AnalogDiffusionSparse(
        max_length=128, channels=16, pred_dim=3,
        context_embedding_max_length=12, text_embed_dim=32,
        embed_dim_position=8).eval()
    ours = AnalogDiffusionSparse(
        max_length=128, channels=16, pred_dim=3,
        context_embedding_max_length=12, text_embed_dim=32,
        embed_dim_position=8)

    seq = torch.rand(2, 12) * 2 - 1
    x = torch.randn(2, 3, 128)
    sig = torch.tensor([0.4, 1.3])
    cx = _graph_conditioning_ref(ref, seq)
    with torch.no_grad():
        r = ref.diffusion.diffusion.denoise_fn(x, sigmas=sig,
                                               embedding=cx).numpy()

    key = jax.random.PRNGKey(0)
    seq_j = jnp.asarray(seq.numpy())
    packed = jnp.zeros((2, 20, 4))
    shapes = jax.eval_shape(ours.init, key, seq_j, packed, key)
    variables = {"params": state_dict_to_params(ref.state_dict(),
                                                shapes["params"])}
    emb = ours.apply(variables, seq_j,
                     method=QMDiffusionBase.embed_conditioning)
    np.testing.assert_allclose(np.asarray(emb), cx.numpy(), atol=2e-5)
    o = ours.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                   jnp.asarray(sig.numpy()), emb, 1.0,
                   method=QMDiffusionBase.denoise)
    np.testing.assert_allclose(np.transpose(np.asarray(o), (0, 2, 1)), r,
                               atol=3e-5)


def _graph_loss_golden(reference, ref, ours, out_t, seq, sigmas_np):
    """Drive the reference's REAL forward (packing included) with pinned
    sigmas/noise, and our pack_target + objective.loss with the same."""
    import torch
    rng = np.random.RandomState(7)
    with torch.no_grad():
        cx = _graph_conditioning_ref(ref, seq)  # only to size the noise
    del cx
    # pin the reference's randomness: fixed sigmas, fixed noise
    ref.diffusion.diffusion.sigma_distribution = (
        lambda num_samples, device: torch.tensor(sigmas_np))
    packed_j = jnp.asarray(out_t.numpy().transpose(0, 2, 1))
    target_j = ours.apply({"params": {}}, packed_j,
                          method=type(ours).pack_target)
    noise_np = rng.randn(*[int(d) for d in
                           np.asarray(target_j).shape]).astype(np.float32)
    noise_t = torch.tensor(noise_np.transpose(0, 2, 1))
    orig = torch.randn_like
    torch.randn_like = lambda t: noise_t
    try:
        with torch.no_grad():
            theirs = float(ref(seq, out_t))
    finally:
        torch.randn_like = orig

    key = jax.random.PRNGKey(0)
    seq_j = jnp.asarray(seq.numpy())
    shapes = jax.eval_shape(ours.init, key, seq_j, packed_j, key)
    from moleculediffusiontransformer_tpu.nn import state_dict_to_params
    variables = {"params": state_dict_to_params(ref.state_dict(),
                                                shapes["params"])}

    def loss_with(mdl, seq_a, packed_a, sig_a, noise_a):
        target = mdl.pack_target(packed_a)
        emb = mdl.embed_conditioning(seq_a)
        net = lambda xn, t: mdl.unet(xn, t, embedding=emb)
        return mdl.objective.loss(net, target, sig_a, noise_a)

    got = float(ours.apply(variables, seq_j, packed_j,
                           jnp.asarray(sigmas_np), jnp.asarray(noise_np),
                           method=loss_with))
    assert abs(got - theirs) < 1e-4 * max(1.0, abs(theirs)), (got, theirs)


def test_graph_sparse_loss_matches_torch(reference):
    """End-to-end Sparse LOSS golden through the reference's real forward
    (incl. its pad_sequence packing, `graphmodel.py:316-349`)."""
    import torch
    torch.manual_seed(12)
    # reference bug: Sparse.forward reads a free global `max_neighbors`
    # unconditionally (`graphmodel.py:320`) — inject it to run the oracle.
    if not hasattr(reference.graphmodel, "max_neighbors"):
        reference.graphmodel.max_neighbors = 12
    ref = reference.graphmodel.AnalogDiffusionSparse(
        max_length=128, channels=16, pred_dim=3,
        context_embedding_max_length=12, text_embed_dim=32,
        embed_dim_position=8).eval()
    ours = AnalogDiffusionSparse(
        max_length=128, channels=16, pred_dim=3,
        context_embedding_max_length=12, text_embed_dim=32,
        embed_dim_position=8)
    out_t = torch.randn(2, 4, 20)          # node-number row + xyz, 20 nodes
    seq = torch.rand(2, 12) * 2 - 1
    _graph_loss_golden(reference, ref, ours, out_t, seq,
                       np.array([0.3, 0.9], np.float32))


def test_graph_full_loss_matches_torch(reference):
    """End-to-end Full LOSS golden: cfg branch num_blocks (3,3)
    (`graphmodel.py:436-440`) and the NO-length-pad xyz+adjacency packing
    (`graphmodel.py:497-513`) vs the reference's real forward."""
    import torch
    torch.manual_seed(13)
    ref = reference.graphmodel.AnalogDiffusionFull(
        max_length=16, channels=16, pred_dim=3 + 16,
        context_embedding_max_length=12, text_embed_dim=32,
        embed_dim_position=8).eval()
    ours = AnalogDiffusionFull(
        max_length=16, channels=16, pred_dim=3 + 16,
        context_embedding_max_length=12, text_embed_dim=32,
        embed_dim_position=8)
    out_t = torch.randn(2, 4 + 16, 64)     # rows: node#, xyz, 16 adjacency
    seq = torch.rand(2, 12) * 2 - 1
    _graph_loss_golden(reference, ref, ours, out_t, seq,
                       np.array([0.5, 1.1], np.float32))
