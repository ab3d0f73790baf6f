"""The north-star parity test (BASELINE.json): per-denoise-step outputs of
the FULL 91M-parameter inverse QMDiffusion model, with weights imported from
a reference-layout torch checkpoint, must match the PyTorch reference within
1e-5 (measured: ~9e-7)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_flagship_denoise_step_parity(reference, reference_transformer):
    import torch
    import torch.nn as nn
    torch.manual_seed(0)
    md, mm = reference.diffusion, reference.modules

    class RefQMDiffusion(nn.Module):
        """Reference QMDiffusion assembly (generative.py:718-830 'cfg'
        branch, inverse notebook preset, vocab 22) — generative.py itself
        is not importable here (rdkit/tensorflow)."""

        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(1, 64)
            self.GELUact = nn.GELU()
            self.p_enc_1d = reference_transformer.PositionalEncoding1D(64)
            self.unet = mm.XUNet1d(
                type="cfg", in_channels=22, pre_transformer=2, channels=128,
                patch_size=1, multipliers=[1, 2, 4], factors=[4, 4],
                num_blocks=[3, 3], attentions=[4, 4], attention_heads=8,
                attention_features=64, attention_multiplier=2,
                attention_use_rel_pos=False, context_embedding_features=128,
                context_embedding_max_length=12)
            self.diffusion = md.XDiffusion_x(
                type="k", net=self.unet,
                sigma_distribution=md.LogNormalDistribution(-1.2, 1.2),
                sigma_data=0.1, dynamic_threshold=0.0)

    ref = RefQMDiffusion().eval()
    assert sum(p.numel() for p in ref.parameters()) == 90_965_554

    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.models import (QMDiffusion,
                                                         QMDiffusionBase,
                                                         from_config)
    from moleculediffusiontransformer_tpu.nn import state_dict_to_params
    model = from_config(QMDiffusion, cfg.inverse_diffusion_qm9(22))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 12)), jnp.zeros((1, 32, 22)),
                            jax.random.PRNGKey(0))
    variables = {"params": state_dict_to_params(ref.state_dict(),
                                                shapes["params"])}

    x = torch.randn(2, 22, 32)
    sig = torch.tensor([0.5, 1.5])
    props = torch.rand(2, 12) * 2 - 1
    with torch.no_grad():
        cx = ref.GELUact(ref.fc1(props.unsqueeze(2)))
        cx = torch.cat((cx, ref.p_enc_1d(cx)), 2)
        r = ref.diffusion.diffusion.denoise_fn(x, sigmas=sig,
                                               embedding=cx).numpy()

    emb = model.apply(variables, jnp.asarray(props.numpy()),
                      method=QMDiffusionBase.embed_conditioning)
    o = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                    jnp.asarray(sig.numpy()), emb, 1.0,
                    method=QMDiffusionBase.denoise)
    diff = float(np.abs(np.asarray(o).transpose(0, 2, 1) - r).max())
    assert diff < 1e-5, diff
