"""Neural-network layer: channels-last Flax modules for the 1-D UNet zoo.

Re-design of reference `modules.py` — see SURVEY.md §2.3.
"""
from .primitives import (Conv1d, ConvTranspose1d, Dense, Embed, GroupNorm,
                         LayerNorm, gelu, patchify, silu, unpatchify)
from .embeddings import (FixedEmbedding, LearnedPositionalEmbedding,
                         NumberEmbedder, TimePositionalEmbedding,
                         positional_encoding_1d, positional_encoding_2d,
                         positional_encoding_3d, sinusoidal_embedding,
                         time_positional_embedding)
from .blocks import (ConditionedSequential, ConvBlock1d,
                     MappingToScaleShift, Patcher, ResnetBlock1d, Unpatcher,
                     downsample1d, upsample1d)
from .attention import (Attention, AttentionBase, RelativePositionBias,
                        Transformer1d, TransformerBlock, feed_forward)
from .unet import (BottleneckBlock1d, DownsampleBlock1d, UNet1d, UNetAll1d,
                   UNetCFG1d, UNetNCCA1d, UpsampleBlock1d, XUNet1d,
                   cfg_forward)
from .torch_import import (flax_path_to_torch_key, params_to_state_dict,
                           state_dict_to_params, torch_key_to_path)
from .transformer_blocks import (AttentionQKV, CausalDSConv, FeedForwardCNN,
                                 GCNLayer, GLU, GraphConvLayers, LNGamma,
                                 MQAttention, RelPosBias2d, gumbel_sample,
                                 prob_mask_like, top_k_filter)
from .moe import MoEFeedForward, moe_capacity
from .dsp import downsample, resample, upsample
from .stft import STFT
from .autoencoder import (AutoEncoder1d, Decoder1d, Encoder1d,
                          TanhBottleneck)
from .text import T5Embedder
