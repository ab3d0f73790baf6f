"""Pallas TPU kernels (with jnp fallbacks for non-TPU backends)."""
from .attention import attention, packed_attention
from .flash_attention import flash_attention
from .transformer_fusion import (enable_fusion, fused, fusion_enabled,
                                 transformer1d_fused)
