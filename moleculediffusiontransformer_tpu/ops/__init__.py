"""Pallas TPU kernels (with jnp fallbacks for non-TPU backends)."""
from .attention import attention, packed_attention
