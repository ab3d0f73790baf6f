"""Low-level NN primitives, channels-last, TPU-native.

Everything here operates on ``(batch, length, channels)`` tensors — channels
ride the TPU lane dimension (128-wide) so convs and matmuls tile directly
onto the MXU without layout transposes.  The reference is channels-first
PyTorch (`/root/reference/MoleculeDiffusion/modules.py:32-122`); semantics
(padding arithmetic, eps, init distributions) are matched exactly so that
imported reference checkpoints reproduce outputs to ~1e-5, but the layout
and execution model are JAX/XLA-native.

Parameter naming: each module stores params under the same attribute names
as the reference's torch modules (``kernel``/``bias`` for convs & linears,
``tkernel`` for transposed convs, ``scale``/``bias`` for norms,
``embedding`` for embedding tables) so that a torch ``state_dict`` maps
mechanically onto our pytree (see `nn/torch_import.py`).

Init parity: torch's Conv1d/Linear default is kaiming-uniform(a=√5), i.e.
U(-1/√fan_in, 1/√fan_in) for both weight and bias; Embedding is N(0, 1).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def mm_precision(dtype: Dtype):
    """Matmul precision policy: fp32 compute must be true fp32 (the platform
    default is bf16-class MXU passes, ~1e-3 error — fails reference parity);
    bf16 compute keeps the fast default."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch ``nn.GELU()`` default.  jax.nn.gelu defaults
    to the tanh approximation, which breaks 1e-5 parity."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


class Dense(nn.Module):
    """Linear layer, torch-default init.  Param 'kernel' is (in, out)."""
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", _uniform_init(bound),
                            (in_features, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype,
                    precision=mm_precision(self.dtype))
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def conv1d_im2col(x: jax.Array, kernel: jax.Array, *, stride: int = 1,
                  pad_lo: int = 0, pad_hi: int = 0, dilation: int = 1,
                  dtype: Dtype = jnp.float32) -> jax.Array:
    """1-D convolution as im2col + one matmul.

    TPU-native lowering choice: for the tiny spatial extents of this
    framework (k <= 9, L <= 64) a single (b*L_out, k*Cin) x (k*Cin, Cout)
    matmul tiles straight onto the MXU, and — unlike
    ``lax.conv_general_dilated`` on some backends — inherits exact dot
    semantics (required for 1e-5 parity with the fp32 reference).

    x: (b, L, Cin); kernel: (k, Cin, Cout).
    """
    k, cin, cout = kernel.shape
    x = x.astype(dtype)
    if pad_lo or pad_hi:
        x = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    length = x.shape[1]
    span = (k - 1) * dilation + 1
    l_out = (length - span) // stride + 1
    if k == 1:
        patches = x[:, : (l_out - 1) * stride + 1 : stride]
    else:
        cols = [jax.lax.slice_in_dim(
            x, w * dilation, w * dilation + (l_out - 1) * stride + 1,
            stride, axis=1) for w in range(k)]
        patches = jnp.concatenate(cols, axis=-1)     # (b, L_out, k*Cin)
    w2d = kernel.reshape(k * cin, cout)   # w-major, matching the concat order
    return jnp.dot(patches, w2d.astype(dtype),
                   preferred_element_type=dtype, precision=mm_precision(dtype))


def conv1d_native(x: jax.Array, kernel: jax.Array, *, stride: int = 1,
                  pad_lo: int = 0, pad_hi: int = 0, dilation: int = 1,
                  dtype: Dtype = jnp.float32) -> jax.Array:
    """1-D convolution via ``lax.conv_general_dilated`` (XLA's native conv,
    NWC/WIO — no layout transposes).  Used for bf16 compute, where XLA's
    conv path avoids im2col's k-fold patch materialization in the
    BACKWARD (dL/dpatches + fold) — measured ~10-15% faster per wide
    conv's grad on v5e.  fp32 stays on :func:`conv1d_im2col` for exact
    dot-semantics parity (PERF.md round 3 conv-lowering A/B)."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(stride,),
        padding=[(pad_lo, pad_hi)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=dtype)


def conv1d(x: jax.Array, kernel: jax.Array, *, stride: int = 1,
           pad_lo: int = 0, pad_hi: int = 0, dilation: int = 1,
           dtype: Dtype = jnp.float32) -> jax.Array:
    """Lowering dispatch: im2col+matmul for fp32 (exact parity), XLA
    native conv for reduced-precision compute."""
    fn = conv1d_im2col if dtype == jnp.float32 else conv1d_native
    return fn(x, kernel, stride=stride, pad_lo=pad_lo, pad_hi=pad_hi,
              dilation=dilation, dtype=dtype)


class Conv1d(nn.Module):
    """1-D convolution over (b, L, C) with torch padding semantics.
    Param 'kernel' is (k, in, out); lowered via :func:`conv1d`."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound),
                            (self.kernel_size, in_features, self.features))
        y = conv1d(x, kernel, stride=self.stride,
                   pad_lo=self.padding, pad_hi=self.padding,
                   dilation=self.dilation, dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution matching torch ``ConvTranspose1d``:
    ``y = conv(dilate(x, stride), flip(W), pad = k-1-p .. k-1-p+out_pad)``.
    Param 'tkernel' is (k, in, out) (distinct name so torch import can
    distinguish it from plain conv kernels)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, length, in_features = x.shape
        # torch fan_in for ConvTranspose weight (in, out, k) is out * k
        fan_in = self.features * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("tkernel", _uniform_init(bound),
                            (self.kernel_size, in_features, self.features))
        pad_lo = self.kernel_size - 1 - self.padding
        pad_hi = pad_lo + self.output_padding
        if self.dtype != jnp.float32:
            # XLA native conv with lhs_dilation — never materializes the
            # stride-dilated (mostly-zero) input the im2col route pads
            # and re-reads k times (same dispatch rationale as `conv1d`)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                jnp.flip(kernel, axis=0).astype(self.dtype),
                window_strides=(1,), padding=[(pad_lo, pad_hi)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=self.dtype)
        else:
            if self.stride > 1:
                dilated = jnp.zeros(
                    (b, (length - 1) * self.stride + 1, in_features),
                    x.dtype)
                x = dilated.at[:, :: self.stride].set(x)
            y = conv1d_im2col(x, jnp.flip(kernel, axis=0), stride=1,
                              pad_lo=pad_lo, pad_hi=pad_hi,
                              dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class GroupNorm(nn.Module):
    """Group normalization over (b, L, C), stats in fp32, torch-exact
    (biased variance, contiguous channel groups, default eps 1e-5)."""
    num_groups: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, l, c = x.shape
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32).reshape(b, l, g, c // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        xn = xn.reshape(b, l, c)
        return (xn * scale + bias).astype(self.dtype)


class LayerNorm(nn.Module):
    """Layer norm over the last axis, fp32 stats, torch default eps 1e-5."""
    eps: float = 1e-5
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        out = xn * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,))
            out = out + bias
        return out.astype(self.dtype)


class Embed(nn.Module):
    """Embedding table, torch N(0,1) init.  Param 'embedding'."""
    num_embeddings: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param("embedding", nn.initializers.normal(stddev=1.0),
                           (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0).astype(self.dtype)


def patchify(x: jax.Array, patch_size: int) -> jax.Array:
    """(b, L*p, c) -> (b, L, c*p): channel index = c*p + within-patch offset,
    matching the reference's ``b c (l p) -> b (c p) l`` rearrange
    (`modules.py:230`)."""
    b, lp, c = x.shape
    p = patch_size
    x = x.reshape(b, lp // p, p, c)
    x = jnp.swapaxes(x, 2, 3)           # (b, L, c, p)
    return x.reshape(b, lp // p, c * p)


def unpatchify(x: jax.Array, patch_size: int) -> jax.Array:
    """(b, L, c*p) -> (b, L*p, c): inverse of :func:`patchify`
    (`modules.py:255`)."""
    b, l, cp = x.shape
    p = patch_size
    x = x.reshape(b, l, cp // p, p)
    x = jnp.swapaxes(x, 2, 3)           # (b, L, p, c)
    return x.reshape(b, l * p, cp // p)
