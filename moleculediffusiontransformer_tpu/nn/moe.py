"""Mixture-of-Experts feed-forward (TPU-native EXTENSION, beyond reference).

The reference model zoo (`transformer.py:4578-4790`) has only dense
feed-forwards.  This module adds a GShard/Switch-style sparsely-activated
FF so the framework's scale-up story covers expert parallelism ("ep")
alongside dp/tp/sp/pp/fsdp (`parallel/ep.py`): experts live STACKED in a
single (E, ...) parameter that shards over a mesh's 'expert' axis, and the
whole dispatch/combine is expressed as einsums over static shapes — the
canonical TPU formulation (GShard, Switch Transformer) where XLA lowers
the token shuffle to all-to-all collectives over ICI instead of the
scatter/gather host loops a CUDA implementation would use.

Semantics (documented, tested in `tests/test_ep.py`):

* router: bias-free linear (dim -> E), probabilities softmax'd in fp32;
  top-k experts per token, gates renormalized over the selected k.
* capacity: each expert processes at most
  ``C = ceil(T * k * capacity_factor / E)`` tokens per batch (T = b*n,
  static).  Slot-0 picks of ALL tokens beat slot-1 picks (GShard
  priority); within a slot, earlier tokens win.  Tokens over capacity are
  DROPPED from that expert — their contribution is exactly zero, so with
  the usual residual (`x + moe(x)`) they pass through unchanged.
* load-balance auxiliary loss (Switch eq. 4):
  ``E * sum_e f_e * p_e`` with f_e the fraction of tokens whose TOP-1
  pick is e and p_e the mean router probability of e.  Sown into the
  ``"aux_loss"`` collection — a no-op unless the caller passes
  ``mutable=["aux_loss"]``, so plain inference/CE paths are unaffected.

Numerics follow the house rules: routing statistics (softmax, cumsums,
combine) in fp32, expert GEMMs in the module dtype with
``mm_precision`` pinning true-fp32 when dtype is fp32, exact erf GELU.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .primitives import Dtype, gelu, mm_precision


def _torch_linear_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def moe_capacity(num_tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert token capacity (python int — shapes stay static)."""
    return max(1, int(math.ceil(
        num_tokens * top_k * capacity_factor / num_experts)))


class MoEFeedForward(nn.Module):
    """Sparsely-activated FF: LN-free core (callers wrap it like the dense
    FF they replace), stacked-expert params ready for P('expert') sharding.

    Per expert the transform matches the dense GPT feed-forward's GEMM
    core ``Linear(dim->hidden, no bias) -> GELU -> Linear(hidden->dim,
    no bias)``; ``hidden = dim * mult``.
    """
    dim: int
    num_experts: int
    mult: int = 4
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert 1 <= self.top_k <= self.num_experts
        b, n, d = x.shape
        assert d == self.dim, (x.shape, self.dim)
        e, k = self.num_experts, self.top_k
        hidden = int(self.dim * self.mult)
        t = b * n
        cap = moe_capacity(t, e, k, self.capacity_factor)

        router = self.param("router", _torch_linear_init(d), (d, e))
        w_in = self.param("w_in", _torch_linear_init(d), (e, d, hidden))
        w_out = self.param("w_out", _torch_linear_init(hidden),
                           (e, hidden, d))

        # ---- routing: fp32 throughout --------------------------------
        xt = x.reshape(t, d)
        logits = jnp.dot(xt.astype(jnp.float32), router,
                         precision=jax.lax.Precision.HIGHEST)     # (t, e)
        probs = jax.nn.softmax(logits, axis=-1)
        gate_vals, gate_idx = jax.lax.top_k(probs, k)             # (t, k)
        gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)

        # ---- capacity assignment: slot-major priority (GShard) -------
        dispatch = jnp.zeros((t, e, cap), jnp.float32)            # one-hot
        combine = jnp.zeros((t, e, cap), jnp.float32)             # gated
        used = jnp.zeros((e,), jnp.float32)   # slots consumed by prior k
        for j in range(k):
            m = jax.nn.one_hot(gate_idx[:, j], e, dtype=jnp.float32)
            pos = jnp.cumsum(m, axis=0) - 1.0 + used[None, :]     # (t, e)
            used = used + jnp.sum(m, axis=0)
            keep = m * (pos < cap)                                # (t, e)
            slot = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                  dtype=jnp.float32) * keep[..., None]
            dispatch = dispatch + slot
            combine = combine + slot * gate_vals[:, j, None, None]

        # ---- load-balance aux loss (Switch eq. 4, top-1 fractions) ---
        frac = jnp.mean(jax.nn.one_hot(gate_idx[:, 0], e,
                                       dtype=jnp.float32), axis=0)
        mean_prob = jnp.mean(probs, axis=0)
        self.sow("aux_loss", "load_balance",
                 e * jnp.sum(frac * mean_prob))

        # ---- dispatch -> expert GEMMs -> combine ----------------------
        prec = mm_precision(self.dtype)
        disp = jnp.einsum("tec,td->ecd", dispatch.astype(self.dtype),
                          xt.astype(self.dtype), precision=prec)
        h = gelu(jnp.einsum("ecd,edh->ech", disp,
                            w_in.astype(self.dtype), precision=prec))
        y_e = jnp.einsum("ech,ehd->ecd", h, w_out.astype(self.dtype),
                         precision=prec)
        y = jnp.einsum("tec,ecd->td", combine, y_e.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(b, n, d).astype(self.dtype)
