"""Benchmark the blockwise flash-attention kernels (ops/flash_attention.py)
on the real TPU chip at the audio-lineage sequence lengths.

The QM9 molecule tracks (L = 4-64) never route here — this measures the
long-L regime the audio assemblies inherit from archinetai
(reference `model.py:302-320`: 2**15-sample defaults), where the XLA
one-shot composition must materialize a (bh, n, n) fp32 score tensor.

Each (length, impl, mode) cell runs in a THROWAWAY SUBPROCESS so an OOM
at the XLA-composition cells kills the child, not the tunnel worker
(CLAUDE.md round-3 note 3).  Methodology per PERF.md: >=many-iteration
`lax.scan` to amortize the ~33 ms tunnel RPC, device-side `jnp.sum` +
scalar transfer for sync (block_until_ready returns early on the tunnel),
min of reps.

Usage:  python tools/bench_flash_attention.py [--lengths 2048,8192,32768]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp

length, impl, mode, iters, reps = (int(sys.argv[1]), sys.argv[2],
                                   sys.argv[3], int(sys.argv[4]),
                                   int(sys.argv[5]))
from moleculediffusiontransformer_tpu.ops.flash_attention import (
    _flash_jnp, flash_attention)

BH, D = 8, 64          # 8 heads (audio UNet attention_heads=8), d=64
scale = D ** -0.5
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (BH, length, D), jnp.bfloat16)
k = jax.random.normal(kk, (BH, length, D), jnp.bfloat16)
v = jax.random.normal(kv, (BH, length, D), jnp.bfloat16)

def attn(q, k, v):
    if impl == "flash":
        return flash_attention(q, k, v, scale=scale)
    return _flash_jnp(q, k, v, scale)

if mode == "fwd":
    def body(carry, _):
        q, k, v = carry
        o = attn(q, k, v)
        # feed the output back as q so iterations are serialized
        return (o, k, v), ()
else:
    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)
    grad = jax.grad(loss, argnums=(0, 1, 2))
    def body(carry, _):
        q, k, v = carry
        dq, dk, dv = grad(q, k, v)
        return (dq.astype(q.dtype), dk.astype(k.dtype),
                dv.astype(v.dtype)), ()

@jax.jit
def run(q, k, v):
    (q, k, v), _ = jax.lax.scan(body, (q, k, v), None, length=iters)
    return jnp.sum(q.astype(jnp.float32))

float(run(q, k, v))                     # compile + warm
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    s = float(run(q, k, v))             # scalar transfer = real sync
    best = min(best, time.perf_counter() - t0)
per_call_us = best / iters * 1e6
# 2 GEMMs of 2*n*m*d flops each per head-batch (fwd); bwd ~2.5x more
flops = 2 * 2 * BH * length * length * D * (1 if mode == "fwd" else 3.5)
print(json.dumps({"length": length, "impl": impl, "mode": mode,
                  "per_call_us": per_call_us,
                  "tflops": flops / per_call_us / 1e6}))
"""


def run_cell(length: int, impl: str, mode: str, iters: int, reps: int):
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(length), impl, mode,
         str(iters), str(reps)],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    return {"length": length, "impl": impl, "mode": mode, "error":
            (proc.stderr.strip().splitlines() or ["no output"])[-1][:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="2048,8192,32768")
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    for length in [int(x) for x in args.lengths.split(",")]:
        # 500-iter scans amortize the ~33 ms tunnel RPC (PERF.md); the big
        # lengths are ms-scale per call and need fewer
        iters = args.iters if length < 16384 else max(20, args.iters // 5)
        for impl in ("flash", "xla"):
            for mode in ("fwd", "grad"):
                res = run_cell(length, impl, mode, iters, args.reps)
                print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
