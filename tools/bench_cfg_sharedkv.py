"""Long-context CFG shared-KV A/B (PERF.md round-3 thread closure).

Round 3 measured `MDT_CFG_SHAREDKV` NEUTRAL at ctx_len=12 (the QM9
presets) and left it off by default, claiming the win regime is 64-256
token text conditioning.  This measures that regime directly: the
reference's own conditional audio preset (`AudioDiffusionConditional`,
reference model.py:365-392 — 768-feature embeddings) sampled with CFG
scale 5.0 at ctx_len in {12, 64, 128, 256}, shared-KV off vs on, fused
Transformer1d path (the kernel the flag gates).

Each (ctx_len, sharedkv) cell runs in a THROWAWAY SUBPROCESS (env flags
bind at import; OOM kills the child, not the tunnel worker).  Methodology
per PERF.md: whole sampler is one jitted lax.scan, device-side scalar
sync, min of reps.  One JSON line per cell + a final summary line.

Usage: python tools/bench_cfg_sharedkv.py [--ctx 12,64,128,256] [--batch 2]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
ctx_len, sharedkv, batch, steps, reps = (int(sys.argv[1]), sys.argv[2],
                                         int(sys.argv[3]), int(sys.argv[4]),
                                         int(sys.argv[5]))
import os
os.environ["MDT_CFG_SHAREDKV"] = "1" if sharedkv == "on" else "0"
os.environ["MDT_FUSION"] = "1"
import jax, jax.numpy as jnp
from moleculediffusiontransformer_tpu.models import (
    AudioDiffusionConditional, sample_model1d)

LENGTH = 2 ** 15
model = AudioDiffusionConditional(
    embedding_features=768, embedding_max_length=ctx_len, in_channels=2,
    dtype=jnp.bfloat16)
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
x = jax.random.normal(k1, (batch, LENGTH, 2))
emb = jax.random.normal(k2, (batch, ctx_len, 768))
variables = jax.jit(model.init)(k3, x[:1], k3, embedding=emb[:1])

def run(key):
    noise = jax.random.normal(key, x.shape)
    return sample_model1d(model, variables, noise, key, num_steps=steps,
                          embedding=emb, embedding_scale=5.0)

def sync(v):
    s = float(jax.jit(jnp.sum)(v))
    assert s == s, s
    return s

sync(run(jax.random.PRNGKey(1)))          # warmup/compile
best = float("inf")
for i in range(reps):
    t0 = time.perf_counter()
    sync(run(jax.random.PRNGKey(2 + i)))
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"ctx_len": ctx_len, "sharedkv": sharedkv,
                  "seconds": round(best, 4),
                  "samples_per_s": round(batch / best, 4)}), flush=True)
"""


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ctx", default="12,64,128,256")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--timeout", type=int, default=1800)
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    results = {}
    for ctx_len in (int(c) for c in args.ctx.split(",")):
        for mode in ("off", "on"):
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, str(ctx_len), mode,
                 str(args.batch), str(args.steps), str(args.reps)],
                capture_output=True, text=True, timeout=args.timeout,
                env=env, cwd=repo)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("{")]
            if proc.returncode != 0 or not line:
                print(json.dumps({"ctx_len": ctx_len, "sharedkv": mode,
                                  "error": proc.stderr[-400:]}), flush=True)
                continue
            cell = json.loads(line[-1])
            results[(ctx_len, mode)] = cell["samples_per_s"]
            print(line[-1], flush=True)

    summary = {}
    for ctx_len in sorted({c for c, _ in results}):
        off, on = results.get((ctx_len, "off")), results.get((ctx_len, "on"))
        if off and on:
            summary[str(ctx_len)] = round(on / off, 4)
    print(json.dumps({"metric": "cfg_sharedkv_speedup_by_ctx",
                      "value": summary, "unit": "x (on/off)"}), flush=True)


if __name__ == "__main__":
    main()
