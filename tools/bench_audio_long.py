"""End-to-end long-sequence audio benchmark: Model1d v-diffusion train step
at waveform lengths where attention runs at L >= 1024, flash vs the XLA
one-shot composition (``MDT_FLASH=0``).

The QM9 molecule tracks never hit this regime; the audio-lineage
assemblies (reference `model.py:302-320`) default to 2**15-sample
waveforms.  With patch_size=2 and factors (4, 4), a 32768-sample input
runs attention at 4096 and 1024 tokens — the XLA path materializes
(b*h, 4096, 4096) fp32 scores (~1 GB per tensor at batch 2, heads 8),
the flash path streams them.

Each (length, impl) cell runs in a THROWAWAY SUBPROCESS (an OOM kills
the child, not the tunnel worker — CLAUDE.md round-3 note 3).
Methodology per PERF.md: multi-iteration `lax.scan`, device-side scalar
transfer for sync, min of reps.

Usage:  python tools/bench_audio_long.py [--lengths 8192,32768] [--batch 2]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
length, impl, iters, reps, batch = (int(sys.argv[1]), sys.argv[2],
                                    int(sys.argv[3]), int(sys.argv[4]),
                                    int(sys.argv[5]))
remat = len(sys.argv) > 6 and sys.argv[6] == "remat"
os.environ["MDT_FLASH"] = "1" if impl == "flash" else "0"
import jax, jax.numpy as jnp
from moleculediffusiontransformer_tpu.diffusion import UniformDistribution
from moleculediffusiontransformer_tpu.models import Model1d

model = Model1d(
    in_channels=2, diffusion_type="v",
    diffusion_sigma_distribution=UniformDistribution(),
    channels=64, patch_size=2, multipliers=(1, 2, 4), factors=(4, 4),
    num_blocks=(2, 2), attentions=(0, 1, 1), attention_heads=8,
    attention_features=64, attention_multiplier=2, dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (batch, length, 2), jnp.bfloat16)
variables = jax.jit(model.init)(key, x, key)
params = variables["params"]
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))

def loss_fn(p, x, key):
    return model.apply({"params": p}, x, key).astype(jnp.float32)

if remat:
    # rematerialized forward: at 2**15 samples the full-graph VJP's
    # residents blow XLA's VMEM stack at compile (the trainer's
    # remat=True knob, applied here to the raw grad)
    loss_fn = jax.checkpoint(loss_fn)
grad_fn = jax.grad(loss_fn)

@jax.jit
def run(params, x, key):
    def body(params, i):
        g = grad_fn(params, x, jax.random.fold_in(key, i))
        # tiny SGD step so iterations serialize through params
        # (we are timing fwd+bwd, not optax)
        params = jax.tree_util.tree_map(
            lambda p, gg: p - 1e-9 * gg.astype(p.dtype), params, g)
        return params, ()
    params, _ = jax.lax.scan(body, params, jnp.arange(iters))
    return jnp.sum(jax.tree_util.tree_leaves(params)[0].astype(jnp.float32))

float(run(params, x, key))                     # compile + warm
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter()
    float(run(params, x, key))                 # scalar transfer = sync
    best = min(best, time.perf_counter() - t0)
per_step_ms = best / iters * 1e3
print(json.dumps({"length": length, "impl": impl, "batch": batch,
                  "params": int(n_params), "per_step_ms": per_step_ms,
                  "samples_per_s": batch / (per_step_ms / 1e3)}))
"""


def run_cell(length: int, impl: str, iters: int, reps: int, batch: int,
             remat: bool = False):
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(length), impl, str(iters),
         str(reps), str(batch)] + (["remat"] if remat else []),
        capture_output=True, text=True, timeout=2400, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    # last stderr line is often JAX's traceback-filtering notice; report
    # the tail so the actual exception text survives
    tail = "\n".join(proc.stderr.strip().splitlines()[-8:]) or "no output"
    return {"length": length, "impl": impl, "error": tail[:1200]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="8192,32768")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the forward (jax.checkpoint) — "
                    "required at 2**15 samples, where the full-graph VJP "
                    "OOMs XLA's VMEM stack at compile")
    args = ap.parse_args()
    for length in [int(x) for x in args.lengths.split(",")]:
        for impl in ("flash", "xla"):
            res = run_cell(length, impl, args.iters, args.reps, args.batch,
                           remat=args.remat)
            res["remat"] = args.remat
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
