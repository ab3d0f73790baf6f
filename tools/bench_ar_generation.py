"""AR CFG generation throughput sweep — the PERF.md headline's 4th row.

The inverse transformer's KV-cached decode (`models.generate_sequence`:
one jitted scan, batched CFG) is DISPATCH-BOUND per token step at batch
256 (~57 µs per layer-substep, PERF.md block-diag section), so tokens/s
should scale nearly linearly with batch until the micro-GEMMs fill the
MXU.  This sweep measures that curve and pins the throughput-optimal
batch for the headline row (124k tokens/s at batch 256 as of round 3).

Model: the `Inverse_Transformer.ipynb` notebook preset
(`core/config.py::inverse_transformer_qm9` — dim 128, depth 12, heads 8,
dim_head 16, logits_dim 24; 2,407,712 params), generating 63 tokens like
the notebook's sample loop (reference `transformer.py:786-838`).
Torch-CPU baseline at the same architecture: 49.8 tokens/s (batch 16,
no KV cache — the reference re-runs the full prefix per token).

  python tools/bench_ar_generation.py [--batches 256,512,1024]

One JSON line per batch.  TPU jobs must be serialized (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TORCH_CPU_TOKENS_PER_S = 49.8  # measured round 1, batch 16, no KV cache


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batches", default="256,512,1024",
                        help="comma-separated batch sizes to sweep")
    parser.add_argument("--tokens", type=int, default=63)
    args = parser.parse_args()

    import bench
    bench._require_compute()
    bench._require_device()
    import jax
    import jax.numpy as jnp
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence, generate_sequence)

    model = MoleculeTransformerSequence(
        dim=128, depth=12, logits_dim=24, dim_head=16, heads=8,
        text_embed_dim=16, max_text_len=12)
    key = jax.random.PRNGKey(0)
    init_y = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
    init_ids = jnp.zeros((2, 4), jnp.int32)
    variables = model.init({"params": key}, init_y, init_ids, key=key)

    for batch in (int(b) for b in args.batches.split(",")):
        props = jax.random.uniform(jax.random.PRNGKey(1), (batch, 12),
                                   minval=-1.0, maxval=1.0)
        start = jnp.ones((batch, 1), jnp.int32)

        def run(k):
            return generate_sequence(model, variables, props, start, k,
                                     tokens_to_generate=args.tokens)

        bench._sync(run(jax.random.PRNGKey(2)))  # warmup/compile
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            bench._sync(run(jax.random.PRNGKey(3 + i)))
            best = min(best, time.perf_counter() - t0)
        tokens_per_s = batch * args.tokens / best
        print(json.dumps({
            "metric": "inverse_transformer_ar_cfg_generation",
            "batch": batch,
            "tokens": args.tokens,
            "value": round(tokens_per_s, 1),
            "unit": "tokens/s",
            "seconds": round(best, 4),
            "vs_baseline": round(tokens_per_s / TORCH_CPU_TOKENS_PER_S, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
