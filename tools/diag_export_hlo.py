"""Compare the optimized HLO of the live jit path vs the exported path.

tools/diag_export_overhead.py showed the exported sampler compiles to a
~50%-slower executable than the live ``jax.jit(sample)`` trace (256 vs
383 mol/s), independent of how it's dispatched. This dumps both
OPTIMIZED HLO modules from the same backend (compile only, no execute)
and prints op histograms + dot/while/fusion stats so the structural
difference is visible.

Usage: python tools/diag_export_hlo.py [outdir]
"""
from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def histogram(hlo: str) -> collections.Counter:
    ops = collections.Counter()
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\],{}#/ ]+?\s+([\w\-]+)\(", hlo, re.M):
        ops[m.group(1)] += 1
    return ops


def main():
    import bench
    bench._require_device()
    bench._require_compute()

    from moleculediffusiontransformer_tpu.design.export import export_sampler
    from moleculediffusiontransformer_tpu.models.qm_diffusion import sample

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/diag_hlo"
    os.makedirs(outdir, exist_ok=True)
    BATCH, STEPS = 512, 64
    model = bench._model()
    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
    X = jnp.zeros((2, model.max_length, model.pred_dim))
    variables = jax.jit(model.init)(key, y, X, key)
    props = jax.random.uniform(key, (BATCH, 12), minval=-1.0, maxval=1.0)

    from moleculediffusiontransformer_tpu.ops import transformer_fusion

    def make_fn(fuse: bool):
        def fn(variables, sequences, key):
            with transformer_fusion.fused(fuse):
                return sample(model, variables, sequences, key,
                              num_steps=STEPS, cond_scale=2.0)
        return fn

    compiled = {}
    for fuse in (True, False):
        tag = "fused" if fuse else "unfused"
        compiled[f"live_{tag}"] = (jax.jit(make_fn(fuse))
                                   .lower(variables, props, key).compile())
        exported = export_sampler(model, variables, batch=BATCH,
                                  num_steps=STEPS, cond_scale=2.0,
                                  allow_tpu_custom_calls=fuse)
        compiled[f"export_{tag}"] = (jax.jit(exported.call)
                                     .lower(variables, props, key).compile())

    hists = {}
    for name, c in compiled.items():
        hlo = c.as_text()
        with open(f"{outdir}/{name}.hlo", "w") as f:
            f.write(hlo)
        hists[name] = histogram(hlo)
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(name, "flops:", ca.get("flops"), "bytes:",
              ca.get("bytes accessed"), flush=True)

    names = list(compiled)
    keys = sorted(set().union(*hists.values()),
                  key=lambda k: -sum(h[k] for h in hists.values()))
    print(f"{'op':24s} " + " ".join(f"{n:>14s}" for n in names))
    for k in keys:
        vals = [hists[n][k] for n in names]
        if len(set(vals)) > 1 or vals[0] > 20:
            print(f"{k:24s} " + " ".join(f"{v:14d}" for v in vals))


if __name__ == "__main__":
    main()
