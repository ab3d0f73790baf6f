"""Isolate the AOT-artifact slowdown (PERF.md serving section).

bench_serving.py measured the exported sampler program ~39% slower than
the live ``jax.jit(sample)`` path at identical geometry (flagship 91M,
batch 512, 64 steps), independent of fusion and of host decode. This
diagnostic separates the candidate causes on the bench model (fast
compiles, same structure):

  live        jit(fn)(vars, props, key)              — the reference time
  export_eager  exported.call(vars, props, key)      — what ArtifactServer does
  export_jit    jit(lambda *a: exported.call(*a))    — same program, jit-wrapped
  roundtrip     deserialize(serialize(exported)).call under jit — the .mdtx path

If export_jit matches live, the eager call's per-invocation host work is
the problem (fix: ArtifactServer jit-wraps the call). If export_jit is
still slow, the exported StableHLO itself compiles worse than the live
trace (donation/compile-options gap).

Usage: python tools/diag_export_overhead.py [--flagship]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    bench._require_device()
    bench._require_compute()

    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.data.qm9 import (prepare_qm9,
                                                           synthetic_qm9)
    from moleculediffusiontransformer_tpu.design.export import (deserialize,
                                                                export_sampler,
                                                                serialize)
    from moleculediffusiontransformer_tpu.models import QMDiffusion, from_config
    from moleculediffusiontransformer_tpu.models.qm_diffusion import sample

    BATCH, STEPS = 512, 64
    flagship = "--flagship" in sys.argv
    key = jax.random.PRNGKey(0)
    if flagship:
        smiles, props = synthetic_qm9(BATCH, seed=3, chemically_valid=True)
        data = prepare_qm9(smiles, props, mode="inverse_diffusion",
                           max_length=32)
        model = from_config(QMDiffusion,
                            cfg.inverse_diffusion_qm9(data.vocab_size),
                            dtype=jnp.bfloat16)
    else:
        model = bench._model()   # the bench geometry (ch 64, L 64)
    y = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
    X = jnp.zeros((2, model.max_length, model.pred_dim))
    variables = jax.jit(model.init)(key, y, X, key)
    props512 = jax.random.uniform(key, (BATCH, 12), minval=-1.0, maxval=1.0)

    def fn(variables, sequences, key):
        return sample(model, variables, sequences, key, num_steps=STEPS,
                      cond_scale=2.0)

    def timeit(name, call, reps=3):
        out = call(jax.random.PRNGKey(1))
        np.asarray(out)  # sync via host transfer, like serving does
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            out = call(jax.random.PRNGKey(2 + i))
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"case": name, "seconds": round(best, 4),
                          "mol_per_s": round(BATCH / best, 1)}), flush=True)
        return best

    live = jax.jit(fn)
    timeit("live_jit", lambda k: live(variables, props512, k))

    exported = export_sampler(model, variables, batch=BATCH,
                              num_steps=STEPS, cond_scale=2.0)
    timeit("export_eager", lambda k: exported.call(variables, props512, k))

    wrapped = jax.jit(lambda v, p, k: exported.call(v, p, k))
    timeit("export_jit", lambda k: wrapped(variables, props512, k))

    rt = deserialize(serialize(exported))
    wrapped_rt = jax.jit(lambda v, p, k: rt.call(v, p, k))
    timeit("roundtrip_jit", lambda k: wrapped_rt(variables, props512, k))


if __name__ == "__main__":
    main()
