"""Hardware validation of the executable serving tier (cross-process).

Phase "export" (default): bench-geometry model — time the live jit path,
then export the sampler with ``executable=True`` and save the bundle.
Phase "serve" (run as a SECOND process, serialized after the first): load
the bundle with ``ArtifactServer`` and time ``call`` through (a) the
deserialized live executable and (b) the StableHLO tier — the exec tier
must match the live number from phase 1 (the StableHLO tier is the
known-slower fallback, tools/diag_export_overhead.py).

  python tools/diag_exec_tier.py export
  python tools/diag_exec_tier.py serve
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

PATH = "/tmp/diag_exec_tier.mdtx"
BATCH, STEPS = 512, 64


def timeit(name, call, reps=3):
    out = call(jax.random.PRNGKey(1))
    np.asarray(out)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = call(jax.random.PRNGKey(2 + i))
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"case": name, "seconds": round(best, 4),
                      "mol_per_s": round(BATCH / best, 1)}), flush=True)


def main():
    import bench
    bench._require_device()
    bench._require_compute()

    from moleculediffusiontransformer_tpu.design.export import (export_sampler,
                                                                save_artifact)

    phase = sys.argv[1] if len(sys.argv) > 1 else "export"
    if phase == "export":
        import jax.numpy as jnp
        model = bench._model()
        key = jax.random.PRNGKey(0)
        y = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
        X = jnp.zeros((2, model.max_length, model.pred_dim))
        variables = jax.jit(model.init)(key, y, X, key)
        props = jax.random.uniform(key, (BATCH, 12), minval=-1.0, maxval=1.0)

        from moleculediffusiontransformer_tpu.models.qm_diffusion import sample
        live = jax.jit(lambda v, p, k: sample(
            model, v, p, k, num_steps=STEPS, cond_scale=2.0))
        timeit("live_jit", lambda k: live(variables, props, k))

        exported, blob = export_sampler(
            model, variables, batch=BATCH, num_steps=STEPS, cond_scale=2.0,
            allow_tpu_custom_calls=True, executable=True)
        save_artifact(exported, PATH, executable=blob)
        np.save("/tmp/diag_exec_props.npy", np.asarray(props))
        print(json.dumps({"case": "exported",
                          "mdtx_mb": round(os.path.getsize(PATH) / 1e6, 1),
                          "exec_blob_mb": round(len(blob) / 1e6, 1)}),
              flush=True)
    else:
        from moleculediffusiontransformer_tpu.design.serve import (
            ArtifactServer)
        srv = ArtifactServer(PATH)
        print(json.dumps({"case": "loaded",
                          "exec_loaded": srv._exec is not None,
                          "exec_error": srv.exec_error}), flush=True)
        props = jax.device_put(np.load("/tmp/diag_exec_props.npy"))
        # placeholder params are fine for timing; shapes match
        if srv._exec is not None:
            timeit("serve_exec_tier", lambda k: srv.call(props, k))
        srv._exec = None
        timeit("serve_stablehlo_tier", lambda k: srv.call(props, k))


if __name__ == "__main__":
    main()
