"""Fused-vs-unfused sampling A/B, one subprocess per cell (env-gated).

Round 3 recorded the Transformer1d megakernel as NEUTRAL at the 91M
flagship geometry (369.6 fused vs 368.8 unfused, PERF.md).  That
measurement toggled fusion IN-PROCESS, which the trace-cache bug (fixed
in ops/transformer_fusion.py::_set_trace_flag) silently turned into
measuring the SAME program twice.  This A/B is immune by construction:
each cell is a fresh subprocess whose only fusion control is the
MDT_FUSION env var read at first trace.

Cells: {bench (ch64, L64), flagship (91M)} x {batch 256, 512} x {on, off}.

  python tools/bench_fusion_ab.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import bench
import jax, jax.numpy as jnp, numpy as np
bench._require_device(); bench._require_compute()
from moleculediffusiontransformer_tpu.models import sample

model = bench._flagship_model() if {flagship} else bench._model()
BATCH, STEPS = {batch}, 64
key = jax.random.PRNGKey(0)
props = jax.random.uniform(key, (BATCH, 12), minval=-1.0, maxval=1.0)
target = jnp.zeros((2, model.max_length, model.pred_dim))
variables = jax.jit(model.init)(key, props[:2], target, key)

def run(k):
    return sample(model, variables, props, k, num_steps=STEPS,
                  cond_scale=2.0)

bench._sync(run(jax.random.PRNGKey(1)))
best = float("inf")
for i in range(3):
    t0 = time.perf_counter()
    bench._sync(run(jax.random.PRNGKey(2 + i)))
    best = min(best, time.perf_counter() - t0)
from moleculediffusiontransformer_tpu.ops import transformer_fusion as tf
print(json.dumps({{"fusion_enabled": tf.fusion_enabled(),
                   "mol_per_s": round(BATCH / best, 1),
                   "seconds": round(best, 4)}}), flush=True)
"""


def main():
    # --cells bench:256:0,flagship:512:1  (default: all 8)
    only = None
    if "--cells" in sys.argv:
        only = {tuple(c.split(":"))
                for c in sys.argv[sys.argv.index("--cells") + 1].split(",")}
    first = True
    for flagship in (False, True):
        for batch in (256, 512):
            for fused in ("1", "0"):
                cell = ("flagship" if flagship else "bench", str(batch),
                        fused)
                if only is not None and cell not in only:
                    continue
                if not first:
                    # the tunnel needs ~a minute to release after a
                    # process exits; back-to-back cells wedge (observed:
                    # alternating success/540s-probe-timeout)
                    import time
                    time.sleep(75)
                first = False
                env = dict(os.environ, MDT_FUSION=fused,
                           JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
                code = CHILD.format(repo=REPO, flagship=flagship,
                                    batch=batch)
                proc = subprocess.run([sys.executable, "-c", code],
                                      capture_output=True, text=True,
                                      env=env, timeout=2400)
                line = next((l for l in proc.stdout.splitlines()
                             if l.startswith("{")), None)
                tag = {"model": "flagship" if flagship else "bench",
                       "batch": batch, "MDT_FUSION": fused}
                if line:
                    print(json.dumps({**tag, **json.loads(line)}),
                          flush=True)
                else:
                    tail = "\n".join(proc.stderr.strip().splitlines()[-6:])
                    print(json.dumps({**tag, "error": tail[:800]}),
                          flush=True)


if __name__ == "__main__":
    main()
