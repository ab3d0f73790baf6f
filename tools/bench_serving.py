"""Serving-stack performance on hardware (PERF.md serving section).

Quantifies the deployment tiers against the in-process path on the SAME
model/batch/steps (the 91M inverse_diffusion notebook preset, batch 512,
64-step CFG — the flagship bench geometry):

  1. in-process `design.generate_from_conditioning` (sample + decode +
     validity/novelty) — the truth the serving tiers must not regress;
  2. `ArtifactServer` on the AOT-exported sampling program (same decode
     host-side) — the artifact-overhead tier;
  3. HTTP daemon `/sample`, full-batch requests — end-to-end mol/s and
     the overhead fraction vs tier 1 (regression bar: <10%);
  4. HTTP `/sample` latency, 16-row requests, 1 and 8 concurrent
     clients — p50/p99 ms (each request pays the full fixed-batch
     program: that IS the fixed-shape AOT serving model);
  5. HTTP `/predict` (forward_transformer encoder artifact) with 32
     concurrent 1-row clients, dynamic batching OFF vs ON
     (--batch-window-ms 25) — requests/s A/B.

One flushed JSON line per measurement (same convention as bench.py).
Run serialized with every other TPU job (PERF.md methodology).
"""
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from urllib import request as urlrequest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# --smoke: CPU-feasible plumbing check (tiny model/batch/steps) — numbers
# are meaningless, only the harness is exercised.
SMOKE = "--smoke" in sys.argv
BATCH = 8 if SMOKE else 512
STEPS = 4 if SMOKE else 64
COND_SCALE = 2.0
SMALL = 2 if SMOKE else 16   # rows per latency-probe request


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit, **extra}), flush=True)


def post(url: str, payload: dict, timeout: float = 600.0) -> dict:
    req = urlrequest.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urlrequest.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def pctl(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))]


def build_inverse():
    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.data.qm9 import (prepare_qm9,
                                                           synthetic_qm9)
    from moleculediffusiontransformer_tpu.models import (QMDiffusion,
                                                         from_config)
    smiles, props = synthetic_qm9(512, seed=3, chemically_valid=True)
    data = prepare_qm9(smiles, props, mode="inverse_diffusion",
                       max_length=32)
    if SMOKE:
        model = QMDiffusion(
            max_length=32, channels=16, pred_dim=data.vocab_size,
            text_embed_dim=16, embed_dim_position=8,
            context_embedding_max_length=12, multipliers=(1, 2),
            factors=(2,), num_blocks=(1,), attentions=(1,),
            attention_heads=2, attention_features=8, pre_transformer=1,
            patch_size=1)
    else:
        model = from_config(QMDiffusion,
                            cfg.inverse_diffusion_qm9(data.vocab_size),
                            dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    y = jnp.asarray(data.y_train[:2])
    X = jnp.zeros((2, model.max_length, model.pred_dim))
    variables = jax.jit(model.init)(key, y, X, key)
    return model, variables, data


def main():
    # tunnel preflight with retry (same contract as bench.py)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench
    bench._require_device()
    bench._require_compute()

    from moleculediffusiontransformer_tpu.design import (
        decode_one_hot, evaluate_generated, generate_from_conditioning)
    from moleculediffusiontransformer_tpu.design.export import (
        export_encoder, export_sampler, save_artifact)
    from moleculediffusiontransformer_tpu.design.http_serve import make_httpd
    from moleculediffusiontransformer_tpu.design.serve import ArtifactServer

    model, variables, data = build_inverse()
    rng = np.random.RandomState(0)
    # physical-unit property rows (generate_from_conditioning scales them)
    lo, hi = data.scaler.data_min_, data.scaler.data_max_
    props_phys = (lo + rng.rand(BATCH, 12) * (hi - lo)).astype(np.float32)
    props_scaled = np.asarray(data.scaler.transform(props_phys), np.float32)

    # ---- 1. in-process baseline -----------------------------------------
    def inproc(seed):
        return generate_from_conditioning(
            model, variables, props_phys, data.tokenizer,
            jax.random.PRNGKey(seed), scaler=data.scaler,
            training_smiles=data.smiles, cond_scale=COND_SCALE,
            timesteps=STEPS)

    inproc(1)  # warmup/compile
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        inproc(2 + i)
    dt_inproc = (time.perf_counter() - t0) / reps
    inproc_mol_s = BATCH / dt_inproc
    emit("serving_inprocess_generate", inproc_mol_s, "molecules/s")

    # device-only slice of tier 1 (sample + sync, no decode/eval): the
    # host decode/validity share is dt_inproc - this
    from moleculediffusiontransformer_tpu.models import sample as _sample
    y_scaled = jnp.asarray(props_scaled)

    def dev_only(seed):
        out = _sample(model, variables, y_scaled, jax.random.PRNGKey(seed),
                      num_steps=STEPS, cond_scale=COND_SCALE)
        np.asarray(out)  # host transfer, same sync the serving tiers pay

    dev_only(1)
    t0 = time.perf_counter()
    for i in range(reps):
        dev_only(2 + i)
    dt_dev = (time.perf_counter() - t0) / reps
    emit("serving_inprocess_device_only", BATCH / dt_dev, "molecules/s",
         host_decode_ms=round((dt_inproc - dt_dev) * 1e3, 1))

    # ---- 2. ArtifactServer (AOT artifact + host decode) ------------------
    # Two exports: the portable pure-XLA artifact (cross-Mosaic-version
    # safe, the default) and the same-fleet fused artifact
    # (allow_tpu_custom_calls) — the documented TPU production pairing.
    for fused in (False, True) if not SMOKE else (False,):
        art_path = f"/tmp/bench_serving_sampler_{int(fused)}.mdtx"
        exported, exec_blob = export_sampler(
            model, variables, batch=BATCH, num_steps=STEPS,
            cond_scale=COND_SCALE, allow_tpu_custom_calls=fused,
            executable=True)
        save_artifact(exported, art_path, tokenizer=data.tokenizer,
                      scaler=data.scaler, training_smiles=data.smiles,
                      executable=exec_blob)
        server = ArtifactServer(art_path)
        server.variables = variables  # same weights as tier 1

        def prog_only(seed):
            out = server.call_padded(props_scaled,
                                     key=jax.random.PRNGKey(seed))
            return out

        def art_call(seed):
            out = prog_only(seed)
            gen = decode_one_hot(out, data.tokenizer)
            return evaluate_generated(gen, data.smiles)

        def time_tiers(suffix):
            art_call(1)  # warmup
            t0 = time.perf_counter()
            for i in range(reps):
                prog_only(2 + i)
            dt_prog = (time.perf_counter() - t0) / reps
            t0 = time.perf_counter()
            for i in range(reps):
                art_call(2 + i)
            dt_art = (time.perf_counter() - t0) / reps
            emit("serving_artifact_server" + suffix, BATCH / dt_art,
                 "molecules/s",
                 overhead_vs_inprocess=round(dt_art / dt_inproc - 1.0, 4),
                 program_only_mol_s=round(BATCH / dt_prog, 1),
                 program_overhead_vs_device=round(dt_prog / dt_dev - 1.0, 4))

        # executable tier (the bundled live-compiled program)
        exec_fn, server._exec = server._exec, None
        if exec_fn is None:
            emit("serving_artifact_exec_load_failed", 0, "error",
                 detail=str(server.exec_error)[:200], fused=fused)
        # portable StableHLO tier (metric names match earlier rounds)
        time_tiers("_fused" if fused else "")
        if exec_fn is not None:
            server._exec = exec_fn
            time_tiers("_exec_fused" if fused else "_exec")
    # tiers 3-4 serve the production TPU pairing (fused artifact + exec
    # tier) when available — SMOKE has only the portable artifact
    art = f"/tmp/bench_serving_sampler_{0 if SMOKE else 1}.mdtx"
    server = ArtifactServer(art)
    server.variables = variables

    # ---- 3/4. HTTP daemon ------------------------------------------------
    httpd = make_httpd(server, port=0, quiet=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    body_full = {"properties": [[float(v) for v in r] for r in props_phys],
                 "seed": 1}
    post(base + "/sample", body_full)  # warmup (compile already cached)

    t0 = time.perf_counter()
    for i in range(reps):
        post(base + "/sample", dict(body_full, seed=2 + i))
    dt_http = (time.perf_counter() - t0) / reps
    emit("serving_http_sample_fullbatch", BATCH / dt_http, "molecules/s",
         overhead_vs_inprocess=round(dt_http / dt_inproc - 1.0, 4))

    # latency: small requests, 1 then 8 concurrent clients
    body_small = {"properties": body_full["properties"][:SMALL], "seed": 5}

    def timed_req(seed):
        t0 = time.perf_counter()
        post(base + "/sample", dict(body_small, seed=seed))
        return (time.perf_counter() - t0) * 1000.0

    lat1 = [timed_req(10 + i) for i in range(8)]
    emit("serving_http_sample_latency_1client", pctl(lat1, 0.5), "ms_p50",
         p99_ms=round(pctl(lat1, 0.99), 1), rows_per_request=SMALL)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(8) as ex:
        lat8 = list(ex.map(timed_req, range(100, 132)))
    wall8 = time.perf_counter() - t0
    emit("serving_http_sample_latency_8clients", pctl(lat8, 0.5), "ms_p50",
         p99_ms=round(pctl(lat8, 0.99), 1), rows_per_request=SMALL,
         aggregate_requests_per_s=round(len(lat8) / wall8, 2))
    httpd.shutdown()

    # ---- 5. /predict dynamic batching A/B ---------------------------------
    from moleculediffusiontransformer_tpu.core import config as cfg
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequenceEncoder)
    c = cfg.forward_transformer_qm9()
    if SMOKE:
        enc = MoleculeTransformerSequenceEncoder(
            dim=32, depth=2, heads=2, ff_mult=2, logits_dim=c.logits_dim,
            logits_dim_length=c.logits_dim_length, max_length=c.max_length,
            max_tokens=c.max_tokens, embed_dim=8)
    else:
        enc = MoleculeTransformerSequenceEncoder(
            dim=c.dim, depth=c.depth, heads=c.heads, ff_mult=c.ff_mult,
            logits_dim=c.logits_dim, logits_dim_length=c.logits_dim_length,
            max_length=c.max_length, max_tokens=c.max_tokens,
            embed_dim=c.embed_dim)
    ids0 = jnp.zeros((2, c.max_length), jnp.int32)
    enc_vars = jax.jit(enc.init)(jax.random.PRNGKey(0), ids0)
    enc_path = "/tmp/bench_serving_encoder.mdtx"
    save_artifact(export_encoder(enc, enc_vars, batch=BATCH,
                                 max_length=c.max_length),
                  enc_path, tokenizer=data.tokenizer, scaler=data.scaler)
    smi = [s for s in data.smiles if s][:1] or ["CCO"]

    for window_ms in (0.0, 25.0):
        srv = ArtifactServer(enc_path)
        httpd = make_httpd(srv, port=0, quiet=True,
                           batch_window_ms=window_ms)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{port}/predict"
        post(url, {"smiles": smi})  # warmup

        def one(_):
            t0 = time.perf_counter()
            post(url, {"smiles": smi})
            return time.perf_counter() - t0

        n_clients, n_reqs = (4, 8) if SMOKE else (32, 128)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_clients) as ex:
            lats = list(ex.map(one, range(n_reqs)))
        wall = time.perf_counter() - t0
        emit("serving_http_predict_dynbatch_" +
             ("on" if window_ms else "off"),
             n_reqs / wall, "requests/s",
             p50_ms=round(pctl(lats, 0.5) * 1000, 1),
             p99_ms=round(pctl(lats, 0.99) * 1000, 1),
             window_ms=window_ms, concurrent_clients=n_clients)
        httpd.shutdown()


if __name__ == "__main__":
    main()
