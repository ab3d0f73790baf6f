"""Roofline refresh: FLOPs vs measured time for the FIVE bench programs.

Round-5 VERDICT item 4: the PERF.md roofline table was round-3 era
(pre-native-conv, pre-corrected-fusion); this tool re-derives it for the
current production configuration and makes it re-runnable by any future
round.

Two phases, because the production TPU path runs Pallas megakernels whose
FLOPs are invisible to XLA cost analysis (custom calls):

  --mode flops   CPU-pinned compile of the EXACT programs (fusion auto-off
                 on CPU, so the pure-XLA composition — same math — is
                 counted).  Run under PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=''.
  --mode time    device timing on the TPU (bench.py methodology: whole
                 samplers / multi-step scans as one program, device-side
                 sum sync, identity-floor-free because programs are >100ms).
  --mode breakdown   flagship-train stage ablation on TPU: forward-only,
                 +grad, +optimizer — localizes where the train-step time
                 goes (VERDICT: "identify the top-3 cost centers").

Orchestration (the usual invocation; spawns one CPU subprocess for flops
and one TPU subprocess for timing, serialized per the tunnel rules):

  python tools/roofline.py --all --out ROOFLINE_r5.json

Device reality constant: 162 TFLOP/s sustained bf16 matmul chain
(4096x1024x1024, 82% of v5e's 197 peak — measured round 2, PERF.md).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEVICE_REALITY_TFLOPS = 162.0

PROGRAMS = ("bench_sampling", "flagship_sampling", "bench_train",
            "flagship_train", "ar_generation")


def _bench():
    import bench
    return bench


def build(name: str, scale: int = 1):
    """Return (fn, args, batch, work_items) for a named bench program.

    ``fn(*args)`` is the exact jitted computation the bench times;
    ``work_items`` is what one full program execution produces (molecules,
    samples, tokens) so FLOPs and seconds normalize the same way.

    ``scale`` divides every batch dimension by N (timing always uses
    scale=1; the flops phase uses --scale on this 1-core host because
    per-item FLOPs are batch-invariant once the batch exceeds the MXU
    tile — the orchestrator cross-checks that invariance at two scales
    before trusting it).
    """
    import jax
    import jax.numpy as jnp

    bench = _bench()
    key = jax.random.PRNGKey(0)

    if name in ("bench_sampling", "flagship_sampling"):
        from moleculediffusiontransformer_tpu.models import sample
        model = (bench._model() if name == "bench_sampling"
                 else bench._flagship_model())
        batch = (bench.BATCH if name == "bench_sampling"
                 else bench.FLAGSHIP_BATCH) // scale
        props = jax.random.uniform(key, (batch, 12), minval=-1., maxval=1.)
        target = jnp.zeros((2, model.max_length, model.pred_dim))
        variables = jax.jit(model.init)(key, props[:2], target, key)

        # variables must be an ARGUMENT: closing over them inlines the
        # params as IR constants and the tunnel's remote_compile rejects
        # the payload (HTTP 413, observed 2026-08-21)
        def fn(variables, props, k):
            return sample(model, variables, props, k,
                          num_steps=bench.NUM_STEPS, cond_scale=2.0)

        return fn, (variables, props, jax.random.PRNGKey(1)), batch, batch

    if name == "bench_train":
        import optax
        from moleculediffusiontransformer_tpu.core.config import TrainConfig
        from moleculediffusiontransformer_tpu.train import (
            TrainState, make_optimizer)
        model = bench._model()
        batch, steps = bench.TRAIN_BATCH // scale, bench.TRAIN_STEPS
        cond = jax.random.uniform(key, (batch, 12), minval=-1., maxval=1.)
        target = jax.random.normal(key, (batch, model.max_length,
                                         model.pred_dim))
        variables = jax.jit(model.init)(key, cond[:2], target[:2], key)
        tx = make_optimizer(TrainConfig())
        state = TrainState.create(variables["params"], tx)

        def fn(state, cond, target, k):
            def loss_fn(params, kk):
                return model.apply({"params": params}, cond, target, kk)

            def body(s, kk):
                loss, grads = jax.value_and_grad(loss_fn)(s.params, kk)
                updates, opt_state = tx.update(grads, s.opt_state, s.params)
                params = optax.apply_updates(s.params, updates)
                return s.replace(step=s.step + 1, params=params,
                                 opt_state=opt_state), loss
            return jax.lax.scan(body, state, jax.random.split(k, steps))[1]

        return (fn, (state, cond, target, jax.random.PRNGKey(1)), batch,
                batch * steps)

    if name == "flagship_train":
        from moleculediffusiontransformer_tpu.core.config import TrainConfig
        from moleculediffusiontransformer_tpu.train import (
            TrainState, make_diffusion_train_step, make_optimizer)
        model = bench._flagship_model()
        batch, steps = 1024 // scale, 5
        cond = jax.random.uniform(key, (batch, 12), minval=-1., maxval=1.)
        target = jax.random.normal(key, (batch, model.max_length,
                                         model.pred_dim))
        variables = jax.jit(model.init)(key, cond[:2], target[:2], key)
        tx = make_optimizer(TrainConfig())
        state = TrainState.create(variables["params"], tx)
        step = make_diffusion_train_step(model, tx, donate=False,
                                         accumulation_steps=2)

        def fn(state, cond, target, k):
            def body(s, kk):
                return step(s, cond, target, kk)
            return jax.lax.scan(body, state, jax.random.split(k, steps))[1]

        return (fn, (state, cond, target, jax.random.PRNGKey(1)), batch,
                batch * steps)

    if name == "ar_generation":
        from moleculediffusiontransformer_tpu.models import (
            MoleculeTransformerSequence, generate_sequence)
        model = MoleculeTransformerSequence(
            dim=128, depth=12, logits_dim=24, dim_head=16, heads=8,
            text_embed_dim=16, max_text_len=12)
        batch, tokens = bench.AR_BATCH // scale, bench.AR_TOKENS
        init_y = jax.random.uniform(key, (2, 12), minval=-1., maxval=1.)
        init_ids = jnp.zeros((2, 4), jnp.int32)
        variables = model.init({"params": key}, init_y, init_ids, key=key)
        props = jax.random.uniform(jax.random.PRNGKey(1), (batch, 12),
                                   minval=-1., maxval=1.)
        start = jnp.ones((batch, 1), jnp.int32)

        def fn(variables, props, start, k):
            return generate_sequence(model, variables, props, start, k,
                                     tokens_to_generate=tokens)

        return (fn, (variables, props, start, jax.random.PRNGKey(2)), batch,
                batch * tokens)

    raise ValueError(name)


def _cost_flops(fn, args) -> float:
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def mode_flops(names, scale: int = 1) -> dict:
    """Count FLOPs of the UN-SCANNED primitives and multiply by trip
    counts.  XLA cost analysis counts a ``lax.scan``/while body ONCE
    (measured: the 64-step sampler reported ~1/40th of its true FLOPs),
    so the whole-program builders from ``build`` cannot be used here.

    Primitives (all at batch/scale, per-item FLOPs are batch-invariant):
      sampling  = one CFG denoise eval x (2 evals/step x NUM_STEPS)
      train     = one value_and_grad microstep x accumulation (+1 Adam
                  update + grad average, counted once per full batch)
      ar        = one full causal CFG forward at the generated length
                  (KV-cached decode does the same matmul work in total)
    """
    import jax
    import jax.numpy as jnp

    bench = _bench()
    key = jax.random.PRNGKey(0)
    out = {}

    def sampling_flops(model, batch):
        props = jax.random.uniform(key, (batch, 12), minval=-1., maxval=1.)
        target = jnp.zeros((2, model.max_length, model.pred_dim))
        variables = jax.jit(model.init)(key, props[:2], target, key)
        from moleculediffusiontransformer_tpu.models.qm_diffusion import (
            QMDiffusionBase)

        def one_eval(variables, props, x):
            emb = model.apply(variables, props,
                              method=QMDiffusionBase.embed_conditioning)
            sigma = jnp.full((x.shape[0],), 1.0, jnp.float32)
            return model.apply(variables, x, sigma, emb, 2.0,
                               method=QMDiffusionBase.denoise)

        x = jnp.zeros((batch, model.max_length, model.pred_dim))
        per_eval = _cost_flops(one_eval, (variables, props, x))
        return per_eval * 2 * bench.NUM_STEPS, 2 * bench.NUM_STEPS

    def train_flops(model, micro, accum):
        from moleculediffusiontransformer_tpu.core.config import TrainConfig
        from moleculediffusiontransformer_tpu.train import (
            TrainState, make_optimizer)
        cond = jax.random.uniform(key, (micro, 12), minval=-1., maxval=1.)
        target = jax.random.normal(key, (micro, model.max_length,
                                         model.pred_dim))
        variables = jax.jit(model.init)(key, cond[:2], target[:2], key)
        tx = make_optimizer(TrainConfig())
        state = TrainState.create(variables["params"], tx)

        def one_grad(params, cond, target, k):
            return jax.value_and_grad(
                lambda p: model.apply({"params": p}, cond, target, k))(params)

        grad_f = _cost_flops(one_grad,
                             (state.params, cond, target, key))

        def opt(state, grads):
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            import optax
            return optax.apply_updates(state.params, updates), opt_state

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        opt_f = _cost_flops(opt, (state, zero_grads))
        return grad_f * accum + opt_f, grad_f, opt_f

    for name in names:
        if name in ("bench_sampling", "flagship_sampling"):
            model = (bench._model() if name == "bench_sampling"
                     else bench._flagship_model())
            batch = (bench.BATCH if name == "bench_sampling"
                     else bench.FLAGSHIP_BATCH) // scale
            flops, evals = sampling_flops(model, batch)
            rec = {"flops_per_program": flops, "batch": batch,
                   "work_items": batch, "denoise_evals": evals}
        elif name == "bench_train":
            model = bench._model()
            batch = bench.TRAIN_BATCH // scale
            flops, grad_f, opt_f = train_flops(model, batch, 1)
            rec = {"flops_per_program": flops, "batch": batch,
                   "work_items": batch, "grad_flops": grad_f,
                   "opt_flops": opt_f}
        elif name == "flagship_train":
            model = bench._flagship_model()
            micro = 512 // scale
            flops, grad_f, opt_f = train_flops(model, micro, 2)
            rec = {"flops_per_program": flops, "batch": 2 * micro,
                   "work_items": 2 * micro, "grad_flops": grad_f,
                   "opt_flops": opt_f}
        elif name == "ar_generation":
            from moleculediffusiontransformer_tpu.models import (
                MoleculeTransformerSequence)
            model = MoleculeTransformerSequence(
                dim=128, depth=12, logits_dim=24, dim_head=16, heads=8,
                text_embed_dim=16, max_text_len=12)
            batch = bench.AR_BATCH // scale
            init_y = jax.random.uniform(key, (batch, 12), minval=-1.,
                                        maxval=1.)
            ids = jnp.ones((batch, bench.AR_TOKENS + 1), jnp.int32)
            variables = model.init({"params": key}, init_y[:2], ids[:2],
                                   key=key)

            def fwd(variables, y, ids):
                return model.apply(variables, y, ids, key=key)

            # cond + uncond CFG passes per generated batch
            flops = 2 * _cost_flops(fwd, (variables, init_y, ids))
            rec = {"flops_per_program": flops, "batch": batch,
                   "work_items": batch * bench.AR_TOKENS}
        else:
            raise ValueError(name)
        rec["flops_scale"] = scale
        rec["flops_per_item"] = rec["flops_per_program"] / rec["work_items"]
        out[name] = rec
        print(f"[flops] {name}: {rec['flops_per_program']/1e12:.3f} "
              f"TFLOP/program ({rec['flops_per_item']/1e9:.3f} GFLOP/item)",
              flush=True)
    return out


def _time_program(fn, args, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    run = jax.jit(fn)
    sync(run(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(run(*args))
    return (time.perf_counter() - t0) / reps


def mode_time(names, reps: int) -> dict:
    out = {}
    for name in names:
        fn, args, batch, work = build(name)
        dt = _time_program(fn, args, reps)
        out[name] = {"seconds_per_program": dt, "batch": batch,
                     "work_items": work, "items_per_s": work / dt}
        print(f"[time] {name}: {dt*1e3:.1f} ms/program "
              f"({work/dt:.1f} items/s)", flush=True)
    return out


def mode_breakdown(reps: int) -> dict:
    """Flagship-train stage ablation: forward loss, +backward, +optimizer.

    All stages run batch-512 microbatch geometry (the production
    accumulation envelope) scanned x10 so per-step times are comparable.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.train import (
        TrainState, make_optimizer)

    bench = _bench()
    model = bench._flagship_model()
    key = jax.random.PRNGKey(0)
    micro, steps = 512, 10
    cond = jax.random.uniform(key, (micro, 12), minval=-1., maxval=1.)
    target = jax.random.normal(key, (micro, model.max_length,
                                     model.pred_dim))
    variables = jax.jit(model.init)(key, cond[:2], target[:2], key)
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)

    def loss_fn(params, k):
        return model.apply({"params": params}, cond, target, k)

    def fwd(state, k):
        def body(s, kk):
            return s, loss_fn(s.params, kk)
        return jax.lax.scan(body, state, jax.random.split(k, steps))[1]

    def fwd_bwd(state, k):
        def body(s, kk):
            loss, grads = jax.value_and_grad(loss_fn)(s.params, kk)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return s, loss + 0.0 * gsum  # keep grads live, tiny output
        return jax.lax.scan(body, state, jax.random.split(k, steps))[1]

    out = {}
    for name, fn in (("forward", fwd), ("forward_backward", fwd_bwd)):
        dt = _time_program(fn, (state, jax.random.PRNGKey(1)), reps) / steps
        out[name] = {"seconds_per_microstep": dt,
                     "samples_per_s": micro / dt}
        print(f"[breakdown] {name}: {dt*1e3:.2f} ms/microstep "
              f"({micro/dt:.0f} samples/s @ micro {micro})", flush=True)

    # The production step (2x512 accumulation + ONE optimizer update per
    # 1024) is the honest optimizer probe: a per-microstep update inside
    # a non-donated scan carries the 1.1 GB fp32 state through per-
    # iteration buffer copies and reads ~0.5 s/step — an artifact of the
    # probe, not the optimizer (first breakdown run, 2026-08-21).
    pfn, pargs, pbatch, pwork = build("flagship_train")
    pdt = _time_program(pfn, pargs, reps) * pbatch / pwork  # s per 1024-step
    out["production_step_1024"] = {"seconds": pdt,
                                   "samples_per_s": 1024 / pdt}
    print(f"[breakdown] production accum step: {pdt*1e3:.2f} ms/1024 "
          f"({1024/pdt:.0f} samples/s)", flush=True)
    fw = out["forward"]["seconds_per_microstep"]
    fb = out["forward_backward"]["seconds_per_microstep"]
    out["derived"] = {
        "backward_seconds_per_microstep": fb - fw,
        "backward_over_forward": (fb - fw) / fw if fw else None,
        # optimizer + accumulation glue per 1024-batch production step
        "opt_plus_glue_seconds": pdt - 2 * fb,
    }
    print(f"[breakdown] derived: fwd {1e3*fw:.2f} bwd {1e3*(fb-fw):.2f} "
          f"opt+glue {1e3*(pdt-2*fb):.2f} ms  bwd/fwd {(fb-fw)/fw:.2f}",
          flush=True)
    return out


def orchestrate(args) -> None:
    """Spawn flops (CPU) and timing (TPU) phases as subprocesses and merge."""
    env_cpu = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="",
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    here = os.path.abspath(__file__)
    names = args.programs.split(",") if args.programs else list(PROGRAMS)

    def run_phase(mode, env, timeout):
        cmd = [sys.executable, here, "--mode", mode,
               "--programs", ",".join(names), "--reps", str(args.reps),
               "--scale", str(args.scale if mode == "flops" else 1),
               "--json-out", f"/tmp/roofline_{mode}.json"]
        print(f"=== phase {mode} ===", flush=True)
        rc = subprocess.call(cmd, env=env, timeout=timeout)
        if rc != 0:
            print(f"phase {mode} FAILED rc={rc}", file=sys.stderr)
            return None
        with open(f"/tmp/roofline_{mode}.json") as f:
            return json.load(f)

    flops = run_phase("flops", env_cpu, 3600)
    env_tpu = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache")
    timing = run_phase("time", env_tpu, 5400)
    time.sleep(75)  # tunnel spacing between TPU processes
    breakdown = run_phase("breakdown", env_tpu, 3600)

    report = {"device_reality_tflops": DEVICE_REALITY_TFLOPS,
              "programs": {}, "flagship_train_breakdown": breakdown}
    for name in names:
        row = {}
        if flops and name in flops:
            row.update(flops[name])
        if timing and name in timing:
            row.update(timing[name])
        if "flops_per_item" in row and "items_per_s" in row:
            # flops phase may have run at a reduced batch (--scale);
            # per-item FLOPs x measured items/s is scale-independent
            tf = row["flops_per_item"] * row["items_per_s"] / 1e12
            row["achieved_tflops"] = tf
            row["pct_of_reality"] = 100.0 * tf / DEVICE_REALITY_TFLOPS
        report["programs"][name] = row
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=("flops", "time", "breakdown"))
    p.add_argument("--all", action="store_true",
                   help="orchestrate flops (CPU subprocess) + time + "
                        "breakdown (TPU subprocesses)")
    p.add_argument("--programs", default=",".join(PROGRAMS))
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--scale", type=int, default=8,
                   help="flops phase: divide batches by N (per-item FLOPs "
                        "are batch-invariant; full-batch CPU compiles take "
                        "an hour on this 1-core host)")
    p.add_argument("--out", default="ROOFLINE_r5.json")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    if args.all:
        orchestrate(args)
        return
    names = args.programs.split(",")
    if args.mode == "flops":
        out = mode_flops(names, args.scale)
    elif args.mode == "time":
        out = mode_time(names, args.reps)
    elif args.mode == "breakdown":
        out = mode_breakdown(args.reps)
    else:
        raise SystemExit("need --mode or --all")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
