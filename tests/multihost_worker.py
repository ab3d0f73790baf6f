"""Worker for tests/test_multihost.py — one process of a 2-process DCN run.

Each process owns 4 virtual CPU devices; the global mesh is 8 devices over
2 processes, so collectives cross the process (DCN) boundary through gloo.
Three modes (4th argv, default "dp") cover the parallelism layouts most
sensitive to process boundaries:

  dp    one diffusion train step, gradient all-reduce over DCN;
  fsdp  the same step with params + Adam state sharded over the global
        'data' axis (``parallel/fsdp.py``): the just-in-time param
        all-gathers and grad reduce-scatters cross the boundary;
  pp    the GPipe layer pipeline (``parallel/pp.py``): 8 stages over 2
        processes, so the per-tick ``lax.ppermute`` activation hop at
        stage 3->4 rides DCN.

Each prints ``MULTIHOST_LOSS <pid> <loss>``; the parent asserts both
processes agree and that the value matches a single-process oracle.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [mode]
"""
import os
import sys

pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

from moleculediffusiontransformer_tpu.parallel import (
    distributed_init, make_global_mesh, place_global,
    process_local_batch_size, replicate_global, shard_batch_global)

# shutdown_timeout covers the compile-time skew between workers: the slow
# worker may still be jit-compiling minutes after the fast one exits.
distributed_init(coordinator_address=f"localhost:{port}",
                 num_processes=n_proc, process_id=pid,
                 shutdown_timeout_seconds=900,
                 initialization_timeout=300)

import numpy as np

# NB: jax.devices() is GLOBAL in multi-process; index 0 may belong to
# another process.  Local work must pin to an addressable device.
cpu0 = jax.local_devices(backend="cpu")[0]
mesh = make_global_mesh(axis_name="stage" if mode == "pp" else "data",
                        backend="cpu")
assert mesh.devices.size == 8, mesh.devices

# Warm-up collective: form the 8-device gloo context NOW, while both
# processes are within seconds of each other — the jit compiles below take
# minutes and the skew would exceed gloo's 30 s rendezvous timeout if the
# first collective happened there.
from jax.sharding import NamedSharding, PartitionSpec as P

_ones = place_global(mesh, np.ones(8, np.float32), P(mesh.axis_names[0]))
_tot = jax.jit(lambda x: x.sum(),
               out_shardings=NamedSharding(mesh, P()))(_ones)
assert float(_tot) == 8.0, float(_tot)


def run_diffusion_step() -> float:
    """dp/fsdp: one production diffusion train step on the global mesh."""
    import jax.numpy as jnp

    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.models import QMDiffusion
    from moleculediffusiontransformer_tpu.train import (
        TrainState, make_diffusion_train_step, make_optimizer)

    with jax.default_device(cpu0):
        model = QMDiffusion(
            max_length=16, channels=32, pred_dim=8, text_embed_dim=16,
            embed_dim_position=16, context_embedding_max_length=12,
            multipliers=(1, 2), factors=(2,), num_blocks=(1,),
            attentions=(1,), attention_heads=2, attention_features=16,
            pre_transformer=1, patch_size=1)
        key = jax.random.PRNGKey(0)

        global_batch = 8
        local = process_local_batch_size(global_batch, mesh)
        rng = np.random.RandomState(7)
        cond_g = rng.randn(global_batch, 12).astype(np.float32)
        target_g = rng.randn(global_batch, model.max_length,
                             model.pred_dim).astype(np.float32)
        lo = pid * local
        cond_l, target_l = cond_g[lo:lo + local], target_g[lo:lo + local]

        variables = jax.jit(model.init)(key, jnp.asarray(cond_g[:2]),
                                        jnp.asarray(target_g[:2]), key)
        tx = make_optimizer(TrainConfig())
        state = TrainState.create(variables["params"], tx)

        if mode == "fsdp":
            # params + Adam moments sharded over the global 'data' axis:
            # the step's param all-gathers / grad reduce-scatters cross DCN
            from moleculediffusiontransformer_tpu.parallel import (
                fsdp_specs, state_sharding)
            host_state = jax.tree_util.tree_map(np.asarray, state)
            specs = fsdp_specs(host_state, mesh, min_elements=256)
            state_g = place_global(mesh, host_state, specs)
            step = make_diffusion_train_step(
                model, tx, donate=False,
                state_sharding=state_sharding(specs, mesh))
        else:
            state_g = replicate_global(mesh, state)
            step = make_diffusion_train_step(model, tx, donate=False)

        key_g = replicate_global(mesh, key)
        cond_s, target_s = shard_batch_global(mesh, (cond_l, target_l))
        assert cond_s.shape == (global_batch, 12), cond_s.shape

        if os.environ.get("MDT_TEST_FUSED_INTERPRET"):
            # fusion x distribution composition: run the SAME step through
            # the Pallas megakernel (interpret mode on the CPU mesh) — the
            # parent asserts the all-reduced loss equals the unfused oracle
            from moleculediffusiontransformer_tpu.ops import (
                transformer_fusion as tf)
            tf._INTERPRET = True
            tf.enable_fusion(True)

        state_g, loss = step(state_g, cond_s, target_s, key_g)
        loss = float(loss)
        assert int(state_g.step) == 1
        return loss


def run_pipeline() -> float:
    """pp: the GPipe trunk pipeline, 8 stages spanning the 2 processes."""
    import jax.numpy as jnp

    from moleculediffusiontransformer_tpu.models import MoleculeTransformer
    from moleculediffusiontransformer_tpu.parallel.pp import (
        make_layer_apply, pipeline_layers, split_microbatches,
        stack_layer_params)

    with jax.default_device(cpu0):
        model = MoleculeTransformer(
            dim=32, depth=8, logits_dim=6, dim_head=8, heads=4,
            text_embed_dim=16, max_text_len=12, pos_fourier_graph_dim=8)
        rng = np.random.RandomState(7)
        seq = np.linspace(-1, 1, 4 * 12).reshape(4, 12).astype(np.float32)
        vecs = rng.randn(4, 5, 6).astype(np.float32)
        params = jax.tree_util.tree_map(np.asarray, model.init(
            jax.random.PRNGKey(0), jnp.asarray(seq), jnp.asarray(vecs),
            cond_drop_prob=0.0)["params"])

        # embedding/conditioning run replicated on the local device (tiny,
        # identical across processes); only the trunk streams over 'stage'
        def pre(mdl, sequences, output):
            cond = mdl.embed_conditioning(sequences)
            x = mdl.embed_vectors(output)
            cond, text_mask = mdl._text_mask(cond, None, 0.0, None)
            return mdl.init_norm(x), cond, text_mask

        x, cond, text_mask = model.apply(
            {"params": params}, jnp.asarray(seq), jnp.asarray(vecs),
            method=pre)
        x_m, cond_m, mask_m = (np.asarray(split_microbatches(a, 4))
                               for a in (x, cond, text_mask))

    stacked, rest = stack_layer_params(params, model.depth)
    stacked = jax.tree_util.tree_map(np.asarray, stacked)
    stacked_g = place_global(mesh, stacked, P("stage"))
    rest_g = replicate_global(mesh, rest)
    x_g, cond_g, mask_g = (replicate_global(mesh, a)
                           for a in (x_m, cond_m, mask_m))
    y_m = pipeline_layers(mesh, make_layer_apply(model), stacked_g, rest_g,
                          x_g, cond_g, mask_g)
    return float(jnp.mean(jnp.square(y_m)))


loss = run_pipeline() if mode == "pp" else run_diffusion_step()
assert np.isfinite(loss), loss
print(f"MULTIHOST_LOSS {pid} {loss:.10f}", flush=True)
