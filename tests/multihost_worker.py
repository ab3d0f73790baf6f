"""Worker for tests/test_multihost.py — one process of a 2-process DCN run.

Each process owns 4 virtual CPU devices; the global mesh is 8 devices over
2 processes, so the gradient all-reduce crosses the process (DCN) boundary
through gloo collectives.  Runs ONE full diffusion train step with the
framework's production trainer and prints the loss; the parent asserts both
processes print the same loss and that it matches a single-process run on
the identical global batch.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

from moleculediffusiontransformer_tpu.parallel import (
    distributed_init, make_global_mesh, process_local_batch_size,
    replicate_global, shard_batch_global)

# shutdown_timeout covers the compile-time skew between workers: the slow
# worker may still be jit-compiling minutes after the fast one exits.
distributed_init(coordinator_address=f"localhost:{port}",
                 num_processes=n_proc, process_id=pid,
                 shutdown_timeout_seconds=900,
                 initialization_timeout=300)

import numpy as np

from moleculediffusiontransformer_tpu.core.config import TrainConfig
from moleculediffusiontransformer_tpu.models import QMDiffusion
from moleculediffusiontransformer_tpu.train import (
    TrainState, make_diffusion_train_step, make_optimizer)

# NB: jax.devices() is GLOBAL in multi-process; index 0 may belong to
# another process.  Local work must pin to an addressable device.
cpu0 = jax.local_devices(backend="cpu")[0]
mesh = make_global_mesh(backend="cpu")
assert mesh.devices.size == 8, mesh.devices

# Warm-up collective: form the 8-device gloo context NOW, while both
# processes are within seconds of each other — the train-step jit below
# compiles for minutes and the skew would exceed gloo's 30 s rendezvous
# timeout if the first collective happened there.
from jax.sharding import NamedSharding, PartitionSpec as P

_ones = shard_batch_global(mesh, np.ones(4, np.float32))
_tot = jax.jit(lambda x: x.sum(),
               out_shardings=NamedSharding(mesh, P()))(_ones)
assert float(_tot) == 8.0, float(_tot)

with jax.default_device(cpu0):
    model = QMDiffusion(
        max_length=16, channels=32, pred_dim=8, text_embed_dim=16,
        embed_dim_position=16, context_embedding_max_length=12,
        multipliers=(1, 2), factors=(2,), num_blocks=(1,), attentions=(1,),
        attention_heads=2, attention_features=16, pre_transformer=1,
        patch_size=1)
    key = jax.random.PRNGKey(0)

    global_batch = 8
    local = process_local_batch_size(global_batch, mesh)
    rng = np.random.RandomState(7)
    cond_g = rng.randn(global_batch, 12).astype(np.float32)
    target_g = rng.randn(global_batch, model.max_length,
                         model.pred_dim).astype(np.float32)
    lo = pid * local
    cond_l, target_l = cond_g[lo:lo + local], target_g[lo:lo + local]

    import jax.numpy as jnp
    variables = jax.jit(model.init)(key, jnp.asarray(cond_g[:2]),
                                    jnp.asarray(target_g[:2]), key)
    tx = make_optimizer(TrainConfig())
    state = TrainState.create(variables["params"], tx)

    state_g = replicate_global(mesh, state)
    key_g = replicate_global(mesh, key)
    cond_s, target_s = shard_batch_global(mesh, (cond_l, target_l))
    assert cond_s.shape == (global_batch, 12), cond_s.shape

    if os.environ.get("MDT_TEST_FUSED_INTERPRET"):
        # fusion x distribution composition: run the SAME step through the
        # Pallas megakernel (interpret mode on the CPU mesh) — the parent
        # asserts the all-reduced loss still equals the unfused oracle
        from moleculediffusiontransformer_tpu.ops import (
            transformer_fusion as tf)
        tf._INTERPRET = True
        tf.enable_fusion(True)

    step = make_diffusion_train_step(model, tx, donate=False)
    state_g, loss = step(state_g, cond_s, target_s, key_g)
    loss = float(loss)
    assert np.isfinite(loss), loss
    assert int(state_g.step) == 1
    print(f"MULTIHOST_LOSS {pid} {loss:.10f}", flush=True)
