"""Multi-host (DCN) data parallelism — a REAL 2-process run.

The reference is single-device (SURVEY §2.10); this validates the
framework's scale-out path: two OS processes, each owning 4 virtual CPU
devices, form one 8-device global mesh via ``jax.distributed``; the
gradient all-reduce crosses the process boundary (the CPU stand-in for
DCN).  Equivalence oracle: the same global batch through the same trainer
on a single-process 8-device mesh must produce the identical loss.
"""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    """The oracle: same step, same global batch, 8-device local CPU mesh."""
    from moleculediffusiontransformer_tpu.core.config import TrainConfig
    from moleculediffusiontransformer_tpu.models import QMDiffusion
    from moleculediffusiontransformer_tpu.parallel import (make_mesh,
                                                           replicate,
                                                           shard_batch)
    from moleculediffusiontransformer_tpu.train import (
        TrainState, make_diffusion_train_step, make_optimizer)

    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        model = QMDiffusion(
            max_length=16, channels=32, pred_dim=8, text_embed_dim=16,
            embed_dim_position=16, context_embedding_max_length=12,
            multipliers=(1, 2), factors=(2,), num_blocks=(1,),
            attentions=(1,), attention_heads=2, attention_features=16,
            pre_transformer=1, patch_size=1)
        key = jax.random.PRNGKey(0)
        rng = np.random.RandomState(7)
        cond = rng.randn(8, 12).astype(np.float32)
        target = rng.randn(8, model.max_length,
                           model.pred_dim).astype(np.float32)
        variables = jax.jit(model.init)(key, jnp.asarray(cond[:2]),
                                        jnp.asarray(target[:2]), key)
        tx = make_optimizer(TrainConfig())
        state = TrainState.create(variables["params"], tx)
        mesh = make_mesh(8, backend="cpu")
        state = replicate(mesh, state)
        cond_s, target_s = shard_batch(mesh, (cond, target))
        key_s = replicate(mesh, key)
        step = make_diffusion_train_step(model, tx, donate=False)
        _, loss = step(state, cond_s, target_s, key_s)
        return float(loss)


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_two_process_dcn_train_step_matches_single_process(fused):
    """fused=True additionally pins kernel x sharding composition: the
    workers run the train step through the Pallas megakernel (interpret
    mode) and the all-reduced loss must still equal the unfused oracle."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    env["JAX_PLATFORMS"] = ""   # let the worker pick backends explicitly
    if fused:
        env["MDT_TEST_FUSED_INTERPRET"] = "1"
    else:
        env.pop("MDT_TEST_FUSED_INTERPRET", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    if any(p.returncode != 0 for p in procs):
        raise AssertionError(
            "worker failed:\n" + "\n".join(
                f"--- worker {i} rc={p.returncode} ---\n{out}"
                for i, (p, out) in enumerate(zip(procs, outs))))

    losses = {}
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS (\d) ([-\d.einf]+)", out)
        assert m, f"no loss line in:\n{out}"
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    # both processes see the identical (all-reduced) global loss
    assert losses[0] == losses[1], losses

    oracle = _single_process_loss()
    # fused interpret kernels agree with the composition to ~1e-6 relative
    np.testing.assert_allclose(losses[0], oracle,
                               rtol=1e-5 if fused else 1e-6)
