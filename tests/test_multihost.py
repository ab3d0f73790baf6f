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


def _run_two_process(mode: str, fused: bool = False) -> float:
    """Launch the 2-process worker pair; return the agreed global loss."""
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
             str(i), "2", str(port), mode],
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
    return losses[0]


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_two_process_dcn_train_step_matches_single_process(fused):
    """fused=True additionally pins kernel x sharding composition: the
    workers run the train step through the Pallas megakernel (interpret
    mode) and the all-reduced loss must still equal the unfused oracle."""
    loss = _run_two_process("dp", fused=fused)
    oracle = _single_process_loss()
    # fused interpret kernels agree with the composition to ~1e-6 relative
    np.testing.assert_allclose(loss, oracle, rtol=1e-5 if fused else 1e-6)


@pytest.mark.slow
def test_two_process_dcn_fsdp_step_matches_single_process():
    """FSDP across the process boundary: params + Adam state sharded over
    the global 'data' axis, so the step's just-in-time param all-gathers
    and gradient reduce-scatters cross DCN.  Same model/batch/seed as the
    dp mode, so the dp oracle is the truth (FSDP == replicated DP up to
    reduction order, parallel/fsdp.py numerics note)."""
    loss = _run_two_process("fsdp")
    np.testing.assert_allclose(loss, _single_process_loss(), rtol=1e-5)


def _single_process_pp_loss() -> float:
    """Oracle: the worker's exact pp setup run SEQUENTIALLY (layer loop on
    one local device) — pins that the 2-process GPipe schedule with its
    cross-process ppermute hop changes nothing."""
    import jax.numpy as jnp
    from moleculediffusiontransformer_tpu.models import MoleculeTransformer
    from moleculediffusiontransformer_tpu.parallel.pp import (
        make_layer_apply, stack_layer_params)

    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        model = MoleculeTransformer(
            dim=32, depth=8, logits_dim=6, dim_head=8, heads=4,
            text_embed_dim=16, max_text_len=12, pos_fourier_graph_dim=8)
        rng = np.random.RandomState(7)
        seq = np.linspace(-1, 1, 4 * 12).reshape(4, 12).astype(np.float32)
        vecs = rng.randn(4, 5, 6).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(seq),
                            jnp.asarray(vecs), cond_drop_prob=0.0)["params"]

        def pre(mdl, sequences, output):
            cond = mdl.embed_conditioning(sequences)
            x = mdl.embed_vectors(output)
            cond, text_mask = mdl._text_mask(cond, None, 0.0, None)
            return mdl.init_norm(x), cond, text_mask

        x, cond, mask = model.apply({"params": params}, jnp.asarray(seq),
                                    jnp.asarray(vecs), method=pre)
        stacked, rest = stack_layer_params(params, model.depth)
        apply_layer = make_layer_apply(model)
        for i in range(model.depth):
            lp = jax.tree_util.tree_map(lambda a: a[i], stacked)
            x = apply_layer(lp, rest, x, cond, mask)
        return float(jnp.mean(jnp.square(x)))


@pytest.mark.slow
def test_two_process_dcn_pipeline_matches_sequential():
    """8 pipeline stages over 2 processes: the stage-3 -> stage-4 activation
    ppermute rides the process (DCN) boundary every tick; output must equal
    the sequential layer stack."""
    loss = _run_two_process("pp")
    np.testing.assert_allclose(loss, _single_process_pp_loss(), rtol=1e-5)
