"""Training: optax optimizer, jitted DP train step, epoch loops.

Re-design of the reference train loops (`generative.py:488-588,1082-1174,
1302-1533,1915-2073`): Adam(lr 2e-4) + global-norm clip 0.5
(`generative.py:1130-1134`), periodic eval + checkpoint.  Differences by
design:
  * the whole step (loss, backward, clip, update) is ONE jitted XLA program;
  * data parallelism via sharded batches on a ``('data',)`` mesh — XLA emits
    the psum over ICI (SURVEY §2.10 table);
  * checkpoints carry optimizer state + step (the reference loses both).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core.checkpoint import (latest_checkpoint, restore_checkpoint,
                               save_step_checkpoint)
from ..core.config import TrainConfig
from ..data.prefetch import ThreadedLoader, prefetch_to_device
from ..parallel.mesh import (batch_sharding, make_mesh, replicate,
                             shard_batch)


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + optimizer state + step counter."""
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Adam + global-norm clip, matching `generative.py:1130-1134`.

    ``lr_schedule="constant"`` (default) is reference parity; ``"cosine"``
    adds linear warmup over ``lr_warmup_steps`` then cosine decay to
    ``learning_rate * lr_min_ratio`` over ``lr_decay_steps`` — a
    beyond-reference production knob (the schedule is step-indexed, so
    resume-from-checkpoint restores it through the optimizer state)."""
    if config.lr_schedule == "constant":
        lr = config.learning_rate
    elif config.lr_schedule == "cosine":
        if config.lr_decay_steps is None:
            raise ValueError("lr_schedule='cosine' needs lr_decay_steps")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if config.lr_warmup_steps else config.learning_rate,
            peak_value=config.learning_rate,
            warmup_steps=config.lr_warmup_steps,
            decay_steps=config.lr_decay_steps,
            end_value=config.learning_rate * config.lr_min_ratio)
    else:
        raise ValueError(f"Unknown lr_schedule: {config.lr_schedule!r}")
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip_norm),
        optax.adam(lr),
    )


def make_diffusion_train_step(model, tx: optax.GradientTransformation,
                              donate: bool = True,
                              remat: bool = False,
                              accumulation_steps: int = 1,
                              state_sharding=None) -> Callable:
    """Jitted step for the QM diffusion models:
    ``state, (X, y), key -> state, loss`` where the model's __call__ is
    ``(conditioning, target, key) -> loss``.

    ``accumulation_steps=A`` splits the batch into A sequential microbatches
    inside the SAME jitted program (``lax.scan``) and averages the grads
    before the one optimizer update — the activation envelope becomes
    batch/A per chip (PERF.md: the 91M flagship's is ≤512) while the
    optimizer sees the full-batch gradient.  Each microbatch gets its own
    folded PRNG key, so the update equals the average of A independent
    half-batch grads (tested result-identical against exactly that).

    ``remat=True`` rematerializes the forward under ``jax.checkpoint`` —
    trades ~1 extra forward of FLOPs for activation memory.  Measured on
    hardware (PERF.md round 2): for the 91M flagship it does NOT raise the
    per-chip batch ceiling — batch 1024 crashes a single v5e with or
    without it; the envelope is ≤512/chip and costs ~13% with remat on.
    Scale batch via data parallelism or ``accumulation_steps`` instead;
    remat remains useful for deeper models.

    ``state_sharding`` (a ``NamedSharding`` pytree matching the state,
    e.g. ``parallel.fsdp.state_sharding(specs, mesh)``) pins the UPDATED
    state's placement so FSDP/TP layouts survive the step — without it
    GSPMD may re-replicate the output and silently forfeit the sharded
    optimizer's memory savings."""

    def loss_fn(params, conditioning, target, key):
        return model.apply({"params": params}, conditioning, target, key)

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    A = accumulation_steps
    assert A >= 1, accumulation_steps
    jit_kwargs = {"donate_argnums": (0,) if donate else ()}
    if state_sharding is not None:
        # (state, loss): pin the state, let the compiler place the loss
        jit_kwargs["out_shardings"] = (state_sharding, None)

    @partial(jax.jit, **jit_kwargs)
    def train_step(state: TrainState, conditioning, target, key):
        key = jax.random.fold_in(key, state.step)
        if A == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, conditioning, target, key)
        else:
            b = conditioning.shape[0]
            assert b % A == 0, (b, A)
            micro_c = conditioning.reshape((A, b // A) + conditioning.shape[1:])
            micro_t = target.reshape((A, b // A) + target.shape[1:])
            keys = jax.random.split(key, A)

            def body(carry, xs):
                loss_sum, grad_sum = carry
                mc, mt, mk = xs
                ls, gs = jax.value_and_grad(loss_fn)(state.params, mc, mt, mk)
                return (loss_sum + ls,
                        jax.tree_util.tree_map(jnp.add, grad_sum, gs)), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zeros),
                (micro_c, micro_t, keys))
            loss = loss_sum / A
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / A).astype(p.dtype), grad_sum, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    return train_step


def preflight_memory_check(train_step: Callable, state: TrainState,
                           *example_args, margin: float = 0.92) -> Dict:
    """Compile the step for the given shapes and verify it fits device HBM.

    An OOM-scale program on this TPU runtime is a hard worker crash, not a
    clean ``RESOURCE_EXHAUSTED`` (PERF.md remat-envelope table) — so the
    only safe failure mode is to never launch it.  Uses
    ``compiled.memory_analysis()`` (argument + output + temp − aliased)
    against the device's ``memory_stats()['bytes_limit']``; raises
    ``RuntimeError`` above ``margin``.  Returns the analysis dict.  On
    backends without memory stats (CPU test meshes) the check degrades to
    reporting only.
    """
    lowered = train_step.lower(state, *example_args)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    info: Dict[str, Any] = {"ok": True}
    if ma is None:                      # pragma: no cover - backend-specific
        return info
    try:
        total = int(ma.argument_size_in_bytes + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    except AttributeError:              # pragma: no cover - backend-specific
        return info
    info["estimated_bytes"] = total
    stats = None
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:                   # pragma: no cover - backend-specific
        pass
    limit = (stats or {}).get("bytes_limit")
    if limit:
        info["bytes_limit"] = int(limit)
        if total > margin * limit:
            info["ok"] = False
            raise RuntimeError(
                f"preflight: compiled train step needs ~{total / 1e9:.2f} GB "
                f"of device memory but the chip limit is {limit / 1e9:.2f} GB"
                f" (margin {margin}).  Reduce batch size or raise "
                f"TrainConfig.accumulation_steps (envelope: ≤512 samples/"
                f"chip for the 91M flagship, PERF.md).")
    return info


def make_transformer_train_step(model, tx: optax.GradientTransformation,
                                donate: bool = True) -> Callable:
    """Jitted step for the AR transformer decoders (CE loss with CFG
    conditioning dropout — reference `train_loop_transformer`,
    `generative.py:1302-1400`): ``state, (props, ids), key -> state, loss``."""

    def loss_fn(params, props, ids, key):
        return model.apply({"params": params}, props, ids, return_loss=True,
                           key=key)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, props, ids, key):
        key = jax.random.fold_in(key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, props, ids,
                                                  key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    return train_step


def make_gpt_train_step(model, tx: optax.GradientTransformation,
                        donate: bool = True, aux_loss_weight: float = 0.0,
                        ignore_padding_zeros: bool = False) -> Callable:
    """Jitted step for the unconditional GPT decoders (CE loss —
    reference `train_loop_GPT`, `generative.py` lineage):
    ``state, ids, key -> state, loss``.

    ``aux_loss_weight > 0`` adds the MoE load-balance loss the MoE FF
    layers sow (``nn/moe.py``; averaged over layers — Switch Transformer
    style, typical weight 1e-2).  Required for stable MoE training
    (``ff_num_experts > 0``); a no-op (and zero-cost) for dense models.
    """

    def loss_fn(params, ids, key):
        del key  # reserved for mask_prob variants; CE itself is pure
        if aux_loss_weight:
            loss, state = model.apply(
                {"params": params}, ids, return_loss=True,
                ignore_padding_zeros=ignore_padding_zeros,
                mutable=["aux_loss"])
            aux = jax.tree_util.tree_leaves(state.get("aux_loss", {}))
            if aux:
                loss = loss + aux_loss_weight * (
                    sum(jnp.sum(a) for a in aux) / len(aux))
            return loss
        return model.apply({"params": params}, ids, return_loss=True,
                           ignore_padding_zeros=ignore_padding_zeros)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, ids, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, ids, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    return train_step


def make_encoder_train_step(model, tx: optax.GradientTransformation,
                            donate: bool = True) -> Callable:
    """Jitted step for the forward encoder (MSE on (b, 1, 12) outputs —
    reference `train_loop_forward_transformer`, `generative.py:1915-2006`)."""

    def loss_fn(params, ids, targets):
        logits = model.apply({"params": params}, ids)
        preds = logits.reshape(logits.shape[0], -1)[:, :targets.shape[1]]
        return jnp.mean(jnp.square(preds - targets))

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, ids, targets):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, ids, targets)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    return train_step


@dataclass
class MetricsLogger:
    """JSONL-appending metrics log (replaces the reference's print+matplotlib
    observability, SURVEY §5)."""
    path: Optional[str] = None
    history: List[Dict] = field(default_factory=list)

    def log(self, **metrics) -> Dict:
        rec = {k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()}
        self.history.append(rec)
        if self.path:
            import json
            import os
            os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                        exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec


def train_diffusion(model, data_iter_fn: Callable[[], Iterable],
                    config: TrainConfig, *,
                    init_conditioning, init_target,
                    mesh=None,
                    eval_fn: Optional[Callable] = None,
                    checkpoint_dir: Optional[str] = None,
                    resume: bool = False,
                    swap_xy: bool = False,
                    logger: Optional[MetricsLogger] = None) -> Tuple[TrainState, MetricsLogger]:
    """Generic trainer for both QM diffusion directions.

    ``data_iter_fn()`` yields (X, y) host batches per epoch.  For the inverse
    model conditioning=y (properties), target=X (one-hot) — pass
    ``swap_xy=False`` with iterators already in (conditioning, target) order,
    or ``swap_xy=True`` to swap, mirroring ``train_loop_forward``'s role swap
    (`generative.py:525-533`).
    """
    logger = logger or MetricsLogger()
    mesh = mesh or make_mesh()
    tx = make_optimizer(config)

    orbax_ck = None
    if checkpoint_dir and config.checkpoint_backend == "orbax":
        from ..core.checkpoint_orbax import OrbaxCheckpointer
        orbax_ck = OrbaxCheckpointer(checkpoint_dir, async_save=True)

    def _save(state_, step_):
        if orbax_ck is not None:    # async: returns before the write lands
            orbax_ck.save(step_, jax.device_get(state_))
        else:
            save_step_checkpoint(checkpoint_dir, jax.device_get(state_),
                                 step_)

    rng = jax.random.PRNGKey(config.seed)
    params = model.init(rng, jnp.asarray(init_conditioning),
                        jnp.asarray(init_target), rng)["params"]
    state = TrainState.create(params, tx)
    state_specs = None          # replicated; or per-leaf FSDP PartitionSpecs
    state_out_sharding = None
    if config.param_sharding == "fsdp":
        from ..parallel.fsdp import (shard_state_fsdp,
                                     state_sharding as _fsdp_sharding)
        state, state_specs = shard_state_fsdp(
            state, mesh, min_elements=config.fsdp_min_elements)
        state_out_sharding = _fsdp_sharding(state_specs, mesh)
    else:
        assert config.param_sharding == "replicated", config.param_sharding
        state = replicate(mesh, state)

    def _place(host_state):
        """Put a host-restored state back into its mesh placement."""
        if state_specs is None:
            return replicate(mesh, host_state)
        from jax.sharding import NamedSharding
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            host_state, state_specs)

    if resume and checkpoint_dir:
        if orbax_ck is not None:
            if orbax_ck.latest_step() is not None:
                # sharded restore: leaves land DIRECTLY in their mesh
                # placement (no full-tree host staging then re-shard)
                from ..core.checkpoint_orbax import shard_restore_target
                state = orbax_ck.restore(
                    shard_restore_target(state, mesh,
                                         param_spec=state_specs))
        else:
            ckpt = latest_checkpoint(checkpoint_dir)
            if ckpt:
                state = _place(restore_checkpoint(ckpt, state))

    train_step = make_diffusion_train_step(
        model, tx, accumulation_steps=config.accumulation_steps,
        state_sharding=state_out_sharding)
    data_key = jax.random.PRNGKey(config.seed + 1)

    t0 = time.time()
    samples_seen = 0
    preflighted = False

    # input pipeline: worker-thread batch assembly + device lookahead
    # (data/prefetch.py) when config.prefetch > 0, else synchronous feed
    loader = (ThreadedLoader(data_iter_fn) if config.prefetch > 0 else None)

    def device_batches():
        def host_batches():
            for X, y in (data_iter_fn() if loader is None
                         else loader.epoch()):
                cond, target = (y, X) if not swap_xy else (X, y)
                yield (np.asarray(cond), np.asarray(target))

        if loader is None:
            for batch in host_batches():
                yield shard_batch(mesh, batch)
            return
        yield from prefetch_to_device(host_batches(), mesh,
                                      size=config.prefetch)

    # host-side step counter: int(state.step) every iteration would force
    # a device sync per step and serialize the dispatch pipeline the
    # prefetch lookahead exists to keep full — only loss/eval logging
    # touches device values
    step = int(state.step)
    try:
        for epoch in range(config.epochs):
            for cond, target in device_batches():
                if config.preflight_memory_check and not preflighted:
                    preflight_memory_check(train_step, state, cond, target,
                                           data_key)
                    preflighted = True
                state, loss = train_step(state, cond, target, data_key)
                samples_seen += cond.shape[0]
                step += 1
                if step % config.print_loss_every == 0:
                    elapsed = time.time() - t0
                    logger.log(step=step, epoch=epoch, loss=float(loss),
                               samples_per_sec=samples_seen / max(elapsed,
                                                                  1e-9))
                # in-epoch eval + checkpoint cadence (reference evals/saves
                # every print_loss steps inside the epoch,
                # `generative.py:1139-1172` — essential when one epoch is
                # huge)
                if (config.eval_every_steps
                        and step % config.eval_every_steps == 0):
                    if eval_fn is not None:
                        metrics = eval_fn(state)
                        logger.log(step=step, epoch=epoch, in_epoch=True,
                                   **metrics)
                    if checkpoint_dir:
                        _save(state, step)
            if eval_fn is not None:
                metrics = eval_fn(state)
                logger.log(step=step, epoch=epoch, **metrics)
            if checkpoint_dir and (
                    (epoch + 1) % config.checkpoint_every_epochs == 0
                    or epoch == config.epochs - 1):
                _save(state, step)
    finally:
        if loader is not None:
            loader.close()
        if orbax_ck is not None:
            orbax_ck.close()    # block until async saves commit
    return state, logger
