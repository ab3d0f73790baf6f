"""AOT serving artifacts via ``jax.export`` — compile once, serve anywhere.

The production serving story for the reference is "load the torch
checkpoint, re-run the notebook" (reference `README.md:44-60`); here the
whole jitted sampling program (64-step CFG ADPM2 scan, reference
`generative.py:834-870`) is serialized to a portable StableHLO artifact a
serving process deserializes and calls — no model code, no Flax, no
Python retrace.  Params stay ARGUMENTS of the artifact, so one export
pairs with any checkpoint of the same architecture (swap checkpoints
without re-exporting).

Why this is TPU-native rather than a torchscript analog: the artifact is
the already-staged XLA program — on load, the serving host pays only the
backend compile (which the persistent compilation cache makes a one-time
cost per fleet), and the exported program embeds the same sharding
annotations the live path uses, so a mesh-sharded export serves
batch-parallel unchanged.

Notes
-----
- Artifacts are exported for explicit ``platforms`` (e.g. export on a CPU
  build host, serve on TPU).  Default: the process's default platform.
- The Pallas megakernel lowers to a ``tpu_custom_call`` that is stable
  only within a Mosaic version window; exports therefore run the pure
  XLA composition by default (output-identical — PERF.md: 16/16 decoded
  molecules match).  Pass ``allow_tpu_custom_calls=True`` to export the
  fused path for a same-fleet TPU deployment.
- The PRNG key argument is the classic ``uint32[2]`` key
  (``jax.random.PRNGKey``), the stable wire format.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = [
    "export_jit", "export_sampler", "export_inpainter", "export_generator",
    "export_encoder", "variables_skeleton",
    "compile_jit_executable", "load_executable",
    "save_artifact", "load_artifact", "load_bundle",
    "serialize", "deserialize",
]


def _spec_tree(tree: Any, sharding=None) -> Any:
    """ShapeDtypeStruct skeleton of an array pytree (params -> specs).
    ShapeDtypeStruct leaves (e.g. from ``jax.eval_shape``) pass through.
    ``sharding`` (optional) is attached to every leaf — the exported
    program then records the GSPMD partitioning per argument."""
    def one(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            if sharding is None:
                return x
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        x = jnp.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    return jax.tree_util.tree_map(one, tree)


def _mesh_shardings(mesh, axis_name: str):
    """(replicated, batch-sharded) NamedShardings for a serving mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis_name))


def export_jit(fn: Callable, *arg_specs: Any,
               platforms: Optional[Sequence[str]] = None,
               allow_tpu_custom_calls: bool = False) -> jexport.Exported:
    """Export ``jit(fn)`` called with ``arg_specs`` (arrays or
    ShapeDtypeStructs; pytrees allowed) to a portable ``Exported``."""
    specs = tuple(_spec_tree(a) for a in arg_specs)
    kwargs: dict = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if allow_tpu_custom_calls:
        kwargs["disabled_checks"] = (
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),)
    return jexport.export(jax.jit(fn), **kwargs)(*specs)


def compile_jit_executable(fn: Callable, *arg_specs: Any) -> bytes:
    """AOT-compile ``jit(fn)`` at ``arg_specs`` on THIS process's backend
    and serialize the **compiled executable** (``jax.experimental
    .serialize_executable``) — the fast-path serving tier.

    The StableHLO artifact is portable but measurably slower once
    re-compiled by the serving host: ``jax.export`` must decompose
    backend-lowered ops (chlo.erf/erfc/erf_inv & co) into portable
    polynomial StableHLO, and the re-compiled program loses the live
    trace's fusions (tools/diag_export_overhead.py: 256 vs 383 mol/s at
    the bench geometry, identical across eager/jit/roundtrip dispatch).
    The serialized executable IS the live-compiled program — same bytes
    XLA produced for the live ``jit`` — so serving replays live
    performance exactly.  The cost is portability: it only loads on the
    same platform/device-kind/jax-version fleet, which ``load_executable``
    enforces; ``ArtifactServer`` falls back to the StableHLO tier when
    loading fails (mixed fleets stay served, just slower).
    """
    import pickle

    from jax.experimental import serialize_executable as se

    specs = tuple(_spec_tree(a) for a in arg_specs)
    compiled = jax.jit(fn).lower(*specs).compile()
    payload, in_tree, out_tree = se.serialize(compiled)
    dev = jax.devices()[0]
    return pickle.dumps({
        "payload": payload, "in_tree": in_tree, "out_tree": out_tree,
        "platform": dev.platform, "device_kind": dev.device_kind,
        "jax_version": jax.__version__,
        # deserialize_and_load defaults execution_devices to ALL local
        # devices; pin the count the program was actually built for
        "num_devices": len(
            compiled._executable.xla_executable.local_devices()),
    })


def load_executable(blob: bytes) -> Callable:
    """Load a ``compile_jit_executable`` blob into a callable.  Raises
    ``RuntimeError`` when the blob was compiled for a different
    platform/device-kind/jax-version than this process (callers fall
    back to the portable StableHLO tier)."""
    import pickle

    from jax.experimental import serialize_executable as se

    import os

    d = pickle.loads(blob)
    dev = jax.devices()[0]
    want = (d["platform"], d["device_kind"], d["jax_version"])
    have = (dev.platform, dev.device_kind, jax.__version__)
    if want != have:
        raise RuntimeError(f"executable compiled for {want}, host is {have}")
    if d["platform"] == "cpu" and not os.environ.get("MDT_EXEC_TIER_CPU"):
        # XLA:CPU AOT deserialization pins compile-host machine features
        # and drops fusions the loader can't rebuild (observed:
        # "Buffer Definition Event: Function ... not found") — the tier
        # targets TPU fleets.  MDT_EXEC_TIER_CPU=1 opts in for experiments.
        raise RuntimeError("executable tier disabled on CPU hosts "
                           "(XLA:CPU AOT loading is unreliable; "
                           "set MDT_EXEC_TIER_CPU=1 to override)")
    n = d.get("num_devices", 1)
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise RuntimeError(f"executable needs {n} devices, host has "
                           f"{len(devices)}")
    return se.deserialize_and_load(d["payload"], d["in_tree"],
                                   d["out_tree"],
                                   execution_devices=devices)


def _key_spec(sharding=None) -> jax.ShapeDtypeStruct:
    if sharding is None:
        return jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=sharding)


def export_sampler(model, variables, *, batch: int,
                   num_steps: int = 100, cond_scale: float = 7.5,
                   clamp: bool = False, sigma_min: float = 1e-3,
                   sigma_max: float = 9.0, rho: float = 3.0,
                   num_conditioning: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None,
                   allow_tpu_custom_calls: bool = False,
                   mesh=None, axis_name: str = "data",
                   executable: bool = False):
    """Export the full CFG sampling program for ``model``.

    The artifact's calling convention is
    ``call(variables, sequences, key) -> (batch, max_length, pred_dim)``
    with ``sequences`` a ``(batch, num_conditioning)`` float32 array of
    property scalars (each becomes one conditioning token — reference
    `generative.py:812-826`; default: the model's
    ``context_embedding_max_length``, 12 for the QM9 presets) and ``key``
    a classic uint32[2] PRNG key.  Sampler hyperparameters (steps,
    cond_scale, schedule) are baked in — they select the traced program,
    exactly like the live `models.sample` static args.

    ``mesh``: export the batch-parallel serving program — params
    replicated, the batch axis of ``sequences`` (and the output) sharded
    over ``axis_name``, exactly the live ``generate_from_conditioning
    (mesh=...)`` partitioning.  The artifact records the GSPMD shardings
    and the device count; the serving fleet calls it under a same-shape
    mesh (``jax.set_mesh`` or sharded input arrays) and XLA partitions
    the whole scan across its chips.  ``batch`` must divide the mesh.

    ``executable=True``: additionally AOT-compile the LIVE program on
    this process's backend and return ``(exported, executable_blob)`` —
    the fleet-specific fast tier (see ``compile_jit_executable``); pass
    the blob to ``save_artifact(..., executable=...)``.
    """
    from ..models.qm_diffusion import sample
    from ..ops import transformer_fusion

    def fn(variables, sequences, key):
        with transformer_fusion.fused(allow_tpu_custom_calls):
            return sample(model, variables, sequences, key,
                          num_steps=num_steps, cond_scale=cond_scale,
                          clamp=clamp, sigma_min=sigma_min,
                          sigma_max=sigma_max, rho=rho)

    n_cond = (model.context_embedding_max_length
              if num_conditioning is None else num_conditioning)
    repl = batched = None
    if mesh is not None:
        if batch % mesh.devices.size:
            raise ValueError(f"batch {batch} must divide the "
                             f"{mesh.devices.size}-device mesh")
        repl, batched = _mesh_shardings(mesh, axis_name)
    cond = jax.ShapeDtypeStruct((batch, n_cond), jnp.float32,
                                sharding=batched)
    specs = (_spec_tree(variables, repl), cond, _key_spec(repl))
    exported = export_jit(fn, *specs, platforms=platforms,
                          allow_tpu_custom_calls=allow_tpu_custom_calls)
    if executable:
        return exported, compile_jit_executable(fn, *specs)
    return exported


def export_inpainter(model, variables, *, batch: int,
                     num_steps: int = 100, num_resamples: int = 1,
                     cond_scale: float = 7.5, sigma_min: float = 1e-3,
                     sigma_max: float = 9.0, rho: float = 3.0,
                     num_conditioning: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None,
                     allow_tpu_custom_calls: bool = False,
                     executable: bool = False):
    """Export the RePaint inpainting program (reference
    `generative.py:871-914`): ``call(variables, sequences, source, mask,
    key)`` with ``source`` (b, L, pred_dim) float32 and ``mask`` the
    same shape, bool (True = keep from source)."""
    from ..models.qm_diffusion import inpaint
    from ..ops import transformer_fusion

    def fn(variables, sequences, source, mask, key):
        with transformer_fusion.fused(allow_tpu_custom_calls):
            return inpaint(model, variables, sequences, source, mask, key,
                           num_steps=num_steps,
                           num_resamples=num_resamples,
                           cond_scale=cond_scale, sigma_min=sigma_min,
                           sigma_max=sigma_max, rho=rho)

    shape = (batch, model.max_length, model.pred_dim)
    n_cond = (model.context_embedding_max_length
              if num_conditioning is None else num_conditioning)
    cond = jax.ShapeDtypeStruct((batch, n_cond), jnp.float32)
    source = jax.ShapeDtypeStruct(shape, jnp.float32)
    mask = jax.ShapeDtypeStruct(shape, jnp.bool_)
    specs = (variables, cond, source, mask, _key_spec())
    exported = export_jit(fn, *specs, platforms=platforms,
                          allow_tpu_custom_calls=allow_tpu_custom_calls)
    if executable:
        return exported, compile_jit_executable(fn, *specs)
    return exported


def export_generator(model, variables, *, batch: int, start_len: int = 1,
                     tokens_to_generate: int = 63, cond_scale: float = 1.5,
                     temperature: float = 1.0, filter_thres: float = 0.9,
                     num_conditioning: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None,
                     executable: bool = False):
    """Export the KV-cached autoregressive CFG generation program for a
    Sequence-family transformer (reference `transformer.py:786-838`
    semantics; one jitted scan): ``call(variables, sequences, start_ids,
    key) -> (batch, start_len + tokens_to_generate)`` int32 token ids,
    with ``sequences`` the (batch, num_conditioning) property scalars and
    ``start_ids`` the (batch, start_len) prompt (the '@' start token for
    the QM9 presets)."""
    from ..models.transformers import generate_sequence

    def fn(variables, sequences, start_ids, key):
        return generate_sequence(model, variables, sequences, start_ids,
                                 key, tokens_to_generate=tokens_to_generate,
                                 cond_scale=cond_scale,
                                 temperature=temperature,
                                 filter_thres=filter_thres)

    n_cond = (model.max_text_len if num_conditioning is None
              else num_conditioning)
    cond = jax.ShapeDtypeStruct((batch, n_cond), jnp.float32)
    start = jax.ShapeDtypeStruct((batch, start_len), jnp.int32)
    specs = (variables, cond, start, _key_spec())
    exported = export_jit(fn, *specs, platforms=platforms)
    if executable:
        return exported, compile_jit_executable(fn, *specs)
    return exported


def export_encoder(model, variables, *, batch: int, max_length: int = 64,
                   platforms: Optional[Sequence[str]] = None,
                   executable: bool = False):
    """Export the forward property-regression program
    (``MoleculeTransformerSequenceEncoder`` — the single deterministic
    forward pass of reference `generative.py:1864-1913`):
    ``call(variables, ids) -> logits`` with ``ids`` (batch, max_length)
    int32 padded token ids (start/end chars included, keras padding) and
    ``logits`` the raw scaled-property output — apply
    ``scaler.inverse_transform`` host-side, as the live
    ``design.predict_properties_from_smiles_transformer`` does.

    With this, all four notebook workflows serve as AOT artifacts:
    inverse/forward diffusion (``export_sampler``), constrained design
    (``export_inpainter``), AR generation (``export_generator``), and
    property prediction (this)."""

    def fn(variables, ids):
        return model.apply(variables, ids)

    ids = jax.ShapeDtypeStruct((batch, max_length), jnp.int32)
    exported = export_jit(fn, variables, ids, platforms=platforms)
    if executable:
        return exported, compile_jit_executable(fn, variables, ids)
    return exported


def variables_skeleton(exported: jexport.Exported) -> Any:
    """Zero-filled pytree of the artifact's FIRST call argument (the
    variables), rebuilt from the artifact's own input specs — a serving
    process can restore a msgpack checkpoint into it without any model
    code: ``restore_checkpoint(path, {"params":
    variables_skeleton(art)["params"]})``."""
    import numpy as np
    flat = [np.zeros(a.shape, a.dtype) for a in exported.in_avals]
    args, _kwargs = jax.tree_util.tree_unflatten(exported.in_tree, flat)
    return args[0]


# --------------------------------------------------------- wire format --

def serialize(exported: jexport.Exported) -> bytes:
    return bytes(exported.serialize())


def deserialize(blob: bytes) -> jexport.Exported:
    return jexport.deserialize(bytearray(blob))


# .mdtx bundle envelope: MAGIC + 8-byte big-endian JSON-header length +
# JSON header + raw jax.export bytes.  The header makes serving
# self-contained: tokenizer vocabulary, property scaler, and (optionally)
# the novelty-reference corpus ride WITH the program, so a serving host
# needs only the .mdtx + a checkpoint — no training CSV, no model code
# (the reference's serving story needs the notebook, the CSV, and the
# .pt, `README.md:30-60`).  Headerless files (raw jax.export bytes, the
# pre-bundle format) still load.
_MAGIC = b"MDTX1\0"


def save_artifact(exported: jexport.Exported, path: str, *,
                  tokenizer=None, scaler=None,
                  training_smiles: Optional[Sequence[str]] = None,
                  executable: Optional[bytes] = None,
                  extra: Optional[dict] = None) -> None:
    """Write a serving bundle.  ``tokenizer`` (``CharTokenizer``) and
    ``scaler`` (``MinMaxScaler``) are embedded via their ``state_dict``;
    ``training_smiles`` (novelty reference set) and ``extra`` (free-form
    JSON metadata) are optional.  ``executable``: a
    ``compile_jit_executable`` blob — the fleet-specific fast tier
    (``export_*(..., executable=True)``); the portable StableHLO stays
    in the bundle as the fallback, so one .mdtx serves both same-fleet
    hosts (at live speed) and foreign hosts (portably)."""
    import json
    header = dict(extra or {})
    if tokenizer is not None:
        header["tokenizer"] = tokenizer.state_dict()
    if scaler is not None:
        header["scaler"] = scaler.state_dict()
    if training_smiles is not None:
        header["training_smiles"] = list(training_smiles)
    export_bytes = serialize(exported)
    if executable is not None:
        # export_len delimits the StableHLO section; the executable rides
        # after it.  Readers without the field treat the whole body as
        # StableHLO, so exec-less bundles stay byte-compatible.
        header["export_len"] = len(export_bytes)
    with open(path, "wb") as f:
        if header:
            blob = json.dumps(header).encode()
            f.write(_MAGIC + len(blob).to_bytes(8, "big") + blob)
        f.write(export_bytes)
        if executable is not None:
            f.write(executable)


def load_bundle(path: str) -> Tuple[jexport.Exported, dict]:
    """Load a serving artifact plus its (possibly empty) bundle header.
    When the bundle carries an executable tier, the raw blob is surfaced
    as ``header["executable"]`` (bytes — load via ``load_executable``)."""
    import json
    with open(path, "rb") as f:
        data = f.read()
    header: dict = {}
    if data.startswith(_MAGIC):
        n = int.from_bytes(data[len(_MAGIC):len(_MAGIC) + 8], "big")
        body_at = len(_MAGIC) + 8 + n
        header = json.loads(data[len(_MAGIC) + 8:body_at])
        data = data[body_at:]
    export_len = header.pop("export_len", None)
    if export_len is not None:
        header["executable"] = data[export_len:]
        data = data[:export_len]
    return deserialize(data), header


def load_artifact(path: str) -> jexport.Exported:
    """Load a serving artifact; invoke it with ``.call(*args)``."""
    return load_bundle(path)[0]
