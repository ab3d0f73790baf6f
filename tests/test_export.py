"""AOT serving artifacts (`design/export.py`): the serialized StableHLO
program must reproduce the live jitted path bit-for-bit after a
bytes roundtrip, with params remaining swappable arguments."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculediffusiontransformer_tpu.design import export as dexport
from moleculediffusiontransformer_tpu.models import QMDiffusion, sample
from moleculediffusiontransformer_tpu.models.qm_diffusion import inpaint

CPU = jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def tiny_sampler():
    model = QMDiffusion(
        max_length=16, channels=16, pred_dim=8, text_embed_dim=16,
        embed_dim_position=8, context_embedding_max_length=12,
        multipliers=(1, 2), factors=(2,), num_blocks=(1,),
        attentions=(1,), attention_heads=2, attention_features=8,
        pre_transformer=1, patch_size=1)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        props = jnp.zeros((2, 12))
        target = jnp.zeros((2, model.max_length, model.pred_dim))
        variables = jax.jit(model.init)(key, props, target, key)
    return model, variables


def test_export_sampler_roundtrip_matches_live(tiny_sampler):
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=4, num_steps=8, cond_scale=2.0,
            platforms=("cpu",))
        art = dexport.deserialize(dexport.serialize(exported))

        key = jax.random.PRNGKey(7)
        props = jax.random.uniform(key, (4, 12), minval=-1.0, maxval=1.0)
        live = sample(model, variables, props, key, num_steps=8,
                      cond_scale=2.0)
        served = art.call(variables, props, key)
    assert served.shape == (4, model.max_length, model.pred_dim)
    np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                               rtol=1e-6, atol=1e-6)


def test_export_params_stay_swappable(tiny_sampler):
    """One artifact, two checkpoints: the params are call arguments, so a
    different param tree must change the output (nothing was baked in)."""
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        key = jax.random.PRNGKey(3)
        props = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
        out_a = exported.call(variables, props, key)
        bumped = jax.tree_util.tree_map(lambda p: p + 0.05, variables)
        out_b = exported.call(bumped, props, key)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_export_multi_platform_and_file_roundtrip(tiny_sampler, tmp_path):
    """Cross-platform export (build on CPU host, serve on TPU): the
    artifact records both platforms and still executes on CPU here."""
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu", "tpu"))
        assert tuple(p.lower() for p in exported.platforms) == ("cpu",
                                                                "tpu")
        path = str(tmp_path / "sampler.mdtx")
        dexport.save_artifact(exported, path)
        art = dexport.load_artifact(path)
        key = jax.random.PRNGKey(11)
        props = jnp.zeros((2, 12), jnp.float32)
        out = art.call(variables, props, key)
    assert np.isfinite(np.asarray(out)).all()


def test_export_inpainter_roundtrip_matches_live(tiny_sampler):
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_inpainter(
            model, variables, batch=2, num_steps=4, num_resamples=1,
            cond_scale=2.0, platforms=("cpu",))
        art = dexport.deserialize(dexport.serialize(exported))

        key = jax.random.PRNGKey(5)
        props = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
        source = jax.random.normal(
            jax.random.PRNGKey(6), (2, model.max_length, model.pred_dim))
        mask = jnp.zeros(source.shape, bool).at[:, :4, :].set(True)
        live = inpaint(model, variables, props, source, mask, key,
                       num_steps=4, num_resamples=1, cond_scale=2.0)
        served = art.call(variables, props, source, mask, key)
    np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                               rtol=1e-6, atol=1e-6)


def test_export_sampler_mesh_sharded_matches_single_device(tiny_sampler):
    """Mesh-sharded export: the artifact records the batch-over-'data'
    GSPMD partitioning and, called on an 8-device CPU mesh with sharded
    inputs, reproduces the single-device artifact (same global noise draw
    for an even batch, `design/inverse_design.py:179-185`; tolerance, not
    bit-identity: the partitioned and unpartitioned programs are separate
    compilations whose elementwise fusion/FMA contraction may differ)."""
    from moleculediffusiontransformer_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch)
    model, variables = tiny_sampler
    mesh = make_mesh(8, backend="cpu")
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=8, num_steps=4, cond_scale=2.0,
            platforms=("cpu",), mesh=mesh)
        assert exported.nr_devices == 8
        art = dexport.deserialize(dexport.serialize(exported))

        key = jax.random.PRNGKey(9)
        props = jax.random.uniform(key, (8, 12), minval=-1.0, maxval=1.0)
        sharded = art.call(replicate(mesh, variables),
                           shard_batch(mesh, props),
                           replicate(mesh, key))

        single = dexport.export_sampler(
            model, variables, batch=8, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        ref = single.call(variables, props, key)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_export_sampler_mesh_requires_even_batch(tiny_sampler):
    from moleculediffusiontransformer_tpu.parallel.mesh import make_mesh
    model, variables = tiny_sampler
    mesh = make_mesh(8, backend="cpu")
    with pytest.raises(ValueError, match="divide"):
        dexport.export_sampler(model, variables, batch=6, num_steps=4,
                               platforms=("cpu",), mesh=mesh)


def test_export_generator_roundtrip_matches_live():
    """AR-generation artifact (KV-cached CFG scan) must reproduce the live
    generate_sequence token-for-token after a bytes roundtrip."""
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequence)
    from moleculediffusiontransformer_tpu.models.transformers import (
        generate_sequence)
    model = MoleculeTransformerSequence(dim=32, depth=2, logits_dim=24,
                                        dim_head=8, heads=4,
                                        text_embed_dim=16, max_text_len=12)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        props = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
        start = jnp.ones((2, 1), jnp.int32)
        variables = model.init(key, props, start, cond_drop_prob=0.0)

        exported = dexport.export_generator(
            model, variables, batch=2, start_len=1, tokens_to_generate=6,
            cond_scale=1.5, platforms=("cpu",))
        art = dexport.deserialize(dexport.serialize(exported))

        gkey = jax.random.PRNGKey(3)
        live = generate_sequence(model, variables, props, start, gkey,
                                 tokens_to_generate=6, cond_scale=1.5)
        served = art.call(variables, props, start, gkey)
    assert served.shape == (2, 7)
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))


def test_export_encoder_roundtrip_matches_live():
    """Forward property-regression artifact: logits must equal the live
    encoder apply bit-for-bit after a bytes roundtrip."""
    from moleculediffusiontransformer_tpu.models import (
        MoleculeTransformerSequenceEncoder)
    model = MoleculeTransformerSequenceEncoder(
        dim=32, depth=2, heads=4, ff_mult=2, logits_dim=1,
        logits_dim_length=12, max_length=16, max_tokens=24, embed_dim=8)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        ids = jax.random.randint(key, (3, 16), 0, 24)
        variables = model.init(key, ids)
        exported = dexport.export_encoder(model, variables, batch=3,
                                          max_length=16, platforms=("cpu",))
        art = dexport.deserialize(dexport.serialize(exported))
        # jit the oracle: eager vs compiled differ by fusion rounding
        # (~2e-7); the artifact must match the COMPILED program exactly
        live = jax.jit(model.apply)(variables, ids)
        served = art.call(variables, ids)
    assert served.shape == live.shape
    np.testing.assert_array_equal(np.asarray(served), np.asarray(live))


def test_variables_skeleton_restores_checkpoint(tiny_sampler, tmp_path):
    """Serving without model code: rebuild the params tree from the
    artifact's own input specs, restore a msgpack checkpoint into it, and
    reproduce the live model's output exactly."""
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        restore_checkpoint, save_checkpoint)
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        art = dexport.deserialize(dexport.serialize(exported))

        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, jax.device_get(variables))

        skel = dexport.variables_skeleton(art)
        assert jax.tree_util.tree_structure(skel) == \
            jax.tree_util.tree_structure(jax.device_get(variables))
        restored = restore_checkpoint(path, skel)

        key = jax.random.PRNGKey(2)
        props = jnp.zeros((2, 12), jnp.float32)
        a = art.call(restored, props, key)
        b = art.call(variables, props, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_artifact_server_end_to_end(tiny_sampler, tmp_path):
    """design.ArtifactServer: kind detection from the artifact's own
    specs, checkpoint restore into the skeleton, and padded serving — a
    2-row request through a batch-4 artifact equals the direct
    full-batch call's first 2 rows."""
    from moleculediffusiontransformer_tpu.core.checkpoint import (
        save_checkpoint)
    from moleculediffusiontransformer_tpu.design import ArtifactServer
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=4, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        art_path = str(tmp_path / "s.mdtx")
        dexport.save_artifact(exported, art_path)
        ck_path = str(tmp_path / "ck.msgpack")
        save_checkpoint(ck_path, jax.device_get(variables))

        server = ArtifactServer(art_path, ck_path)
        assert server.kind == "sampler" and server.batch == 4

        key = jax.random.PRNGKey(5)
        props = np.asarray(
            jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0))
        served = server.call_padded(props, key=key)

        full = np.concatenate([props, np.repeat(props[:1], 2, 0)], 0)
        direct = exported.call(variables, jnp.asarray(full), key)
    assert served.shape == (2, model.max_length, model.pred_dim)
    np.testing.assert_array_equal(served, np.asarray(direct)[:2])

    with pytest.raises(ValueError):
        server.call_padded(np.zeros((5, 12), np.float32))  # > batch


def test_artifact_server_placeholder_params_deterministic(tiny_sampler,
                                                          tmp_path):
    """No checkpoint -> seeded placeholder params (smoke mode): same seed
    gives the same params, different seed different ones."""
    from moleculediffusiontransformer_tpu.design import ArtifactServer
    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        art_path = str(tmp_path / "s.mdtx")
        dexport.save_artifact(exported, art_path)
        a = ArtifactServer(art_path, seed=0).variables
        b = ArtifactServer(art_path, seed=0).variables
        c = ArtifactServer(art_path, seed=1).variables
    la, lb, lc = (jax.tree_util.tree_leaves(t) for t in (a, b, c))
    assert all(np.array_equal(x, y) for x, y in zip(la, lb))
    assert not all(np.array_equal(x, y) for x, y in zip(la, lc))


def test_artifact_bundle_roundtrip_and_backcompat(tiny_sampler, tmp_path):
    """save_artifact with tokenizer/scaler/novelty corpus writes a
    self-contained bundle: load_bundle returns the header, load_artifact
    still returns a working program, ArtifactServer exposes the embedded
    objects, and headerless (raw jax.export) files still load."""
    from moleculediffusiontransformer_tpu.data.preprocess import MinMaxScaler
    from moleculediffusiontransformer_tpu.data.tokenizer import CharTokenizer
    from moleculediffusiontransformer_tpu.design import ArtifactServer
    model, variables = tiny_sampler
    tok = CharTokenizer().fit_on_texts(["CCO", "CCN", "C1CC1"])
    scaler = MinMaxScaler().fit(np.linspace(0, 1, 24).reshape(2, 12))
    with jax.default_device(CPU):
        exported = dexport.export_sampler(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        path = str(tmp_path / "bundle.mdtx")
        dexport.save_artifact(exported, path, tokenizer=tok, scaler=scaler,
                              training_smiles=["CCO", "CCN"],
                              extra={"task": "inverse_diffusion"})

        art, header = dexport.load_bundle(path)
        assert header["training_smiles"] == ["CCO", "CCN"]
        assert header["task"] == "inverse_diffusion"
        assert header["tokenizer"]["word_index"] == tok.word_index

        key = jax.random.PRNGKey(1)
        props = jnp.zeros((2, 12), jnp.float32)
        a = art.call(variables, props, key)
        b = dexport.load_artifact(path).call(variables, props, key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        server = ArtifactServer(path)
        assert server.tokenizer.word_index == tok.word_index
        assert np.allclose(server.scaler.data_min_, scaler.data_min_)
        assert server.training_smiles == ["CCO", "CCN"]
        assert server.meta == {"task": "inverse_diffusion"}

        # headerless back-compat: raw jax.export bytes
        raw = str(tmp_path / "raw.mdtx")
        with open(raw, "wb") as f:
            f.write(dexport.serialize(exported))
        art2, header2 = dexport.load_bundle(raw)
        assert header2 == {}
        c = art2.call(variables, props, key)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(a))
        s2 = ArtifactServer(raw)
        assert s2.tokenizer is None and s2.scaler is None


def test_executable_tier_bundle_plumbing(tiny_sampler, tmp_path):
    """export_sampler(executable=True) -> save_artifact(executable=...)
    must roundtrip the blob byte-exactly through the .mdtx envelope; on a
    CPU host the server declines the blob (XLA:CPU AOT loading is
    unreliable — tier targets TPU fleets, hardware validation in
    tools/bench_serving.py) and serves through the StableHLO tier."""
    from moleculediffusiontransformer_tpu.design.serve import ArtifactServer

    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported, blob = dexport.export_sampler(
            model, variables, batch=4, num_steps=8, cond_scale=2.0,
            platforms=("cpu",), executable=True)
        assert isinstance(blob, bytes) and len(blob) > 0
        path = str(tmp_path / "exec.mdtx")
        dexport.save_artifact(exported, path, executable=blob,
                              extra={"note": "exec-tier"})

        art, header = dexport.load_bundle(path)
        assert header.pop("executable") == blob
        assert header.get("note") == "exec-tier"

        srv = ArtifactServer(path)
        assert srv._exec is None and "CPU" in srv.exec_error
        assert srv.meta.get("note") == "exec-tier"
        srv.variables = jax.device_put(variables)

        key = jax.random.PRNGKey(7)
        props = jax.random.uniform(key, (4, 12), minval=-1.0, maxval=1.0)
        live = sample(model, variables, props, key, num_steps=8,
                      cond_scale=2.0)
        served = srv.call(props, key)  # StableHLO tier
        np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                                   rtol=1e-5, atol=1e-5)


def test_executable_tier_tiny_roundtrip_cpu_optin(monkeypatch):
    """The serialize -> load_executable mechanism itself, on a program
    small enough for XLA:CPU AOT loading (MDT_EXEC_TIER_CPU opt-in)."""
    monkeypatch.setenv("MDT_EXEC_TIER_CPU", "1")
    with jax.default_device(CPU):
        blob = dexport.compile_jit_executable(
            lambda v, x: v["w"] * x + 1.0,
            {"w": jax.ShapeDtypeStruct((4,), jnp.float32)},
            jax.ShapeDtypeStruct((4,), jnp.float32))
        fn = dexport.load_executable(blob)
        out = fn({"w": jnp.arange(4.0)}, jnp.ones((4,)))
        np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 3.0, 4.0])


def test_executable_tier_mismatch_falls_back(tiny_sampler, tmp_path):
    """A blob stamped for a foreign platform must not load — the server
    records the error and serves through the StableHLO tier."""
    import pickle

    from moleculediffusiontransformer_tpu.design.serve import ArtifactServer

    model, variables = tiny_sampler
    with jax.default_device(CPU):
        exported, blob = dexport.export_sampler(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu",), executable=True)
        d = pickle.loads(blob)
        d["device_kind"] = "TPU v999"
        path = str(tmp_path / "foreign.mdtx")
        dexport.save_artifact(exported, path, executable=pickle.dumps(d))

        srv = ArtifactServer(path)
        assert srv._exec is None
        assert "TPU v999" in srv.exec_error
        srv.variables = jax.device_put(variables)
        key = jax.random.PRNGKey(5)
        props = jax.random.uniform(key, (2, 12), minval=-1.0, maxval=1.0)
        out = srv.call(props, key)  # StableHLO tier serves
        assert np.asarray(out).shape == (2, model.max_length, model.pred_dim)
