"""HTTP serving daemon (`design/http_serve.py`): JSON routes over a tiny
exported sampler artifact — health/specs, a /sample round trip whose
molecules equal the direct ArtifactServer call with the same seed, and
client-error status codes (404/400/409)."""
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculediffusiontransformer_tpu.core.checkpoint import save_checkpoint
from moleculediffusiontransformer_tpu.data.qm9 import (prepare_qm9,
                                                       synthetic_qm9)
from moleculediffusiontransformer_tpu.design import (ArtifactServer,
                                                     make_httpd)
from moleculediffusiontransformer_tpu.design import export as dexport
from moleculediffusiontransformer_tpu.design.inverse_design import \
    decode_one_hot
from moleculediffusiontransformer_tpu.models import QMDiffusion

CPU = jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("http")
    smiles, props = synthetic_qm9(64, seed=3, chemically_valid=True)
    data = prepare_qm9(smiles, props, mode="inverse_diffusion",
                       max_length=16)
    model = QMDiffusion(
        max_length=16, channels=16, pred_dim=data.vocab_size,
        text_embed_dim=16, embed_dim_position=8,
        context_embedding_max_length=12, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(1,), attention_heads=2,
        attention_features=8, pre_transformer=1, patch_size=1)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            key, jnp.zeros((2, 12)),
            jnp.zeros((2, 16, data.vocab_size)), key)
        exported = dexport.export_sampler(
            model, variables, batch=4, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        art = str(tmp / "s.mdtx")
        dexport.save_artifact(exported, art)
        ck = str(tmp / "ck.msgpack")
        save_checkpoint(ck, jax.device_get(variables))
        server = ArtifactServer(art, ck)
        httpd = make_httpd(server, data.tokenizer, data.scaler, data.smiles,
                           port=0, quiet=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, server, data
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    body = (payload if isinstance(payload, bytes)
            else json.dumps(payload).encode())
    req = urllib.request.Request(
        url, body, {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_specs(served):
    base, server, _ = served
    status, health = _get(base + "/healthz")
    assert status == 200
    assert health["status"] == "ok"
    assert health["kind"] == "sampler"
    assert health["batch"] == 4
    assert health["restored_from"].endswith("ck.msgpack")

    status, specs = _get(base + "/specs")
    assert status == 200
    assert specs["kind"] == "sampler"
    assert specs["inputs"][0]["shape"] == [4, 12]


def test_sample_matches_direct_server_call(served):
    """Physical-unit property rows through HTTP must decode to the exact
    molecules the ArtifactServer produces for the same scaled inputs and
    seed (the HTTP layer adds no numerics of its own)."""
    base, server, data = served
    scaled = np.asarray(data.y_test[:2], np.float32)
    physical = data.scaler.inverse_transform(scaled)

    status, out = _post(base + "/sample", {
        "properties": [[float(v) for v in row] for row in physical],
        "seed": 7})
    assert status == 200
    assert len(out["smiles"]) == 2
    assert 0.0 <= out["validity_fraction"] <= 1.0
    assert 0.0 <= out["novelty_fraction"] <= 1.0

    # Oracle: the same request path minus HTTP.
    rescaled = np.asarray(
        data.scaler.transform(physical.astype(np.float32)), np.float32)
    direct = server.call_padded(rescaled[:, :12], key=jax.random.PRNGKey(7))
    assert out["smiles"] == decode_one_hot(direct, data.tokenizer)


def test_inpaint_route_keeps_fixed_positions(served, tmp_path):
    """An inpainter artifact behind /inpaint: the response molecules must
    equal the direct call built from the same draft one-hot + keep-mask,
    and the fixed draft characters must survive in every candidate."""
    from moleculediffusiontransformer_tpu.data.tokenizer import (
        one_hot_signed, pad_sequences)
    base, _, data = served
    model = QMDiffusion(
        max_length=16, channels=16, pred_dim=data.vocab_size,
        text_embed_dim=16, embed_dim_position=8,
        context_embedding_max_length=12, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(1,), attention_heads=2,
        attention_features=8, pre_transformer=1, patch_size=1)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            key, jnp.zeros((2, 12)),
            jnp.zeros((2, 16, data.vocab_size)), key)
        exported = dexport.export_inpainter(
            model, variables, batch=2, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        art = str(tmp_path / "ip.mdtx")
        dexport.save_artifact(exported, art)
        ck = str(tmp_path / "ck.msgpack")
        save_checkpoint(ck, jax.device_get(variables))
        server = ArtifactServer(art, ck)
        assert server.kind == "inpainter"
        httpd = make_httpd(server, data.tokenizer, data.scaler, data.smiles,
                           port=0, quiet=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    ibase = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        draft, fixed = data.smiles[0], [0, 1]
        scaled = np.asarray(data.y_test[:2], np.float32)
        physical = data.scaler.inverse_transform(scaled)
        status, out = _post(ibase + "/inpaint", {
            "properties": [[float(v) for v in r] for r in physical],
            "draft": draft, "fixed": fixed, "seed": 3})
        assert status == 200 and len(out["smiles"]) == 2

        rescaled = np.asarray(
            data.scaler.transform(physical.astype(np.float32)), np.float32)
        ids = pad_sequences(data.tokenizer.texts_to_sequences([draft]), 16)
        source = np.repeat(one_hot_signed(ids, data.vocab_size), 2,
                           axis=0).astype(np.float32)
        mask = np.zeros((2, 16, data.vocab_size), bool)
        mask[:, fixed, :] = True
        direct = server.call_padded(rescaled[:, :12], source, mask,
                                    key=jax.random.PRNGKey(3))
        assert out["smiles"] == decode_one_hot(direct, data.tokenizer)
        for s in out["smiles"]:
            assert s[:2] == draft[:2]   # frozen positions survive

        # wrong kind for this artifact -> 409
        assert _post(ibase + "/sample",
                     {"properties": [[0.0] * 12]})[0] == 409
        # bad fixed positions -> 400
        assert _post(ibase + "/inpaint", {
            "properties": [[0.0] * 12], "draft": draft,
            "fixed": [99]})[0] == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def _serve_httpd(server, data):
    httpd = make_httpd(server, data.tokenizer, data.scaler, data.smiles,
                       port=0, quiet=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def test_generate_route_matches_direct_call(served, tmp_path):
    """A generator artifact behind /generate: HTTP decode must equal the
    direct KV-cached CFG generation for the same seed/start token."""
    from moleculediffusiontransformer_tpu.data.tokenizer import \
        remove_start_end_token_first
    from moleculediffusiontransformer_tpu.models import \
        MoleculeTransformerSequence
    base, _, data = served
    model = MoleculeTransformerSequence(
        dim=32, depth=2, logits_dim=data.vocab_size, dim_head=8, heads=4,
        text_embed_dim=16, max_text_len=12)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        props0 = jnp.zeros((2, 12))
        start0 = jnp.ones((2, 1), jnp.int32)
        variables = model.init(key, props0, start0, cond_drop_prob=0.0)
        exported = dexport.export_generator(
            model, variables, batch=2, start_len=1, tokens_to_generate=6,
            cond_scale=1.5, platforms=("cpu",))
        art = str(tmp_path / "g.mdtx")
        dexport.save_artifact(exported, art)
        ck = str(tmp_path / "gck.msgpack")
        save_checkpoint(ck, jax.device_get(variables))
        server = ArtifactServer(art, ck)
        assert server.kind == "generator"
        httpd, gbase = _serve_httpd(server, data)
    try:
        scaled = np.asarray(data.y_test[:2], np.float32)
        physical = data.scaler.inverse_transform(scaled)
        status, out = _post(gbase + "/generate", {
            "properties": [[float(v) for v in r] for r in physical],
            "seed": 11})
        assert status == 200 and len(out["smiles"]) == 2

        rescaled = np.asarray(
            data.scaler.transform(physical.astype(np.float32)), np.float32)
        start_id = data.tokenizer.word_index.get("@", 1)
        start = np.full((2, 1), start_id, np.int32)
        ids = server.call_padded(rescaled[:, :12], start,
                                 key=jax.random.PRNGKey(11))
        expect = [remove_start_end_token_first(t)
                  for t in data.tokenizer.decode(ids)]
        assert out["smiles"] == expect
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_predict_route_matches_direct_call(served, tmp_path):
    """An encoder artifact behind /predict: SMILES in, 12 physical-unit
    properties out, equal to the direct tokenize->pad->call->unscale."""
    from moleculediffusiontransformer_tpu.data.tokenizer import (
        add_start_end_char, pad_sequences)
    from moleculediffusiontransformer_tpu.models import \
        MoleculeTransformerSequenceEncoder
    base, _, data = served
    model = MoleculeTransformerSequenceEncoder(
        dim=32, depth=2, heads=4, ff_mult=2, logits_dim=1,
        logits_dim_length=12, max_length=16,
        max_tokens=data.vocab_size + 2, embed_dim=8)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        ids0 = jnp.zeros((3, 16), jnp.int32)
        variables = model.init(key, ids0)
        exported = dexport.export_encoder(model, variables, batch=3,
                                          max_length=16, platforms=("cpu",))
        art = str(tmp_path / "e.mdtx")
        dexport.save_artifact(exported, art)
        ck = str(tmp_path / "eck.msgpack")
        save_checkpoint(ck, jax.device_get(variables))
        server = ArtifactServer(art, ck)
        assert server.kind == "encoder"
        httpd, ebase = _serve_httpd(server, data)
    try:
        smiles = [data.smiles[0], data.smiles[1]]
        status, out = _post(ebase + "/predict", {"smiles": smiles})
        assert status == 200
        got = np.asarray(out["properties"], np.float32)
        assert got.shape == (2, 12)

        ids = pad_sequences(
            data.tokenizer.texts_to_sequences(add_start_end_char(smiles)),
            16)
        logits = server.call_padded(np.asarray(ids, np.int32))
        expect = data.scaler.inverse_transform(
            logits.reshape(2, -1)[:, :12])
        np.testing.assert_allclose(got, np.asarray(expect, np.float32),
                                   rtol=1e-5, atol=1e-5)

        # not a list -> 400; too many molecules -> 400
        assert _post(ebase + "/predict", {"smiles": "CCO"})[0] == 400
        assert _post(ebase + "/predict",
                     {"smiles": ["C"] * 4})[0] == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_error_codes(served):
    base, _, _ = served
    assert _get(base + "/nope")[0] == 404
    assert _post(base + "/nope", {})[0] == 404
    # bad JSON
    assert _post(base + "/sample", b"{not json")[0] == 400
    # missing / malformed properties
    assert _post(base + "/sample", {})[0] == 400
    assert _post(base + "/sample", {"properties": [1, 2]})[0] == 400
    # more rows than the artifact batch
    five = [[0.0] * 12] * 5
    status, err = _post(base + "/sample", {"properties": five})
    assert status == 400 and "exceed" in err["error"]
    # wrong property-row width under a scaler -> clean 400, not a 500
    status, err = _post(base + "/sample", {"properties": [[0.0] * 3]})
    assert status == 400 and "12 properties" in err["error"]
    # ragged / non-numeric rows -> clean 400, not a 500
    assert _post(base + "/sample",
                 {"properties": [[0.0] * 12, [0.0]]})[0] == 400
    assert _post(base + "/sample",
                 {"properties": [["x"] * 12]})[0] == 400
    # wrong endpoint for the artifact kind -> 409
    assert _post(base + "/generate",
                 {"properties": [[0.0] * 12]})[0] == 409
    # body must be a JSON object
    assert _post(base + "/sample", b"[1,2,3]")[0] == 400


def test_reload_and_metrics(served, tmp_path):
    """POST /reload hot-swaps params without recompiling (outputs change
    and match the direct call with the new tree); GET /metrics counts
    requests, latencies, and errors."""
    base, server, data = served
    orig_ck = server.restored_from
    before = _get(base + "/metrics")[1]
    n_sample0 = before["routes"].get("/sample", {"count": 0})["count"]

    leaves, treedef = jax.tree_util.tree_flatten(server.variables)
    halved = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(l) * 0.5 for l in leaves])
    ck2 = str(tmp_path / "ck2.msgpack")
    save_checkpoint(ck2, halved)

    physical = data.scaler.inverse_transform(
        np.asarray(data.y_test[:1], np.float32))
    body = {"properties": [[float(v) for v in physical[0]]], "seed": 2}
    try:
        status, rep = _post(base + "/reload", {"checkpoint": ck2})
        assert status == 200 and rep["restored_from"] == ck2
        assert _get(base + "/healthz")[1]["restored_from"] == ck2

        status, out = _post(base + "/sample", body)
        assert status == 200
        rescaled = np.asarray(data.scaler.transform(physical), np.float32)
        direct = server.call_padded(rescaled[:, :12],
                                    key=jax.random.PRNGKey(2))
        assert out["smiles"] == decode_one_hot(direct, data.tokenizer)

        after = _get(base + "/metrics")[1]
        assert after["routes"]["/sample"]["count"] == n_sample0 + 1
        assert after["routes"]["/reload"]["count"] >= 1
        assert after["routes"]["/sample"]["mean_ms"] > 0

        # bad reload path -> 400 + error counter bump
        status, err = _post(base + "/reload",
                            {"checkpoint": str(tmp_path / "nope.msgpack")})
        assert status == 400 and "no checkpoint" in err["error"]
        assert _post(base + "/reload", {})[0] == 400
        final = _get(base + "/metrics")[1]
        assert final["errors"] >= after["errors"] + 2
    finally:
        if orig_ck:
            _post(base + "/reload", {"checkpoint": orig_ck})


def test_bundled_artifact_serves_without_dataset(served, tmp_path):
    """An artifact exported with --embed-vocab semantics (tokenizer +
    scaler + novelty corpus in the bundle header) must serve through
    make_httpd(server) ALONE — no dataset objects passed — and produce
    exactly what the fixture daemon (explicit tokenizer/scaler) produces
    for the same request."""
    base, fixture_server, data = served
    model = QMDiffusion(
        max_length=16, channels=16, pred_dim=data.vocab_size,
        text_embed_dim=16, embed_dim_position=8,
        context_embedding_max_length=12, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(1,), attention_heads=2,
        attention_features=8, pre_transformer=1, patch_size=1)
    with jax.default_device(CPU):
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            key, jnp.zeros((2, 12)),
            jnp.zeros((2, 16, data.vocab_size)), key)
        exported = dexport.export_sampler(
            model, variables, batch=4, num_steps=4, cond_scale=2.0,
            platforms=("cpu",))
        art = str(tmp_path / "bundled.mdtx")
        dexport.save_artifact(exported, art, tokenizer=data.tokenizer,
                              scaler=data.scaler,
                              training_smiles=data.smiles)
        ck = str(tmp_path / "ck.msgpack")
        save_checkpoint(ck, jax.device_get(variables))
        server = ArtifactServer(art, ck)
        httpd = make_httpd(server, port=0, quiet=True)   # nothing else
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    bbase = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        physical = data.scaler.inverse_transform(
            np.asarray(data.y_test[:2], np.float32))
        body = {"properties": [[float(v) for v in r] for r in physical],
                "seed": 9}
        status, out = _post(bbase + "/sample", body)
        assert status == 200 and len(out["smiles"]) == 2

        rescaled = np.asarray(
            data.scaler.transform(physical.astype(np.float32)), np.float32)
        direct = server.call_padded(rescaled[:, :12],
                                    key=jax.random.PRNGKey(9))
        assert out["smiles"] == decode_one_hot(direct, data.tokenizer)
        # novelty corpus came from the bundle, so fractions are real
        assert 0.0 <= out["novelty_fraction"] <= 1.0
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_fuzz_never_crashes(served):
    """Property fuzz: arbitrary JSON bodies against every POST route must
    yield a JSON response with a sane status (200/400/404/409/500 never
    kills the daemon), and the daemon must still serve afterwards."""
    base, _, _ = served
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    json_scalars = (st.none() | st.booleans() | st.integers(-9, 9)
                    | st.floats(allow_nan=False, allow_infinity=False,
                                width=32)
                    | st.text(max_size=8))
    bodies = st.recursive(
        json_scalars,
        lambda children: (st.lists(children, max_size=4)
                          | st.dictionaries(
                              st.sampled_from(["properties", "seed",
                                               "draft", "fixed", "smiles",
                                               "checkpoint", "junk"]),
                              children, max_size=4)),
        max_leaves=10)

    @settings(max_examples=40, deadline=None)
    @given(st.sampled_from(["/sample", "/generate", "/predict", "/inpaint",
                            "/reload"]),
           bodies)
    def check(route, body):
        status, payload = _post(base + route, body)
        assert status in (200, 400, 404, 409, 500), (route, body, status)
        assert isinstance(payload, dict)
        if status != 200:
            assert "error" in payload

    check()
    assert _get(base + "/healthz")[0] == 200   # daemon survived


def test_oversized_body_rejected_before_buffering(served):
    """A Content-Length beyond the 64 MiB cap gets 413 without the
    server buffering anything (header checked before read)."""
    import http.client
    base, _, _ = served
    host, port = base.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=10)
    try:
        conn.putrequest("POST", "/sample")
        conn.putheader("Content-Length", str(100 * 1024 * 1024))
        conn.putheader("Content-Type", "application/json")
        conn.endheaders()          # never send the body
        resp = conn.getresponse()
        assert resp.status == 413
        assert "64 MiB" in json.loads(resp.read())["error"]
    finally:
        conn.close()
    assert _get(base + "/healthz")[0] == 200


def test_concurrent_requests_serialize_on_device(served):
    """Parallel requests are accepted concurrently, serialize behind the
    device lock, and each gets its own correct (deterministic) answer."""
    from concurrent.futures import ThreadPoolExecutor
    base, _, data = served
    physical = data.scaler.inverse_transform(
        np.asarray(data.y_test[:1], np.float32))
    row = [[float(v) for v in physical[0]]]

    def call(seed):
        return _post(base + "/sample", {"properties": row, "seed": seed})

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(call, [5, 5, 6, 6]))
    assert all(status == 200 for status, _ in results)
    smiles = [out["smiles"] for _, out in results]
    assert smiles[0] == smiles[1]      # same seed -> same molecule
    assert smiles[2] == smiles[3]


def test_listen_backlog_survives_synchronized_bursts():
    """Dynamic batching releases every coalesced waiter at once, so all
    clients reconnect in the same instant; http.server's default backlog
    of 5 overflowed under 32 synchronized /predict clients on hardware
    (kernel drops the half-open connections -> client-side RST,
    tools/bench_serving.py 2026-08-19). The daemon must configure a
    backlog that absorbs a full-fleet burst."""
    from moleculediffusiontransformer_tpu.design.http_serve import make_httpd

    class _Fake:   # make_httpd only touches kind/batch attrs lazily
        kind = "sampler"
        batch = 4
        tokenizer = scaler = None
        training_smiles = ()
        specs = ()
        restored_from = None

    httpd = make_httpd(_Fake(), port=0, quiet=True)
    try:
        assert httpd.request_queue_size >= 64
    finally:
        httpd.server_close()


def _encoder_httpd(served, tmp_path, batch, window_ms):
    """Tiny encoder artifact + daemon with dynamic batching configured."""
    from moleculediffusiontransformer_tpu.models import \
        MoleculeTransformerSequenceEncoder
    _, _, data = served
    model = MoleculeTransformerSequenceEncoder(
        dim=32, depth=2, heads=4, ff_mult=2, logits_dim=1,
        logits_dim_length=12, max_length=16,
        max_tokens=data.vocab_size + 2, embed_dim=8)
    with jax.default_device(CPU):
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((batch, 16), jnp.int32))
        exported = dexport.export_encoder(model, variables, batch=batch,
                                          max_length=16, platforms=("cpu",))
        art = str(tmp_path / "be.mdtx")
        dexport.save_artifact(exported, art)
        ck = str(tmp_path / "beck.msgpack")
        save_checkpoint(ck, jax.device_get(variables))
        server = ArtifactServer(art, ck)
        httpd = make_httpd(server, data.tokenizer, data.scaler, data.smiles,
                           port=0, quiet=True, batch_window_ms=window_ms)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}", data


def test_predict_dynamic_batching_coalesces_and_is_exact(served, tmp_path):
    """batch_window_ms>0: concurrent single-molecule /predict requests
    ride ONE device call (metrics prove it) and every response equals the
    sequential (uncoalesced) answer bit-for-bit — the encoder program is
    keyless and row-independent, so coalescing is exact."""
    from concurrent.futures import ThreadPoolExecutor
    httpd, base, data = _encoder_httpd(served, tmp_path, batch=4,
                                       window_ms=1500.0)
    try:
        mols = [data.smiles[i] for i in range(3)]
        # sequential baseline (each rides its own window -> own call)
        solo = {}
        for m in mols:
            status, out = _post(base + "/predict", {"smiles": [m]})
            assert status == 200
            solo[m] = out["properties"]
        _, before = _get(base + "/metrics")
        calls0 = before["predict_batching"]["device_calls"]

        def call(m):
            return _post(base + "/predict", {"smiles": [m]})

        with ThreadPoolExecutor(max_workers=3) as ex:
            results = list(ex.map(call, mols))
        assert all(status == 200 for status, _ in results)
        for m, (_, out) in zip(mols, results):
            assert out["properties"] == solo[m]   # exact, not just close

        _, after = _get(base + "/metrics")
        pb = after["predict_batching"]
        burst_calls = pb["device_calls"] - calls0
        assert burst_calls < 3, pb   # the burst coalesced
        assert pb["requests"] >= 6
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_predict_dynamic_batching_overflow_splits_rounds(served, tmp_path):
    """Two concurrent 3-row requests against a batch-4 artifact cannot
    share one call: the batcher splits them into two exact rounds, and the
    leftover round dispatches immediately (window anchored at arrival)."""
    import time
    from concurrent.futures import ThreadPoolExecutor
    httpd, base, data = _encoder_httpd(served, tmp_path, batch=4,
                                       window_ms=800.0)
    try:
        groups = [[data.smiles[i] for i in range(3)],
                  [data.smiles[i] for i in range(3, 6)]]
        solo = [ _post(base + "/predict", {"smiles": g})[1]["properties"]
                 for g in groups]
        _, before = _get(base + "/metrics")
        calls0 = before["predict_batching"]["device_calls"]

        t0 = time.monotonic()
        with ThreadPoolExecutor(max_workers=2) as ex:
            results = list(ex.map(
                lambda g: _post(base + "/predict", {"smiles": g}), groups))
        elapsed = time.monotonic() - t0
        assert all(status == 200 for status, _ in results)
        got = {tuple(g): out["properties"] for g, (_, out)
               in zip(groups, results)}
        for g, expect in zip(groups, solo):
            assert got[tuple(g)] == expect

        _, after = _get(base + "/metrics")
        assert after["predict_batching"]["device_calls"] - calls0 == 2
        # the second round must NOT wait a fresh full window on top of the
        # first (its head request had already aged past the window)
        assert elapsed < 3 * 0.8 + 2.0, elapsed
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_microbatcher_oversized_submit_fails_cleanly():
    """A submit larger than max_rows must dispatch alone and relay its
    fn error to that one request — not wedge the collection loop (the
    /predict route gates size, but the class must not depend on it)."""
    import numpy as np
    from moleculediffusiontransformer_tpu.design.http_serve import (
        _MicroBatcher)

    def fn(rows):
        if len(rows) > 4:
            raise ValueError(f"too many rows: {len(rows)}")
        return rows * 2

    mb = _MicroBatcher(fn, max_rows=4, window_s=0.05)
    try:
        with pytest.raises(ValueError, match="too many rows: 6"):
            mb.submit(np.ones((6, 3), np.float32))
        # the batcher must still serve after the failed round
        out = mb.submit(np.ones((2, 3), np.float32))
        np.testing.assert_array_equal(out, np.full((2, 3), 2.0))
    finally:
        mb.close()
