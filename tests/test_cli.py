"""CLI smoke: train -> checkpoint -> sample / predict / export through
``python -m moleculediffusiontransformer_tpu`` (in-process), transformer
tasks at tiny scale."""
import json

import pytest

from moleculediffusiontransformer_tpu import cli


def run(capsys, argv):
    cli.main(argv)
    return json.loads(capsys.readouterr().out)


def test_info(capsys):
    out = run(capsys, ["info"])
    assert out["device_count"] >= 1 and "backend" in out


def test_train_sample_predict_export(tmp_path, capsys):
    ckpt = str(tmp_path / "it.msgpack")
    out = run(capsys, [
        "train", "--task", "inverse_transformer", "--preset", "tiny",
        "--rows", "96", "--epochs", "1", "--batch-size", "32",
        "--num-eval", "2", "--out", ckpt])
    assert out["task"] == "inverse_transformer"
    assert "validity_fraction" in out

    out = run(capsys, [
        "sample", "--task", "inverse_transformer", "--preset", "tiny",
        "--rows", "96", "--checkpoint", ckpt, "--num", "2",
        "--tokens", "8"])
    assert len(out["smiles"]) == 2

    # explicit physical-unit property rows exercise the scaler path
    out = run(capsys, [
        "sample", "--task", "inverse_transformer", "--preset", "tiny",
        "--rows", "96", "--checkpoint", ckpt, "--tokens", "8",
        "--properties", ",".join(["1.0"] * 12)])
    assert len(out["smiles"]) == 1

    out = run(capsys, [
        "predict", "--task", "forward_transformer", "--preset", "tiny",
        "--rows", "96", "CCO", "C1CC1"])
    assert set(out["predictions"]) == {"CCO", "C1CC1"}
    assert len(out["predictions"]["CCO"]) == 12

    art = str(tmp_path / "enc.mdtx")
    cli.main(["export", "--task", "forward_transformer", "--out", art,
              "--batch", "2", "--platforms", "cpu", "--dtype", "float32"])
    from moleculediffusiontransformer_tpu.design import export as dexport
    exported = dexport.load_artifact(art)
    assert exported.in_avals  # loadable artifact with input specs

    capsys.readouterr()  # drop export's stderr note
    out = run(capsys, ["serve", art, "--rows", "96", "--num", "2"])
    assert out["kind"] == "encoder"
    assert len(out["predicted_properties"]) == 2
    assert len(out["predicted_properties"][0]) == 12


def test_serve_http_flag_wiring(tmp_path, capsys, monkeypatch):
    """`serve --http PORT` must hand the artifact server + dataset
    tokenizer/scaler to make_httpd and block in serve_forever (stubbed;
    the daemon itself is covered by tests/test_http_serve.py)."""
    from moleculediffusiontransformer_tpu.design import http_serve
    art = str(tmp_path / "enc.mdtx")
    cli.main(["export", "--task", "forward_transformer", "--out", art,
              "--batch", "2", "--platforms", "cpu", "--dtype", "float32"])
    calls = {}

    class _Stub:
        server_address = ("127.0.0.1", 8123)

        def serve_forever(self):
            calls["served"] = True
            raise KeyboardInterrupt  # cmd_serve must close cleanly

        def server_close(self):
            calls["closed"] = True

    def fake_make_httpd(server, tokenizer, scaler, smiles, *, host, port,
                        batch_window_ms=0.0):
        assert server.kind == "encoder"
        assert tokenizer is not None and scaler is not None and smiles
        calls["port"], calls["host"] = port, host
        calls["window"] = batch_window_ms
        return _Stub()

    monkeypatch.setattr(http_serve, "make_httpd", fake_make_httpd)
    cli.main(["serve", art, "--rows", "96", "--http", "8123",
              "--batch-window-ms", "5"])
    assert calls == {"port": 8123, "host": "127.0.0.1", "window": 5.0,
                     "served": True, "closed": True}


def test_inspect_artifact(tmp_path, capsys):
    """inspect reports kind/specs/bundle without running the program."""
    art = str(tmp_path / "enc.mdtx")
    cli.main(["export", "--task", "forward_transformer", "--out", art,
              "--batch", "2", "--platforms", "cpu", "--dtype", "float32",
              "--embed-vocab", "--rows", "64"])
    capsys.readouterr()
    out = run(capsys, ["inspect", art])
    assert out["kind"] == "encoder"
    assert out["inputs"][0]["shape"][0] == 2
    assert out["param_count"] > 1000
    assert out["bundle"]["scaler"] is True
    assert out["bundle"]["tokenizer_vocab"] > 2
    assert out["bundle"]["novelty_corpus"] == 64


def test_export_inpaint_artifact(tmp_path):
    """export --inpaint emits the RePaint program: 4-input inpainter kind
    detected by the server; rejected for non-diffusion tasks."""
    from moleculediffusiontransformer_tpu.design import ArtifactServer
    art = str(tmp_path / "ip.mdtx")
    cli.main(["export", "--task", "inverse_diffusion", "--inpaint",
              "--out", art, "--vocab", "8", "--batch", "2",
              "--timesteps", "4", "--platforms", "cpu",
              "--dtype", "float32"])
    server = ArtifactServer(art)
    assert server.kind == "inpainter"
    with pytest.raises(SystemExit):
        cli.main(["export", "--task", "forward_transformer", "--inpaint",
                  "--out", art, "--batch", "2", "--platforms", "cpu"])


def test_inpaint_random_init(capsys):
    out = run(capsys, [
        "inpaint", "CCO", "--fixed", "0", "1", "--preset", "tiny",
        "--rows", "96", "--timesteps", "4", "--num", "2"])
    assert out["draft"] == "CCO" and len(out["smiles"]) == 2


def test_eval_random_init(capsys):
    out = run(capsys, [
        "eval", "--task", "forward_transformer", "--preset", "tiny",
        "--rows", "96", "--num-eval", "4"])
    assert "r2" in out


def test_export_torch_state_dict(tmp_path, capsys):
    """export-torch: msgpack checkpoint -> torch-loadable state_dict file
    with reference-layout keys (nn.params_to_state_dict semantics)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from moleculediffusiontransformer_tpu.core.checkpoint import (
        save_checkpoint)
    from moleculediffusiontransformer_tpu.nn import (Transformer1d,
                                                     params_to_state_dict)

    model = Transformer1d(1, 32, num_heads=2, head_features=4, multiplier=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32)))
    ckpt = str(tmp_path / "m.msgpack")
    save_checkpoint(ckpt, variables)  # {'params': ...} variables form

    pt = str(tmp_path / "m.pt")
    cli.main(["export-torch", "--checkpoint", ckpt, "--out", pt])
    import torch
    loaded = torch.load(pt)
    expect = params_to_state_dict(jax.device_get(variables["params"]))
    assert set(loaded) == set(expect)
    for k, v in expect.items():
        assert np.array_equal(loaded[k].numpy(), v), k

    npz = str(tmp_path / "m.npz")
    cli.main(["export-torch", "--checkpoint", ckpt, "--out", npz])
    with np.load(npz) as z:
        assert set(z.files) == set(expect)
