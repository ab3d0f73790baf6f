"""End-to-end test of tools/reproduce_baseline.py --train-epochs: the
no-checkpoint fallback trains all four models in-process (tiny preset)
and emits every BASELINE.md metric key.  Mirrors the reference's
notebook flow train -> generate -> validate (generative.py:1090-1180)
at CPU-feasible scale."""
import json
import os
import sys

import pytest


def test_train_epochs_mode(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import reproduce_baseline

    out = tmp_path / "repro.json"
    monkeypatch.setattr(sys, "argv", [
        "reproduce_baseline.py", "--rows", "96", "--train-epochs", "1",
        "--train-batch", "32", "--timesteps", "4", "--num-rescore", "2",
        "--num-generate", "2", "--out", str(out)])
    reproduce_baseline.main()

    results = json.loads(out.read_text())
    assert results["training"]["epochs"] == 1
    assert results["training"]["preset"] == "tiny"
    for name in reproduce_baseline.MODELS:
        assert "trained in-process" in results["checkpoints"][name], name
    for metric in ("forward_diffusion_r2", "inverse_diffusion_validity",
                   "inverse_diffusion_novelty",
                   "inverse_transformer_validity",
                   "inverse_transformer_novelty", "forward_transformer_r2"):
        assert metric in results["metrics"], metric
        assert results["metrics"][metric] == results["metrics"][metric]  # not NaN
