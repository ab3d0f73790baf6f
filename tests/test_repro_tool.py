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


def _write_qm9_like_csv(path, n=8):
    from moleculediffusiontransformer_tpu.data.qm9 import (PROPERTY_NAMES,
                                                           synthetic_qm9)
    smiles, props = synthetic_qm9(n, seed=3)
    with open(path, "w") as f:
        f.write("smiles," + ",".join(PROPERTY_NAMES) + "\n")
        for s, row in zip(smiles, props):
            f.write(s + "," + ",".join(f"{v:.6f}" for v in row) + "\n")


def test_verify_qm9_csv(tmp_path, capsys):
    """Real-QM9 readiness (VERDICT r3 item 7): the checksum/structure gate
    that makes `tools/reproduce_baseline.py --csv qm9_.csv` traceable to
    the exact blob the day it appears."""
    import hashlib

    import pytest

    from moleculediffusiontransformer_tpu.data.qm9 import verify_qm9_csv

    csv_path = str(tmp_path / "qm9_.csv")
    _write_qm9_like_csv(csv_path)

    rep = verify_qm9_csv(csv_path)
    assert rep["header_ok"] and rep["rows"] == 8
    assert rep["row_count_ok"] is False      # stand-in, not 133,885
    assert rep["checksum_ok"] is None        # no known-good hash pinned yet
    expected = hashlib.sha256(open(csv_path, "rb").read()).hexdigest()
    assert rep["sha256"] == expected
    out = capsys.readouterr().out
    assert "WARNING" in out and expected in out

    # pinned hash: match passes, mismatch is fatal
    assert verify_qm9_csv(csv_path, expected)["checksum_ok"] is True
    with pytest.raises(ValueError, match="sha256"):
        verify_qm9_csv(csv_path, "0" * 64)

    # structural failure is always fatal
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("smiles,mu\nCCO,1.0\n")
    with pytest.raises(ValueError, match="missing property columns"):
        verify_qm9_csv(bad)


def test_repro_tool_records_verification(tmp_path, monkeypatch):
    """--csv runs are stamped with the blob's verification report."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import reproduce_baseline

    csv_path = str(tmp_path / "qm9_.csv")
    _write_qm9_like_csv(csv_path, n=64)
    out = tmp_path / "repro.json"
    monkeypatch.setattr(sys, "argv", [
        "reproduce_baseline.py", "--csv", csv_path, "--train-epochs", "1",
        "--train-batch", "32", "--timesteps", "4", "--num-rescore", "2",
        "--num-generate", "2", "--out", str(out)])
    reproduce_baseline.main()

    results = json.loads(out.read_text())
    v = results["dataset_verification"]
    assert v["header_ok"] and v["rows"] == 64 and len(v["sha256"]) == 64
