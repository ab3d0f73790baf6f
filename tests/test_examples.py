"""Example-script smoke: the notebook-equivalent entry points must run
end-to-end (train -> eval -> report) at --tiny scale — one per task
family (the audio/simple-model galleries and the serving example are
exercised by tests/test_audio_graph.py, test_models_train.py and
test_export.py at function level)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, *extra):
    env = dict(os.environ)
    # CPU-only: skip axon plugin registration (hangs when the TPU tunnel
    # is down) and keep compiles cached.
    env.setdefault("PALLAS_AXON_POOL_IPS", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name),
         "--tiny", "--epochs", "1", "--rows", "64", "--batch-size", "32",
         *extra],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout + proc.stderr


@pytest.mark.parametrize("script,needle", [
    ("inverse_diffusion.py", "validity_fraction"),
    ("forward_diffusion.py", "r2"),
    ("inverse_transformer.py", "validity"),
    ("forward_transformer.py", "r2"),
])
def test_example_smoke(script, needle):
    out = _run_example(script)
    assert "final" in out and needle in out, out[-2000:]
