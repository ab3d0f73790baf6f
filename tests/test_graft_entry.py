"""The driver hooks must work under the DRIVER's environment, not the test
environment: round-1 `MULTICHIP_r01.json` recorded `ok:false` because
`dryrun_multichip` touched the default (TPU) backend and died on a libtpu
version skew.  This test reruns it in a subprocess with the driver's env
(no JAX_PLATFORMS, no preset XLA_FLAGS) — the function must self-provide
the virtual CPU mesh and never require a working TPU runtime."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_under_driver_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # default backend may be the TPU plugin
    env.pop("XLA_FLAGS", None)       # module must set the host-device flag
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "dp: one sharded train step OK" in out.stdout
    assert "dp x tp: one 2-D-sharded train step OK" in out.stdout


def test_dryrun_source_never_probes_default_backend():
    """`jax.devices()` with no backend arg initializes the default (TPU)
    client — the exact round-1 failure.  Keep it out of the dryrun path."""
    import ast
    src = open(os.path.join(REPO, "__graft_entry__.py")).read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "dryrun_multichip")
    for node in ast.walk(fn):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "devices"
                and not node.args and not node.keywords):
            raise AssertionError(
                f"bare jax.devices() at line {node.lineno}")
