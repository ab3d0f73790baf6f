"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

All tests run on CPU (fast, deterministic); multi-chip sharding paths are
exercised on the virtual device mesh exactly as they would compile on a
TPU pod slice.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util
import types

import pytest


_REF_ROOT = "/root/reference/MoleculeDiffusion"
_REF_SAFE_MODULES = ("utils", "diffusion", "modules")  # importable without TF


def _load_reference():
    """Load the reference's torch modules as a synthetic package, bypassing
    its __init__ (which drags in torchvision/tensorflow).  Used only as a
    numerical oracle in tests — never as source."""
    if "refmd" in sys.modules:
        return sys.modules["refmd"]
    pkg = types.ModuleType("refmd")
    pkg.__path__ = [_REF_ROOT]
    sys.modules["refmd"] = pkg
    for name in _REF_SAFE_MODULES:
        spec = importlib.util.spec_from_file_location(
            f"refmd.{name}", os.path.join(_REF_ROOT, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmd.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


@pytest.fixture(scope="session")
def reference():
    """The reference PyTorch package (diffusion/modules/utils) as an oracle."""
    if not os.path.isdir(_REF_ROOT):
        pytest.skip("reference repo not available")
    try:
        return _load_reference()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
