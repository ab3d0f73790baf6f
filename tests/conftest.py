"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Single-device tests run on the default backend (the real TPU chip when the
axon plugin is present — JAX_PLATFORMS=cpu does not demote it — otherwise
CPU).  Multi-chip sharding tests build their mesh explicitly from
``jax.devices('cpu')``, which honors the 8-device virtual flag either way.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
# The fused Transformer1d path defaults ON when the default backend is a TPU
# (which it is here even under JAX_PLATFORMS=cpu — the axon plugin wins);
# parity tests compare the slow composition, and CPU-placed arrays cannot
# run compiled Mosaic kernels, so pin the production default OFF.  Fusion
# tests opt in explicitly via tf.fused() + interpret mode.
os.environ.setdefault("MDT_FUSION", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache — compiles here are slow (1-3 min for the
# UNet graphs); caching makes test re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import importlib.util
import types

import pytest


_REF_ROOT = "/root/reference/MoleculeDiffusion"
_REF_SAFE_MODULES = ("utils", "diffusion", "modules", "graphmodel", "model")  # importable without TF


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


def _load_reference_transformer():
    """Load the reference transformer.py as an oracle, stubbing its unused
    heavy imports (torchvision, torch_geometric)."""
    if "refmd.transformer" in sys.modules:
        return sys.modules["refmd.transformer"]
    _load_reference()
    for name, subs in (("torchvision", ["transforms"]),
                       ("torch_geometric", ["nn", "utils"])):
        if name in sys.modules:
            continue
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        sys.modules[name] = pkg
        for sub in subs:
            mod = types.ModuleType(f"{name}.{sub}")
            for attr in ("GCNConv", "GraphConv", "global_mean_pool",
                         "to_edge_index", "dense_to_sparse"):
                setattr(mod, attr, object())
            sys.modules[f"{name}.{sub}"] = mod
            setattr(pkg, sub, mod)
    spec = importlib.util.spec_from_file_location(
        "refmd.transformer", os.path.join(_REF_ROOT, "transformer.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refmd.transformer"] = mod
    spec.loader.exec_module(mod)
    setattr(sys.modules["refmd"], "transformer", mod)
    return mod


@pytest.fixture(scope="session")
def reference_transformer():
    if not os.path.isdir(_REF_ROOT):
        pytest.skip("reference repo not available")
    try:
        return _load_reference_transformer()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference transformer import failed: {e}")
