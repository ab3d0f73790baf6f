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

# ---------------------------------------------------------------- tiers ----
# `pytest -m quick` (<5 min on CPU, VERDICT r4 item 7): every test NOT in a
# slow module and not explicitly @pytest.mark.slow is auto-marked `quick`.
# Slow modules are the golden-parity/compile-heavy/fuzz/subprocess files —
# measured, not guessed (timings in PERF.md round-5 "test tiers" note).
_SLOW_MODULES = {
    "test_nn.py",                  # golden UNet parity: big compiles
    "test_transformers.py",        # transformer zoo goldens
    "test_models_train.py",        # training loops
    "test_flagship_parity.py",     # 91M golden
    "test_examples.py",            # runs the four example scripts
    "test_export.py",              # jax.export round-trips
    "test_torch_export.py",
    "test_http_serve.py",          # daemon lifecycle
    "test_transformer_fusion.py",  # Pallas interpret-mode kernels
    "test_flash_attention.py",
    "test_fuzz_audio.py", "test_fuzz_diffusion.py", "test_fuzz_unet.py",
    "test_multihost.py", "test_fsdp.py", "test_pp.py",  # subprocess DCN
    "test_ep.py", "test_sp.py",    # sharded-oracle compiles (~30-50s each)
    "test_graft_entry.py",         # dryrun_multichip: 371s measured
    "test_audio_graph.py",         # DSP/golden audio lineage
    "test_repro_tool.py",          # end-to-end baseline reproduction
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.basename(str(item.fspath))
        if name in _SLOW_MODULES or "slow" in item.keywords:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


# ------------------------------------------------- hardware audit trail ----
# Whenever a TPU-gated test (@pytest.mark.tpu_hw) actually EXECUTES (i.e.
# a TPU backend was present), append one JSONL record to HWTESTS.jsonl so
# "passed on hardware <date>" claims are auditable (VERDICT r4 item 8).
_HWTESTS_LOG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "HWTESTS.jsonl")
_hw_results = []


def pytest_runtest_logreport(report):
    if report.when != "call":
        return
    if "tpu_hw" in getattr(report, "keywords", {}):
        _hw_results.append({"nodeid": report.nodeid,
                            "outcome": report.outcome})


def pytest_sessionfinish(session, exitstatus):
    if not _hw_results:
        return
    import datetime
    import json
    try:
        import jax
        kind = jax.devices()[0].device_kind
    except Exception:  # pragma: no cover
        kind = "unknown"
    rec = {"date": datetime.datetime.now().isoformat(timespec="seconds"),
           "device_kind": str(kind), "results": list(_hw_results)}
    with open(_HWTESTS_LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


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
