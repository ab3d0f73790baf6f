"""Guards for the round-5 quality/roofline tooling.

These are import/construction smokes: the tools are exercised end-to-end
on TPU (QUALITY.md, ROOFLINE_r5.json) — here we pin the pieces that can
silently drift: the production batch plan shared between tools, and the
roofline program builders' work-item accounting.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from moleculediffusiontransformer_tpu.train.recipes import (  # noqa: E402
    PRODUCTION_BATCHES, TASKS)


def test_production_plan_covers_every_task():
    assert set(PRODUCTION_BATCHES) == set(TASKS)
    for task, (batch, accum) in PRODUCTION_BATCHES.items():
        # microbatch stays inside the measured fp32-safe one-chip envelope
        assert batch % accum == 0, (task, batch, accum)
        assert batch // accum <= 512, (task, batch, accum)


def test_quality_convergence_plan_in_sync():
    """quality_convergence asserts TASK_PLAN == PRODUCTION_BATCHES at
    import; importing it IS the test (a drift raises AssertionError)."""
    import quality_convergence

    assert {k: v[1:] for k, v in quality_convergence.TASK_PLAN.items()} \
        == PRODUCTION_BATCHES


@pytest.mark.parametrize("name", ["bench_train", "ar_generation"])
def test_roofline_build_accounting(name):
    """Program builders return (fn, args, batch, work_items) with
    consistent scaling (per-item FLOPs normalization relies on it)."""
    import roofline

    fn, args, batch, work = roofline.build(name, scale=64)
    assert callable(fn) and isinstance(args, tuple)
    if name == "bench_train":
        import bench
        assert batch == bench.TRAIN_BATCH // 64
        assert work == batch * bench.TRAIN_STEPS
    else:
        import bench
        assert batch == bench.AR_BATCH // 64
        assert work == batch * bench.AR_TOKENS
