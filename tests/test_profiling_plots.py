"""Coverage for the two aux modules with no direct tests: train/profiling
(trace capture, NaN debug, throughput timing) and design/plots
(matplotlib-gated; RDKit renders skipped without rdkit)."""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moleculediffusiontransformer_tpu.train import profiling


def test_debug_nans_raises_and_restores():
    assert not jax.config.jax_debug_nans
    with pytest.raises(FloatingPointError):
        with profiling.debug_nans():
            jax.jit(lambda x: x / 0.0)(jnp.float32(0.0)).block_until_ready()
    assert not jax.config.jax_debug_nans  # context restored the flag


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    assert glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)


def test_step_timer_counts_and_syncs():
    t = profiling.StepTimer()
    t.update(batch_size=32, n_steps=2)
    t.update(batch_size=32)
    assert t.steps == 3 and t.samples == 96
    assert t.samples_per_sec > 0 and t.steps_per_sec > 0
    assert profiling.StepTimer.sync(jnp.ones((4,))) == 4.0
    t.reset()
    assert t.steps == 0 and t.samples == 0


@pytest.fixture(scope="module")
def mpl():
    return pytest.importorskip("matplotlib")


def test_plot_loss_curve(tmp_path, mpl):
    from moleculediffusiontransformer_tpu.design.plots import plot_loss_curve
    p = str(tmp_path / "loss.png")
    plot_loss_curve([3.0, 2.0, 1.5, 1.2], path=p)
    assert os.path.getsize(p) > 0


def test_joint_plot_and_barchart(tmp_path, mpl):
    from moleculediffusiontransformer_tpu.design.plots import (
        joint_plot, plot_results_as_barchart)
    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 1, (32, 2))
    pred = gt + rng.normal(0, 0.05, gt.shape)
    p1 = str(tmp_path / "joint.png")
    joint_plot(gt.ravel(), pred.ravel(), path=p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "bar.png")
    plot_results_as_barchart(gt[0], pred[0], ["alpha", "gap"], path=p2)
    assert os.path.getsize(p2) > 0


def test_draw_and_save_rdkit_gate(tmp_path):
    """Validity bool either way (reference generative.py:947-994); the
    image file only appears when rdkit can render it."""
    from moleculediffusiontransformer_tpu.design.inverse_design import (
        HAS_RDKIT)
    from moleculediffusiontransformer_tpu.design.plots import (
        draw_and_save, draw_and_save_set)
    p = str(tmp_path / "mol.png")
    oks = draw_and_save_set(["CCO", "not_a_smiles((("],
                            prefix=str(tmp_path / "m"))
    assert oks == [True, False]
    assert draw_and_save("CCO", path=p) is True
    assert os.path.exists(p) == HAS_RDKIT
