"""Motion evaluator over a synthetic AMASS-layout h5.

Drives the full reference eval protocol (fixed cached viewpoints,
center-cropped clips, corruption at eval, MSE/MAE/MAX vs linear
baseline — ``Human_Motion_Modelling/models/evaluator.py``) end to end on
tiny shapes, and checks the linear-interpolation baseline sanity oracle.
"""

import os

import h5py
import jax
import numpy as np
import pytest

from renderloom.core.config import (MotionConfig, MotionDatasetConfig,
                                    PosEncodeConfig, TransformerConfig)
from renderloom.data.amass import AmassReader, compute_stats
from renderloom.eval.motion_eval import MotionEvaluator
from renderloom.train.motion import create_motion_state


@pytest.fixture(scope="module")
def amass_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("amass") / "joints.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        grp = f.create_group("TestSet")
        for i, T in enumerate((40, 25)):
            t = np.linspace(0, 2 * np.pi, T)
            base = rng.normal(0, 0.2, (1, 52, 3))
            joints = base + 0.3 * np.sin(
                t[:, None, None] + rng.uniform(0, 6, (1, 52, 3)))
            grp.create_group(f"m{i}").create_dataset(
                "joints", data=joints.astype(np.float64))
    return path


def cfg():
    return MotionConfig(
        transformer=TransformerConfig(hidden_dim=32, nheads=4,
                                      dim_feedforward=64, enc_layers=2,
                                      dec_layers=2, dropout=0.0),
        pos_encode=PosEncodeConfig(hidden_dim=32),
        dataset=MotionDatasetConfig(
            max_seq_length=33, train_sample_rate=8, test_sample_rate=8,
            train_sample_size=8, noise_rate=2, joint_drop_rate=2,
            flip_rate=1, test_split=("TestSet",)))


def test_compute_stats(amass_h5):
    reader = AmassReader(amass_h5, ("TestSet",))
    assert len(reader) == 2
    c = cfg()
    mean, std = compute_stats(reader, c.dataset)
    assert mean.shape == (19, 2) and std.shape == (19, 2)
    assert (std > 0).all()


def test_motion_evaluator_protocol(amass_h5, tmp_path):
    c = cfg()
    reader = AmassReader(amass_h5, c.dataset.test_split)
    mean, std = compute_stats(reader, c.dataset)
    model, _, state = create_motion_state(jax.random.PRNGKey(0), c)
    views_path = str(tmp_path / "evaluation_view.npy")
    ev = MotionEvaluator(c, reader, mean, std, views_path)
    results = ev.evaluate(model, state.params, batch_size=2)
    for key in ("mse_global", "mae_global", "max_global", "mse_interp",
                "mae_interp", "max_interp"):
        assert key in results and np.isfinite(results[key]), results
    # views were cached deterministically
    assert os.path.exists(views_path)
    r2 = ev.evaluate(model, state.params, batch_size=2)
    assert r2["mse_interp"] == pytest.approx(results["mse_interp"])
    # an untrained model should not beat the linear baseline
    assert results["mse_global"] > results["mse_interp"] * 0.5


def test_motion_evaluator_h5_dump(amass_h5, tmp_path):
    c = cfg()
    reader = AmassReader(amass_h5, c.dataset.test_split)
    mean, std = compute_stats(reader, c.dataset)
    model, _, state = create_motion_state(jax.random.PRNGKey(0), c)
    ev = MotionEvaluator(c, reader, mean, std,
                         str(tmp_path / "views.npy"))
    dump = str(tmp_path / "eval_dump.h5")
    ev.evaluate(model, state.params, batch_size=2, dump_h5=dump)
    with h5py.File(dump, "r") as f:
        groups = [f"{d}/{m}" for d in f for m in f[d]]
        assert len(groups) == 2
        g = f[groups[0]]
        for key in ("pred", "gt", "interp"):
            assert key in g
            assert g[key].shape[0] == 19 and g[key].shape[1] == 2
        # pred/gt/interp share the clip's true (unpadded) length
        assert g["pred"].shape == g["gt"].shape == g["interp"].shape
