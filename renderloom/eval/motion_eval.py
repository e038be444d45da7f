"""Motion-model evaluation: MSE/MAE/MAX vs GT with linear baseline.

TPU-native rebuild of ``Human_Motion_Modelling/models/evaluator.py``:

* the reference's protocol is kept — fixed per-sample random viewpoints
  cached to ``evaluation_view.npy`` (evaluator.py:24-35), test clips
  center-cropped/truncated (AMASS_dataset.py:181-192), keyframe
  corruption applied at eval when ``evaluate_noise`` (the robustness
  setting the shipped config uses), metrics on *globalized* joints with
  the linear-interpolation baseline alongside (evaluator.py:102-130);
* the implementation differs: samples are padded to the static
  ``max_seq_length`` and batched through one jitted eval step (masks +
  per-sample lengths keep the math identical on valid prefixes), instead
  of per-sample python loops round-tripping h5 files on disk
  (evaluator.py:52-78).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import MotionConfig
from renderloom.data.amass import AmassReader, center_window
from renderloom.ops import pose as pose_ops


def load_or_create_views(path: str, rotation_axes, n: int = 1000,
                         rng: Optional[np.random.Generator] = None
                         ) -> np.ndarray:
    """The 1000 cached random viewpoints (evaluator.py:24-35)."""
    if os.path.exists(path):
        return np.load(path)
    rng = rng or np.random.default_rng(0)
    axes = np.asarray(rotation_axes) * np.pi
    views = rng.uniform(-axes, axes, (n, 3))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, views)
    return views


def relocate(motion: np.ndarray, root_idx: int) -> np.ndarray:
    """Align the root joint of frame 0 to the origin
    (evaluator.py:231-246, localize=False branch)."""
    center = motion[root_idx, :, 0]
    return motion - center[None, :, None]


def global_metrics(gt: np.ndarray, pred: np.ndarray,
                   interp: np.ndarray, root_idx: int = 8) -> Dict:
    """Per-sample sums for MSE/MAE/MAX accumulation (evaluator.py:102-121)."""
    gt_g = relocate(gt, root_idx)
    pred_g = relocate(pred, root_idx)
    interp_g = relocate(interp, root_idx)
    return {
        "count": gt_g.size,
        "mse": float(np.sum((gt_g - pred_g) ** 2)),
        "mae": float(np.sum(np.abs(gt_g - pred_g))),
        "max": float(np.max(np.abs(gt_g - pred_g))),
        "mse_interp": float(np.sum((gt_g - interp_g) ** 2)),
        "mae_interp": float(np.sum(np.abs(gt_g - interp_g))),
        "max_interp": float(np.max(np.abs(gt_g - interp_g))),
    }


class MotionEvaluator:
    """Batched eval over the AMASS test split."""

    def __init__(self, cfg: MotionConfig, reader: AmassReader,
                 mean: np.ndarray, std: np.ndarray,
                 views_path: str = "data/evaluation_view.npy"):
        self.cfg = cfg
        self.reader = reader
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.views = load_or_create_views(views_path,
                                          cfg.dataset.rotation_axes)
        self.rate = cfg.dataset.test_sample_rate
        self.max_len = cfg.dataset.max_seq_length
        self.root = (pose_ops.ROOT_3D if cfg.dataset.return_type == "3D"
                     else pose_ops.ROOT_2D)
        # one vmapped dispatch per eval batch instead of per sample
        self._prep_batch = jax.jit(jax.vmap(self._prepare_device))

    # ----------------------------------------------------------------- #

    def _prepare_device(self, key, motion3d, pad_mask, view):
        """Project one padded clip and synthesize eval inputs on device.

        Matches ``get_2d_motion_with_key`` (AMASS_dataset.py:170-219):
        fixed view, no projection jitter, keyframe corruption iff
        ``evaluate_noise``, inputs zeroed off-keyframe, linear-interp
        baseline from the corrupted sequence.
        """
        d = self.cfg.dataset
        data3d = pose_ops.rotate_motion_3d(pose_ops.centralize(motion3d),
                                           view)
        if d.return_type == "3D":
            gt = data3d
        else:
            p2d = pose_ops.project_2d(data3d, d.focal, d.depth,
                                      d.frame_boarder, d.camera_project)
            gt = pose_ops.joints_to_openpose(p2d)

        noised = gt
        if d.evaluate_noise:
            noised = pose_ops.random_drop(key, gt, self.rate,
                                          d.noise_weight, d.noise_rate,
                                          d.joint_drop_rate, d.flip_rate)
        normed = pose_ops.normalize(
            pose_ops.localize(noised, self.root), self.mean, self.std)

        enc_mask = pose_ops.encoder_mask_from_pad(pad_mask, self.rate)
        interp = pose_ops.keyframe_interpolate(normed, self.rate)
        inputs = normed * (~enc_mask)[None, None, :]

        C = inputs.shape[0] * inputs.shape[1]
        return {
            "gt": gt,
            "input": inputs.reshape(C, -1),
            "interp": interp.reshape(C, -1),
            "src_mask": enc_mask,
            "mask": pad_mask,
        }

    def _postprocess(self, flat: np.ndarray, length: int) -> np.ndarray:
        """(C, L) normalized → (J, D, T) denormalized global joints
        (evaluator.py:201-230)."""
        J, D = self.mean.shape
        data = np.asarray(flat, dtype=np.float64).reshape(J, D, -1)
        data = data[:, :, :length]
        data = data * np.asarray(self.std)[:, :, None] \
            + np.asarray(self.mean)[:, :, None]
        return np.asarray(pose_ops.globalize(jnp.asarray(data), self.root))

    # ----------------------------------------------------------------- #

    def evaluate(self, model, params, limit: Optional[int] = None,
                 batch_size: int = 8,
                 dump_h5: Optional[str] = None) -> Dict[str, float]:
        """Run the full test protocol, return the metric dict
        (mse/mae/max for model and linear baseline).

        ``dump_h5`` writes per-sample ``<dataset>/<motion>/{pred,gt,
        interp}`` global-joint arrays — the reference's inspection
        artifact (``infer_h5_file``, evaluator.py:52-78)."""
        samples = self.reader.samples[:limit] if limit \
            else self.reader.samples
        h5_out = None
        if dump_h5:
            import h5py
            os.makedirs(os.path.dirname(dump_h5) or ".", exist_ok=True)
            h5_out = h5py.File(dump_h5, "w")

        @jax.jit
        def infer(params, inputs, src_mask, interp, pad_mask, lengths):
            pred, _ = model.apply(
                {"params": params},
                jnp.transpose(inputs, (0, 2, 1)), src_mask,
                jnp.transpose(interp, (0, 2, 1)), pad_mask, self.rate,
                deterministic=True, lengths=lengths)
            return jnp.transpose(pred, (0, 2, 1))

        totals = {"count": 0, "mse": 0.0, "mae": 0.0, "max": 0.0,
                  "mse_interp": 0.0, "mae_interp": 0.0, "max_interp": 0.0}
        n_samples = 0

        buf = []
        for i, (dkey, mkey) in enumerate(samples):
            motion = self.reader.read_motion(dkey, mkey)
            window, _ = center_window(motion, self.max_len, 16)
            T = window.shape[2]
            padded = np.zeros((52, 3, self.max_len), dtype=np.float32)
            padded[:, :, :T] = window
            pad_mask = np.arange(self.max_len) >= T
            view = self.views[i % len(self.views)]
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            buf.append((padded, pad_mask, view, key, T, dkey, mkey))
            if len(buf) == batch_size or i == len(samples) - 1:
                stacked = self._prep_batch(
                    jnp.stack([b[3] for b in buf]),
                    jnp.asarray(np.stack([b[0] for b in buf])),
                    jnp.asarray(np.stack([b[1] for b in buf])),
                    jnp.asarray(np.stack([b[2] for b in buf])))
                lengths = jnp.asarray([b[4] for b in buf])
                preds = infer(params, stacked["input"],
                              stacked["src_mask"], stacked["interp"],
                              stacked["mask"], lengths)
                for j, (_, _, _, _, length, dk, mk) in enumerate(buf):
                    gt = np.asarray(stacked["gt"][j])[:, :, :length]
                    pred = self._postprocess(preds[j], length)
                    interp = self._postprocess(stacked["interp"][j],
                                               length)
                    if h5_out is not None:
                        grp = h5_out.create_group(f"{dk}/{mk}")
                        grp.create_dataset("pred", data=pred)
                        grp.create_dataset("gt", data=gt)
                        grp.create_dataset("interp", data=interp)
                    m = global_metrics(gt, pred, interp, self.root)
                    for k in ("mse", "mae", "mse_interp", "mae_interp"):
                        totals[k] += m[k]
                    totals["max"] += m["max"]
                    totals["max_interp"] += m["max_interp"]
                    totals["count"] += m["count"]
                    n_samples += 1
                buf = []

        if h5_out is not None:
            h5_out.close()
        cnt = max(totals["count"], 1)
        n = max(n_samples, 1)
        return {
            "mse_global": totals["mse"] / cnt,
            "mae_global": totals["mae"] / cnt,
            "max_global": totals["max"] / n,
            "mse_interp": totals["mse_interp"] / cnt,
            "mae_interp": totals["mae_interp"] / cnt,
            "max_interp": totals["max_interp"] / n,
        }
