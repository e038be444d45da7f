"""AMASS 3D-joints h5 reader and host-side batching.

Reads the same ``AMASS_3D_joints.h5`` layout the reference builds
(``Human_Motion_Modelling/AMASS/gen_amass_h5.py:60-74``: groups
``<dataset>/<motion>/joints`` holding (T, 52, 3) SMPL-H joints) and
produces raw ``(B, 52, 3, L)`` windows + pad masks.  Everything downstream
(rotation, projection, noise, masks) happens on-device inside the jitted
train step (``renderloom.ops.pose.synthesize_batch``) — the reference's
per-sample numpy synthesis in DataLoader workers
(``datasets/AMASS_dataset.py:98-168``) collapses to a pure array hand-off.

Normalization stats (mean/std over localized 2D pose) mirror
``AMASS_dataset.py:267-299`` and are cached next to the h5 as npy files
with reference-compatible names, so the reference's shipped
``mean_pose_network_perspective_4_4.npy`` files are loadable directly.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from renderloom.core.config import MotionDatasetConfig
from renderloom.core.registry import DATASETS


def random_window(rng: np.random.Generator, data: np.ndarray,
                  max_len: int, rate: int
                  ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Temporal crop/pad of (J, D, T) → (J, D, max_len) + (max_len,) pad
    mask (True = padded), mirroring ``_random_temproal_crop``
    (AMASS_dataset.py:313-333): short clips are truncated to a
    rate-aligned length then zero-padded; long clips get a random crop."""
    T = data.shape[2]
    if T < max_len:
        keep = ((T - 1) // rate) * rate + 1
        pad = max_len - keep
        out = np.pad(data[:, :, :keep], [(0, 0), (0, 0), (0, pad)])
        mask = np.zeros(max_len, dtype=bool)
        mask[keep:] = True
        return out, mask, 0
    start = int(rng.integers(0, T - max_len + 1))
    return (data[:, :, start:start + max_len],
            np.zeros(max_len, dtype=bool), start)


def center_window(data: np.ndarray, max_len: int, align: int = 16
                  ) -> Tuple[np.ndarray, int]:
    """Deterministic eval crop (evaluator path,
    ``datasets/AMASS_dataset.py:181-192``): long clips center-cropped to
    ``max_len``; short clips truncated to ``(T-1)//align*align + 1``."""
    T = data.shape[2]
    if T > max_len:
        start = (T - max_len) // 2
        return data[:, :, start:start + max_len], start
    keep = ((T - 1) // align) * align + 1
    return data[:, :, :keep], 0


@DATASETS.register("amass")
class AmassReader:
    """Sample index + raw window loading for the AMASS joints h5."""

    def __init__(self, h5_path: str, splits: Sequence[str]):
        self.h5_path = h5_path
        self.splits = tuple(splits)
        self.samples: List[Tuple[str, str]] = []
        with h5py.File(h5_path, "r") as f:
            for name in splits:
                if name not in f:
                    continue
                for motion in f[name]:
                    self.samples.append((name, motion))
        self._file: Optional[h5py.File] = None

    def __len__(self) -> int:
        return len(self.samples)

    def _handle(self) -> h5py.File:
        # one persistent handle per reader (the reference re-opens the h5
        # per __getitem__, AMASS_dataset.py:302-311 — a known CPU cost)
        if self._file is None:
            self._file = h5py.File(self.h5_path, "r")
        return self._file

    def read_motion(self, dataset_key: str, motion_key: str) -> np.ndarray:
        """(T, J, D) on disk → (J, D, T) float32."""
        data = np.asarray(self._handle()[dataset_key][motion_key]["joints"])
        return np.ascontiguousarray(data.transpose(1, 2, 0),
                                    dtype=np.float32)

    def batches(self, rng: np.random.Generator, batch_size: int,
                max_len: int, rate: int, shuffle: bool = True,
                drop_last: bool = True, process_index: int = None,
                process_count: int = None) -> Iterator[dict]:
        """Yield raw batches {"motion3d": (B,52,3,L), "pad_mask": (B,L)}.

        Multi-host: every process draws the same shuffled order (seeded
        rng) and keeps its strided slice, so hosts read disjoint samples
        (``parallel.process_shard``); ``batch_size`` is per-process.
        ``process_index``/``process_count`` override jax's process info
        (testing / external launchers)."""
        from renderloom.parallel import process_shard

        order = np.arange(len(self.samples))
        if shuffle:
            rng.shuffle(order)
        order = order[process_shard(len(order), process_index,
                                    process_count)]
        motions, masks = [], []
        for idx in order:
            data = self.read_motion(*self.samples[idx])
            window, mask, _ = random_window(rng, data, max_len, rate)
            motions.append(window)
            masks.append(mask)
            if len(motions) == batch_size:
                yield {"motion3d": np.stack(motions),
                       "pad_mask": np.stack(masks)}
                motions, masks = [], []
        if motions and not drop_last:
            yield {"motion3d": np.stack(motions),
                   "pad_mask": np.stack(masks)}


def stats_paths(cfg: MotionDatasetConfig) -> Tuple[str, str]:
    """Reference-compatible cache filenames (AMASS_dataset.py:77-81)."""
    kind = "3D" if cfg.return_type == "3D" else "network"
    suffix = (f"{kind}_{cfg.camera_project}_"
              f"{cfg.focal:.0f}_{cfg.depth:.0f}.npy")
    root = cfg.data_root
    return (os.path.join(root, f"mean_pose_{suffix}"),
            os.path.join(root, f"std_pose_{suffix}"))


def compute_stats(reader: AmassReader, cfg: MotionDatasetConfig,
                  limit: Optional[int] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Mean/std of the localized default-view projection, averaged over
    motions (AMASS_dataset.py:267-299: a mean-of-per-motion-stats, not a
    global pass — reproduced since the shipped npys were computed so)."""
    from renderloom.ops import pose as pose_ops
    import jax.numpy as jnp

    mean_acc = 0.0
    std_acc = 0.0
    samples = reader.samples[:limit] if limit else reader.samples
    for dataset_key, motion_key in samples:
        motion = reader.read_motion(dataset_key, motion_key)
        data3d = pose_ops.rotate_motion_3d(
            pose_ops.centralize(jnp.asarray(motion)), None)
        if cfg.return_type == "3D":
            local = pose_ops.localize(data3d, pose_ops.ROOT_3D)
        else:
            p2d = pose_ops.project_2d(data3d, cfg.focal, cfg.depth,
                                      cfg.frame_boarder, cfg.camera_project)
            local = pose_ops.localize(pose_ops.joints_to_openpose(p2d),
                                      pose_ops.ROOT_2D)
        local = np.asarray(local, dtype=np.float64)
        mean_acc = mean_acc + local.mean(axis=2)
        std_acc = std_acc + local.std(axis=2)
    n = len(samples)
    if n == 0:
        raise ValueError(
            "AMASS reader matched no motions — check that the h5's "
            "top-level groups intersect the configured split "
            f"(reader splits: {reader.splits})")
    mean = mean_acc / n
    std = std_acc / n
    std[std == 0] = 1e-9
    return mean.astype(np.float32), std.astype(np.float32)


def load_or_compute_stats(reader: Optional[AmassReader],
                          cfg: MotionDatasetConfig,
                          limit: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    mean_path, std_path = stats_paths(cfg)
    if os.path.exists(mean_path) and os.path.exists(std_path):
        return (np.load(mean_path).astype(np.float32),
                np.load(std_path).astype(np.float32))
    if reader is None:
        raise FileNotFoundError(
            f"no cached stats at {mean_path} and no dataset to compute "
            "them from")
    mean, std = compute_stats(reader, cfg, limit)
    os.makedirs(cfg.data_root, exist_ok=True)
    np.save(mean_path, mean)
    np.save(std_path, std)
    return mean, std
