"""Metrics logging: console + JSONL (+ tensorboard when available).

The reference logs scalars to tensorboard and appends eval text to
``history.txt`` (``*/utils/record_summary.py``, ``utils/visualize.py:12-27``).
Here the primary sink is an append-only ``metrics.jsonl`` (machine-readable,
diff-able, no dependency), with tensorboard as an optional extra, plus the
reference's per-run source snapshot feature
(``Human_Motion_Modelling/utils/utils.py:48-54``) kept as
:func:`snapshot_source`.
"""

from __future__ import annotations

import json
import os
import time
import zipfile
from typing import Mapping


class MetricLogger:
    def __init__(self, out_dir: str, name: str = "metrics"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.jsonl")
        self._tb = None
        try:  # tensorboard is optional
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
        except Exception:
            self._tb = None

    def log(self, step: int, scalars: Mapping[str, float], prefix: str = ""):
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            record[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def console(self, step: int, scalars: Mapping[str, float],
                header: str = ""):
        parts = [f"{k}={float(v):.5f}" for k, v in scalars.items()]
        print(f"[{header}step {step}] " + " ".join(parts), flush=True)

    def log_images(self, step: int, images: Mapping[str, "object"],
                   prefix: str = ""):
        """Image summaries (the renderer-only TB images of
        ``Pose_Guided_Neural_Rendering/utils/record_summary.py:17-27``):
        written as PNGs under ``<out>/images/`` and to tensorboard when
        available.  Accepts (H, W, C) or (H, W) arrays in [0,1]/[-1,1].
        """
        import numpy as np

        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        for name, img in images.items():
            arr = np.asarray(img, dtype=np.float32)
            if arr.ndim == 2:
                arr = arr[..., None].repeat(3, axis=-1)
            if arr.min() < 0:
                arr = arr * 0.5 + 0.5
            arr8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            try:
                from PIL import Image
                safe = name.replace("/", "_")
                Image.fromarray(arr8).save(os.path.join(
                    img_dir, f"{safe}_{int(step):08d}.png"))
            except Exception:
                pass
            if self._tb is not None:
                self._tb.add_image(f"{prefix}{name}",
                                   arr8.transpose(2, 0, 1), int(step))


def snapshot_source(out_dir: str, package_root: str):
    """Zip the package source into the run dir for provenance."""
    os.makedirs(out_dir, exist_ok=True)
    zpath = os.path.join(out_dir, "code.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(package_root):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    zf.write(full, os.path.relpath(full,
                                                   os.path.dirname(
                                                       package_root)))
    return zpath
