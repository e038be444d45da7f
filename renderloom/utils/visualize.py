"""Visualization: skeleton rendering, GIF/mp4 export, eval pretty-print.

Counterparts of the reference's viz utilities
(``Human_Motion_Modelling/utils/visualize.py:12-189`` and
``Pose_Guided_Neural_Rendering/utils/visualize.py:11-85``), built on the
on-device rasterizer instead of per-frame cv2 ellipse loops: a motion
clip is rasterized as a batch of colored-skeleton frames in one jitted
call, then written with imageio.
"""

from __future__ import annotations

import os
from typing import Dict, List, Mapping, Optional

import numpy as np


def print_evaluation(results: Mapping[str, float], epoch: int = 0,
                     history_path: Optional[str] = None) -> str:
    """Console + history.txt eval report
    (Human_Motion_Modelling/utils/visualize.py:12-27)."""
    lines = [f"--------- evaluation (epoch {epoch}) ---------"]
    for key in sorted(results):
        lines.append(f"  {key:<14s} {results[key]:.6f}")
    text = "\n".join(lines)
    print(text, flush=True)
    if history_path:
        os.makedirs(os.path.dirname(history_path) or ".", exist_ok=True)
        with open(history_path, "a") as f:
            f.write(text + "\n")
    return text


def render_skeleton_frames(motion: np.ndarray, height: int = 512,
                           width: int = 512) -> np.ndarray:
    """(19, 2, L) global joint positions in pixel coords → (L, H, W, 3)
    uint8 skeleton frames (joints2image equivalent,
    Human_Motion_Modelling/utils/visualize.py:67-189), rasterized on
    device in one batched call."""
    import jax
    import jax.numpy as jnp

    from renderloom.ops.rasterize import skeleton_image

    coords = jnp.asarray(motion.transpose(2, 0, 1))          # (L, 19, 2)
    conf = jnp.ones(coords.shape[:2])
    imgs = jax.vmap(lambda c, cf: skeleton_image(
        c, cf, height, width, brush=2.0))(coords, conf)
    arr = np.asarray(jnp.clip(imgs, 0, 1) * 255).astype(np.uint8)
    return arr.transpose(0, 2, 3, 1)


def motion2gif(motion: np.ndarray, path: str, height: int = 512,
               width: int = 512, fps: int = 25,
               scale: float = 128.0, offset: float = 256.0) -> str:
    """Write a skeleton GIF for a (19, 2, L) normalized motion
    (``motion2gif``, utils/visualize.py:29-64; render transform = ×128
    + 256, models/evaluator.py:248-250)."""
    import imageio.v2 as imageio

    pixels = motion * scale + offset
    frames = render_skeleton_frames(pixels, height, width)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, list(frames), duration=1.0 / fps)
    return path


def make_grid_video(streams: Dict[str, List[np.ndarray]], path: str,
                    fps: int = 30, cols: int = 3) -> str:
    """2×3-style grid mp4 of named frame streams (Predict/Mask/Fuse/
    DAIN/GT/Skeleton — Pose_Guided_Neural_Rendering/utils/visualize.py:
    38-85).  Streams are equal-length lists of (H, W, 3) or (H, W)
    arrays in [0, 1] or [-1, 1]."""
    import imageio.v2 as imageio

    names = list(streams)
    n = len(names)
    rows = (n + cols - 1) // cols
    length = min(len(v) for v in streams.values())

    def to_u8(img):
        img = np.asarray(img, dtype=np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        if img.min() < 0:
            img = img * 0.5 + 0.5
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grids = []
    for i in range(length):
        tiles = [to_u8(streams[k][i]) for k in names]
        h, wd = tiles[0].shape[:2]
        tiles = [t if t.shape[:2] == (h, wd) else
                 np.zeros((h, wd, 3), np.uint8) for t in tiles]
        while len(tiles) < rows * cols:
            tiles.append(np.zeros((h, wd, 3), np.uint8))
        grid = np.concatenate([
            np.concatenate(tiles[r * cols:(r + 1) * cols], axis=1)
            for r in range(rows)], axis=0)
        # mp4 needs even dims
        grids.append(grid[:grid.shape[0] // 2 * 2,
                          :grid.shape[1] // 2 * 2])
    return write_video(grids, path, fps)


def write_video(frames: List[np.ndarray], path: str, fps: int = 30
                ) -> str:
    """Write frames as mp4 when an ffmpeg backend exists, else fall back
    to GIF next to the requested path (this image ships no ffmpeg)."""
    import imageio.v2 as imageio

    try:
        with imageio.get_writer(path, fps=fps) as w:
            for f in frames:
                w.append_data(f)
        return path
    except (ValueError, ImportError):
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(alt, frames, duration=1.0 / fps)
        print(f"no mp4 backend — wrote {alt} instead")
        return alt
