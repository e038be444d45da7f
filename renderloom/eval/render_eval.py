"""Renderer evaluation: PSNR/SSIM vs the warped-background baseline.

Rebuild of ``Pose_Guided_Neural_Rendering/models/evaluator.py``:

* :func:`evaluate_h5` — the training-time metric
  (``evaluate_from_dataset``, evaluator.py:48-147): per test clip,
  autoregressive rollout at sample_rate 2 (even frames pass through as
  keyframes), foreground-masked PSNR/SSIM on generated frames for both
  the fused output and the raw warped background →
  ``{DAIN_PSNR, DAIN_SSIM, OURS_PSNR, OURS_SSIM}``;
* :func:`render_folder` — the inference path
  (``evaluate_from_folder``, evaluator.py:165-269): an ``inputs/`` +
  ``DAIN/`` + ``Predict_motion/`` folder triple → generated frames, with
  ``sample_rate = 2^⌊log2((F−1)/(K−1))⌋`` derived from pose vs keyframe
  counts (evaluator.py:187-191).

The rollout itself is the jitted scan from
:func:`renderloom.train.gan.make_rollout`; frames are prepared on device
via :func:`renderloom.data.hsm.prepare_window`.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import RendererConfig
from renderloom.data import openpose as op_io
from renderloom.data.hsm import HsmReader, prepare_window
from renderloom.ops.image import masked_metrics
from renderloom.train.gan import (fold_spectral_norm,
                                  make_inference_generator,
                                  make_inference_pair, make_rollout,
                                  make_segment_rollout, rollout_chunked,
                                  segment_rollout_chunked)


def evaluate_h5(gen, state, cfg: RendererConfig, reader: HsmReader,
                max_keyframes: Optional[int] = None,
                chunk: int = 64, perceptual=None,
                video_dir: Optional[str] = None) -> Dict[str, float]:
    """Training-time eval over the h5 test split (evaluator.py:48-147).

    Pass a :class:`~renderloom.models.perceptual.PerceptualLoss` as
    ``perceptual`` to additionally report uncalibrated LPIPS-vgg
    (``*_LPIPS``, the BASELINE.md delta metric).  ``video_dir`` writes a
    per-clip Fuse/Mask/Warp/GT/Skeleton grid video — the reference's
    ``gen_videos`` output (evaluator.py:142-143,
    ``utils/visualize.py:make_video``).  ``chunk`` bounds device memory:
    the rollout runs in fixed-size segments."""
    sample_rate = 2
    # segment-parallel rollout (exact; keyframes reset the chain — see
    # make_segment_rollout) when the clip is a whole number of segments;
    # generic sequential scan otherwise.  Spectral norm folded once for
    # inference (bit-identical, no per-frame power iterations).
    inf_gen, g_params = make_inference_pair(cfg, state.params_g,
                                            state.stats_g)
    seg_rollout = make_segment_rollout(inf_gen, cfg, sample_rate)
    gen_rollout = make_rollout(inf_gen, cfg)
    d = cfg.data
    totals = {"DAIN_PSNR": 0.0, "DAIN_SSIM": 0.0, "OURS_PSNR": 0.0,
              "OURS_SSIM": 0.0}
    if perceptual is not None:
        totals.update({"DAIN_LPIPS": 0.0, "OURS_LPIPS": 0.0})
        lpips_fn = jax.jit(perceptual.lpips)
    cnt = 0

    for vid in reader.video_list:
        if vid not in reader.n_frames:
            continue
        total = reader.n_frames[vid]
        limit = max_keyframes if max_keyframes is not None else d.eval_frames
        seq_len = min(limit * sample_rate + 1, total)

        frames = [reader.read_test_frame(vid, i) for i in range(seq_len)]
        images = np.stack([f["image"] for f in frames])
        dain = np.stack([f["dain"] for f in frames])
        poses = np.stack([f["pose"] for f in frames])
        prep = prepare_window(None, jnp.asarray(images), jnp.asarray(dain),
                              jnp.asarray(poses), d, train=False)

        batch = {
            "label": prep["label"][None],
            "back": prep["back"][None],
            "key_img": prep["image"][None],
        }
        if (seq_len - 1) % sample_rate == 0:
            fused, masks = segment_rollout_chunked(
                seg_rollout, g_params, {}, batch,
                sample_rate, seg_chunk=max(chunk // sample_rate, 1))
        else:
            batch["is_key"] = jnp.asarray(
                np.arange(seq_len) % sample_rate == 0)
            fused, masks = rollout_chunked(gen_rollout, g_params, {},
                                           batch, chunk=chunk)

        if video_dir:
            from renderloom.utils.visualize import make_grid_video

            os.makedirs(video_dir, exist_ok=True)
            streams = {
                "Fuse": [np.asarray(fused[0, i]) for i in range(seq_len)],
                "Mask": [np.asarray(masks[0, i, :, :, 0])
                         for i in range(seq_len)],
                "Warp": [np.asarray(prep["back"][i])
                         for i in range(seq_len)],
                "GT": [np.asarray(prep["image"][i])
                       for i in range(seq_len)],
                "Skeleton": [np.asarray(prep["label"][i, :, :, :3])
                             for i in range(seq_len)],
            }
            make_grid_video(streams, os.path.join(video_dir,
                                                  f"{vid}.mp4"))

        # batch the generated (non-keyframe) frames into one metrics
        # dispatch per clip: psnr averages per-sample values and the
        # equal-sized ssim maps mean identically, so this matches the
        # reference's frame-by-frame accumulation exactly
        gen_idx = np.asarray(
            [i for i in range(seq_len) if i % sample_rate != 0])
        if gen_idx.size == 0:
            continue
        fg = prep["fg_mask"][gen_idx]
        gt = prep["image"][gen_idx]
        ours = fused[0, gen_idx]
        back = prep["back"][gen_idx]
        n = int(gen_idx.size)
        ps, ss = masked_metrics(ours, gt, fg)
        totals["OURS_PSNR"] += float(ps) * n
        totals["OURS_SSIM"] += float(ss) * n
        ps, ss = masked_metrics(back, gt, fg)
        totals["DAIN_PSNR"] += float(ps) * n
        totals["DAIN_SSIM"] += float(ss) * n
        if perceptual is not None:
            totals["OURS_LPIPS"] += float(
                jnp.sum(lpips_fn(ours * fg, gt * fg)))
            totals["DAIN_LPIPS"] += float(
                jnp.sum(lpips_fn(back * fg, gt * fg)))
        cnt += n

    return {k: v / max(cnt, 1) for k, v in totals.items()}


def _load_folder_images(path: str) -> List[str]:
    return [os.path.join(path, f) for f in sorted(os.listdir(path))
            if f.lower().endswith((".png", ".jpg", ".jpeg"))]


def render_folder(gen, state, cfg: RendererConfig, input_dir: str,
                  dain_dir: str, pose_dir: str, out_dir: str) -> int:
    """Folder inference (evaluator.py:165-269): keyframe images +
    DAIN-interpolated backgrounds + upsampled pose JSONs → fused frames
    written as PNGs.  Returns the number of frames written."""
    from PIL import Image

    d = cfg.data
    key_paths = _load_folder_images(input_dir)
    dain_paths = _load_folder_images(dain_dir)
    pose_files = sorted(f for f in os.listdir(pose_dir)
                        if f.endswith(".json"))
    num_poses = len(pose_files)
    num_keys = len(key_paths)
    ratio = max((num_poses - 1) // max(num_keys - 1, 1), 1)
    rate = 2 ** int(math.log2(ratio))
    seq_len = (num_keys - 1) * rate + 1

    H, W = d.model_height, d.model_width

    def load(path):
        img = Image.open(path).convert("RGB")
        return np.asarray(img)

    # poses: openpose JSONs in image coordinates (unnormalized read)
    motion, conf, _ = op_io.read_openpose_dir(pose_dir, scale=1.0,
                                              offset=0.0)
    poses = np.concatenate([motion.transpose(2, 0, 1),
                            conf.transpose(2, 0, 1)], axis=2)[:seq_len]

    images = np.zeros((seq_len,) + load(dain_paths[0]).shape, np.uint8)
    for k, p in enumerate(key_paths[:((seq_len - 1) // rate) + 1]):
        images[k * rate] = load(p)
    dain = np.stack([load(p) for p in dain_paths[:seq_len]])

    # inference background = DAIN frame at t (not t−1): the folder layout
    # provides per-frame warped backgrounds directly (evaluator.py:246).
    # Long clips: preparation AND rollout run per segment-aligned chunk —
    # each chunk starts at a keyframe, which resets the autoregressive
    # chain, so no carry crosses chunks and the segments inside a chunk
    # run batched (make_segment_rollout).  Device memory stays O(chunk);
    # frames stream to disk.
    inf_gen, g_params = make_inference_pair(cfg, state.params_g,
                                            state.stats_g)
    rollout = make_segment_rollout(inf_gen, cfg, rate)
    os.makedirs(out_dir, exist_ok=True)
    S = (seq_len - 1) // rate
    seg_chunk = max(min(16, S), 64 // rate)
    for s0 in range(0, S, seg_chunk):
        s1 = min(s0 + seg_chunk, S)
        start, end = s0 * rate, s1 * rate + 1
        pad = (seg_chunk - (s1 - s0)) * rate

        def cut(arr_np):
            seg = arr_np[start:end]
            if pad:
                seg = np.concatenate(
                    [seg, np.repeat(seg[-1:], pad, axis=0)], axis=0)
            return seg

        prep = prepare_window(None, jnp.asarray(cut(images)),
                              jnp.asarray(cut(dain)),
                              jnp.asarray(cut(poses).astype(np.float32)),
                              d, train=False)
        batch = {
            "label": prep["label"][None],
            "back": prep["back"][None],
            "key_img": prep["image"][None],
        }
        fused, _ = rollout(g_params, {}, batch)
        # final chunk writes its closing keyframe; earlier chunks leave
        # it to the next chunk (it is that chunk's first frame)
        valid = (end - start) if s1 == S else (end - start - 1)
        arr = np.asarray(jnp.clip(fused[0, :valid] * 0.5 + 0.5, 0, 1)
                         * 255).astype(np.uint8)
        for i in range(valid):
            Image.fromarray(arr[i]).save(
                os.path.join(out_dir, f"{start + i:05d}.png"))
    return seq_len
