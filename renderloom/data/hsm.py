"""HumanSloMo h5 reading + on-device window preparation.

Host side (:class:`HsmReader`) reads the reference's ``HumanSlomo.h5``
layout unchanged — per-clip groups with variable-length PNG/JPG byte
datasets ``train_images/train_dain/train_poses`` and ``gt_*``
(``HumanSloMo_Dataset/lib/gen_dataset_h5.py:57-174``) — and only decodes
bytes to uint8 arrays.

Device side (:func:`prepare_train_window`) replaces the reference's
per-frame CPU work in DataLoader workers
(``Pose_Guided_Neural_Rendering/datasets/HSM_auto_dataset.py:103-173``):
one shared affine (resize + shift/scale/rotate) per window applied to
images *and* keypoints, [-1,1] normalization, heatmap/skeleton/mask
rasterization, and the background pipeline (DAIN frame of t−1, frame 0
zeroed, gaussian-blurred body parts pasted at ``random_blur_rate`` to
simulate warp artifacts) — all inside jit.
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

import jax
import jax.numpy as jnp

from renderloom.core.config import RendererDataConfig
from renderloom.core.registry import DATASETS
from renderloom.ops import image as img_ops
from renderloom.ops import rasterize as raster


def decode_image(buf: np.ndarray) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(buf.tobytes())).convert("RGB"))


def decode_images(bufs: Sequence[np.ndarray]) -> np.ndarray:
    """Decode same-sized PNG/JPEG byte buffers to (n, H, W, 3) uint8 with
    the multithreaded C++ decoder (renderloom/native/decoder.cpp);
    falls back to PIL when the extension can't build."""
    from renderloom import native
    w, h = native.image_dims(bufs[0].tobytes())
    return native.batch_decode(bufs, h, w)


@DATASETS.register("hsm")
class HsmReader:
    """Window sampler over the HumanSlomo h5 (train or test phase)."""

    def __init__(self, h5_path: str, video_list: Sequence[str],
                 phase: str = "train", max_frames: int = 4):
        self.h5_path = h5_path
        self.phase = phase
        self.max_frames = max_frames
        self.video_list = list(video_list)
        img_key = "train_images" if phase == "train" else "gt_images"
        self.n_frames: Dict[str, int] = {}
        self.samples: List[Tuple[str, int]] = []
        with h5py.File(h5_path, "r") as f:
            for vid in self.video_list:
                if vid not in f:
                    continue
                n = len(f[vid][img_key])
                self.n_frames[vid] = n
                # safe sliding windows (the reference over-runs by 2:
                # HSM_auto_dataset.py:94 — a latent bug, not reproduced)
                for start in range(max(n - max_frames + 1, 0)):
                    self.samples.append((vid, start))
        self._file: Optional[h5py.File] = None

    def __len__(self):
        return len(self.samples)

    def set_max_frames(self, max_frames: int):
        """Curriculum: regrow windows at a new length (the reference's
        ``update_max_frame``, HSM_auto_dataset.py:339-358, minus its
        ``videl_list``/``train_fake`` typos)."""
        self.__init__(self.h5_path, self.video_list, self.phase,
                      max_frames)

    def _handle(self) -> h5py.File:
        if self._file is None:
            self._file = h5py.File(self.h5_path, "r")
        return self._file

    def read_window(self, vid: str, start: int
                    ) -> Dict[str, np.ndarray]:
        """Decode one window: images (F,H0,W0,3) u8, dain (F,H0,W0,3) u8
        (entry i = DAIN frame start+i−1; entry for frame 0 of the clip is
        zeros, HSM_auto_dataset.py:148-149,190-203), poses (F,19,3)."""
        f = self._handle()
        grp = f[vid]
        key_img = "train_images" if self.phase == "train" else "gt_images"
        key_dain = "train_dain" if self.phase == "train" else "gt_dain"
        key_pose = "train_poses" if self.phase == "train" else "gt_poses"
        idxs = list(range(start, start + self.max_frames))
        bufs = [np.asarray(grp[key_img][i]) for i in idxs]
        dain_idxs = [i - 1 for i in idxs if i > 0]
        bufs += [np.asarray(grp[key_dain][i]) for i in dain_idxs]
        decoded = decode_images(bufs)  # one parallel native decode
        imgs = decoded[:len(idxs)]
        dain_decoded = decoded[len(idxs):]
        dains = np.zeros_like(imgs)
        dains[len(idxs) - len(dain_idxs):] = dain_decoded
        poses = np.asarray(grp[key_pose][start:start + self.max_frames],
                           dtype=np.float32)
        return {"images": imgs, "dain": dains, "poses": poses}

    def read_test_frame(self, vid: str, index: int) -> Dict[str, np.ndarray]:
        """Eval fetch (HSM_auto_dataset.py:361-399): gt image, same-index
        gt DAIN frame, pose row."""
        f = self._handle()
        grp = f[vid]
        return {
            "image": decode_image(np.asarray(grp["gt_images"][index])),
            "dain": decode_image(np.asarray(grp["gt_dain"][index])),
            "pose": np.asarray(grp["gt_poses"][index], dtype=np.float32),
        }

    def batches(self, rng: np.random.Generator, batch_size: int,
                shuffle: bool = True, drop_last: bool = True,
                process_index: int = None, process_count: int = None):
        """Multi-host: same shuffled order on every process (seeded rng),
        each keeps its strided slice → disjoint reads; ``batch_size`` is
        per-process (``parallel.process_shard``).  ``process_index``/
        ``process_count`` override jax's process info (testing /
        external launchers)."""
        from renderloom.parallel import process_shard

        order = np.arange(len(self.samples))
        if shuffle:
            rng.shuffle(order)
        order = order[process_shard(len(order), process_index,
                                    process_count)]
        buf = []
        for idx in order:
            buf.append(self.read_window(*self.samples[idx]))
            if len(buf) == batch_size:
                yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                buf = []
        if buf and not drop_last:
            yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}


# ---------------------------------------------------------------------------
# On-device preparation
# ---------------------------------------------------------------------------


def _window_affine(key: Optional[jax.Array], src_h: int, src_w: int,
                   cfg: RendererDataConfig, train: bool):
    """Shared per-window transform: resize to load size, then random
    shift/scale/rotate (HSM_auto_dataset.py:103-116; shift ±0.0625,
    rotate ±10°, scale ±0.1)."""
    resize = img_ops.resize_matrix(src_h, src_w, cfg.load_height,
                                   cfg.load_width)
    if not train or key is None:
        return resize
    k1, k2, k3 = jax.random.split(key, 3)
    shift = jax.random.uniform(k1, (), minval=-0.0625, maxval=0.0625)
    angle = jax.random.uniform(k2, (), minval=-10.0, maxval=10.0)
    scale = jax.random.uniform(k3, (), minval=-0.1, maxval=0.1)
    ssr = img_ops.shift_scale_rotate_matrix(cfg.load_height,
                                            cfg.load_width, shift, shift,
                                            scale, angle)
    return img_ops.compose_affine(ssr, resize)


def prepare_window(key: Optional[jax.Array], images: jax.Array,
                   dain: jax.Array, poses: jax.Array,
                   cfg: RendererDataConfig, train: bool = True
                   ) -> Dict[str, jax.Array]:
    """One window, fully on device.

    Args:
      key: PRNG key (None → deterministic eval path).
      images: (F, H0, W0, 3) uint8/float.
      dain: (F, H0, W0, 3) uint8/float, already t−1-shifted on host.
      poses: (F, 19, 3) xy+conf in source pixel coordinates.

    Returns label (F,H,W,22), image/back (F,H,W,3) in [-1,1],
    fg_mask (F,H,W,1).
    """
    F = images.shape[0]
    H, W = cfg.model_height, cfg.model_width
    if key is not None:
        k_aff, k_ras, k_blur = jax.random.split(key, 3)
    else:
        k_aff = k_ras = k_blur = None

    to_unit = lambda x: x.astype(jnp.float32) / 127.5 - 1.0
    if (key is None or not train) and (
            images.shape[1] == H and images.shape[2] == W
            and cfg.load_height == H and cfg.load_width == W):
        # statically-identity affine (deterministic path, source already
        # at load==model size): skip the two full-stream bilinear warps
        images_t = to_unit(images)
        dain_t = to_unit(dain)
        coords = poses[:, :, :2].astype(jnp.float32)
    elif key is None or not train:
        # deterministic path, source NOT at model size: the window
        # affine is STATICALLY the pure resize_matrix (no
        # shift/scale/rotate), so the bilinear warp factorizes into
        # separable per-axis matmuls that ride the MXU instead of the
        # per-pixel 2-D gathers (the dominant cost of disk-resolution
        # ingest — BASELINE.md prep@disk bisect).
        src_h, src_w = images.shape[1], images.shape[2]
        res = lambda x: img_ops.separable_resize(
            to_unit(x), cfg.load_height, cfg.load_width, H, W)
        images_t = res(images)
        dain_t = res(dain)
        scale = jnp.array([np.float32(cfg.load_width / src_w),
                           np.float32(cfg.load_height / src_h)])
        coords = poses[:, :, :2].astype(jnp.float32) * scale
    else:
        m = _window_affine(k_aff, images.shape[1], images.shape[2], cfg,
                           train)
        warp = jax.vmap(lambda im: img_ops.affine_warp(im, m, H, W))
        images_t = warp(to_unit(images))
        dain_t = warp(to_unit(dain))
        coords = jax.vmap(
            lambda p: img_ops.transform_keypoints(p[:, :2], m))(poses)
    conf = poses[:, :, 2]

    ras = raster.rasterize_frames(
        k_ras, coords, conf, H, W, gauss_sigma=cfg.gauss_sigma,
        random_drop_prob=cfg.random_drop_prob,
        random_blur_rate=cfg.random_blur_rate, thres=cfg.skeleton_thres,
        foot_thres=cfg.foot_thres, train=train)

    # label = 3ch skeleton in [-1,1] + 19ch heatmaps (trainer.py:152:
    # skeleton goes through to_tensor_norm, heatmaps stay [0,1])
    skel = jnp.transpose(ras["skeleton"], (0, 2, 3, 1)) * 2.0 - 1.0
    heat = jnp.transpose(ras["heatmaps"], (0, 2, 3, 1))
    label = jnp.concatenate([skel, heat], axis=-1)
    fg_mask = ras["mask"][..., None].astype(jnp.float32)

    back = dain_t
    if train and k_blur is not None:
        blur = jax.vmap(lambda im: img_ops.gaussian_blur(im, 10.0))(back)
        part = ras["part_mask"][..., None].astype(jnp.float32)
        back = blur * part + back * (1.0 - part)
    # frame 0's background is zeroed on host already (dain row of zeros →
    # to_unit maps 0 → -1; reference uses literal zeros in normalized
    # space, HSM_auto_dataset.py:148-149) — force exact zeros:
    back = back.at[0].set(jnp.where(jnp.any(jnp.abs(dain[0]) > 0), back[0],
                                    jnp.zeros_like(back[0])))

    return {"label": label, "image": images_t, "back": back,
            "fg_mask": fg_mask}


def prepare_batch(key: Optional[jax.Array], batch: Dict[str, jax.Array],
                  cfg: RendererDataConfig, train: bool = True,
                  fused_raster: bool = False, label_dtype=None,
                  packed_label: bool = False, want_masks: bool = True):
    """Batched window preparation.

    ``fused_raster=False``: straight vmap of :func:`prepare_window`.
    ``fused_raster=True``: geometric transforms stay vmapped per window,
    but all B×F frames are rasterized in ONE call to the fused Pallas
    kernel (``renderloom.ops.rasterize_pallas``) — the TPU-preferred
    path (one kernel launch; the kernel emits the final NHWC label
    directly, so the stream is written exactly once).
    ``label_dtype``: emit the 22ch label stream in this dtype (bf16 on
    TPU halves the pipeline's dominant write; the fused kernel casts at
    the store).  Default keeps float32 (training parity).
    ``packed_label``: emit the label parity-packed, (B,F,H/2,W/2,88) =
    ``fastpath.space_to_depth`` per frame — the parity-layout inference
    generator consumes it with zero input repacking.
    ``want_masks=False`` (inference serving only, ``train=False``):
    drop ``fg_mask`` from the output — on the fused path the kernel
    then skips the 39 mask capsules per pixel entirely.
    """
    B = batch["images"].shape[0]
    if not fused_raster:
        if key is not None:
            keys = jax.random.split(key, B)
            out = jax.vmap(lambda k, i, d, p: prepare_window(
                k, i, d, p, cfg, train))(keys, batch["images"],
                                         batch["dain"], batch["poses"])
        else:
            out = jax.vmap(lambda i, d, p: prepare_window(
                None, i, d, p, cfg, train))(batch["images"],
                                            batch["dain"],
                                            batch["poses"])
        if label_dtype is not None:
            out = dict(out, label=out["label"].astype(label_dtype))
        if packed_label:
            from renderloom.models.fastpath import space_to_depth
            lbl = out["label"]
            Bb, F = lbl.shape[:2]
            out = dict(out, label=space_to_depth(
                lbl.reshape((Bb * F,) + lbl.shape[2:])
            ).reshape((Bb, F, lbl.shape[2] // 2, lbl.shape[3] // 2, 88)))
        if not want_masks and not train:
            out = {k: v for k, v in out.items() if k != "fg_mask"}
        return out

    from renderloom.ops.rasterize_pallas import rasterize_frames_fused

    images = batch["images"]
    dain = batch["dain"]
    poses = batch["poses"]
    F = images.shape[1]
    H, W = cfg.model_height, cfg.model_width
    if key is not None:
        k_geo, k_ras, k_blur = jax.random.split(key, 3)
        geo_keys = jax.random.split(k_geo, B)
    else:
        k_ras = k_blur = None
        geo_keys = None

    # Deterministic path + source already at load==model size → the
    # affine is STATICALLY the identity: skip the two full-stream
    # bilinear gather warps (the dominant non-raster cost of eval/
    # serving prep — gathers are the expensive primitive on TPU, and
    # at the identity they resample every pixel onto itself).
    identity_eval = (key is None or not train) and (
        images.shape[2] == H and images.shape[3] == W
        and cfg.load_height == H and cfg.load_width == W)

    def warp_window(k, imgs, dns, pose):
        to_unit = lambda x: x.astype(jnp.float32) / 127.5 - 1.0
        if identity_eval:
            return (to_unit(imgs), to_unit(dns),
                    pose[:, :, :2].astype(jnp.float32),
                    pose[:, :, 2])
        if k is not None:
            k_aff, kb = jax.random.split(k)
        else:
            k_aff = kb = None
        if k_aff is None or not train:
            # statically a pure resize — separable MXU matmuls (see
            # prepare_window's deterministic branch)
            src_h, src_w = imgs.shape[1], imgs.shape[2]
            res = lambda x: img_ops.separable_resize(
                to_unit(x), cfg.load_height, cfg.load_width, H, W)
            scale = jnp.array([np.float32(cfg.load_width / src_w),
                               np.float32(cfg.load_height / src_h)])
            return (res(imgs), res(dns),
                    pose[:, :, :2].astype(jnp.float32) * scale,
                    pose[:, :, 2])
        m = _window_affine(k_aff, imgs.shape[1], imgs.shape[2], cfg,
                           train)
        warp = jax.vmap(lambda im: img_ops.affine_warp(im, m, H, W))
        imgs_t = warp(to_unit(imgs))
        dns_t = warp(to_unit(dns))
        coords = jax.vmap(
            lambda p: img_ops.transform_keypoints(p[:, :2], m))(pose)
        return imgs_t, dns_t, coords, pose[:, :, 2]

    if geo_keys is not None:
        images_t, dain_t, coords, conf = jax.vmap(warp_window)(
            geo_keys, images, dain, poses)
    else:
        images_t, dain_t, coords, conf = jax.vmap(
            lambda i, d, p: warp_window(None, i, d, p))(images, dain,
                                                        poses)

    emit_masks = want_masks or (train and key is not None)
    ras = rasterize_frames_fused(
        k_ras, coords.reshape(B * F, -1, 2), conf.reshape(B * F, -1),
        H, W, gauss_sigma=cfg.gauss_sigma,
        random_drop_prob=cfg.random_drop_prob,
        random_blur_rate=cfg.random_blur_rate, thres=cfg.skeleton_thres,
        foot_thres=cfg.foot_thres, train=train and key is not None,
        out_dtype=label_dtype or jnp.float32,
        layout="packed" if packed_label else "nhwc",
        emit_masks=emit_masks)

    if packed_label:
        label = ras["label"].reshape(B, F, H // 2, W // 2, 88)
    else:
        label = ras["label"].reshape(B, F, H, W, 22)

    back = dain_t
    if train and k_blur is not None:
        part = ras["part_mask"].reshape(B, F, H, W, 1)
        blur = jax.vmap(jax.vmap(
            lambda im: img_ops.gaussian_blur(im, 10.0)))(back)
        back = blur * part + back * (1.0 - part)
    # zero frame-0 backgrounds where the host shipped a zero dain row
    zero0 = jnp.all(dain[:, 0] == 0, axis=(1, 2, 3))
    back = back.at[:, 0].set(
        jnp.where(zero0[:, None, None, None], 0.0, back[:, 0]))

    out = {"label": label, "image": images_t, "back": back}
    if want_masks:                   # emit_masks is then always True
        out["fg_mask"] = ras["mask"].reshape(B, F, H, W, 1)
    return out
