"""Dataset production: downloads, clip extraction, h5 packing.

Rebuild of the ``HumanSloMo_Dataset`` stage (SURVEY.md §2.3) with
identical on-disk formats so reference artifacts interchange freely:

* :func:`emit_download_script` — diff ``video.csv`` against existing
  mp4s and emit youtube-dl commands (``lib/download.py:6-52``);
* :func:`extract_clips` — pull listed frames out of videos, center-crop
  to 1080 wide, resize to 768×512 (``lib/gen_dataset.py:12-48``);
* :func:`pack_hsm_h5` — folder tree → ``HumanSlomo.h5`` with vlen
  PNG-byte datasets and float64 (F,19,3) pose arrays parsed from
  openpose JSONs with largest-bbox selection + hand averaging
  (``lib/gen_dataset_h5.py:57-174``);
* :func:`pack_amass_h5` — SMPL-H joint export.  The reference runs the
  external ``human_body_prior`` BodyModel (``Human_Motion_Modelling/
  AMASS/gen_amass_h5.py:34-94``); here the forward-kinematics step is
  gated on that package being importable, with a precomputed-joints npz
  path as the alternative input.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, Sequence

import h5py
import numpy as np

from renderloom.data import openpose as op_io


def emit_download_script(csv_file: str, video_dir: str,
                         out_script: str) -> int:
    """Write youtube-dl commands for videos not yet present.  Returns
    the number of commands emitted (lib/download.py:42-52)."""
    existing = set()
    if os.path.isdir(video_dir):
        existing = {os.path.splitext(f)[0] for f in os.listdir(video_dir)
                    if f.endswith(".mp4")}
    n = 0
    with open(csv_file) as f, open(out_script, "w") as out:
        for row in csv.DictReader(f):
            fid, vid, fps = (row["File_name"], row["Youtube_id"],
                             row["FPS"])
            if fid in existing:
                continue
            target = os.path.join(video_dir, f"{fid}.mp4")
            out.write(
                f"youtube-dl -f 'bestvideo[height<=720][fps<={fps}]"
                f"[ext=mp4]' \"https://www.youtube.com/watch?v={vid}\" "
                f"-o \"{target}\"\n")
            n += 1
    return n


def extract_clips(video_dir: str, clip_json: str, out_dir: str,
                  crop: tuple = (100, 1180), size: tuple = (768, 512)
                  ) -> int:
    """Extract the frames listed per clip in ``clip_json``
    ({clip: {video_name, video_frames[], num_frames}}) from mp4s,
    center-crop columns ``crop`` and resize to ``size``
    (lib/gen_dataset.py:12-41).  Returns frames written."""
    import cv2

    with open(clip_json) as f:
        clips = json.load(f)

    written = 0
    for clip_name, clip in clips.items():
        clip_out = os.path.join(out_dir, clip_name)
        os.makedirs(clip_out, exist_ok=True)
        wanted = set(clip["video_frames"])
        video_path = os.path.join(video_dir, clip["video_name"] + ".mp4")
        cap = cv2.VideoCapture(video_path)
        ok, frame = cap.read()
        count = 0
        done = 0
        while ok:
            name = f"frame{count:05d}.png"
            if name in wanted:
                img = frame[:, crop[0]:crop[1]]
                img = cv2.resize(img, size)
                cv2.imwrite(os.path.join(clip_out, name), img)
                done += 1
                written += 1
            if done >= clip["num_frames"]:
                break
            ok, frame = cap.read()
            count += 1
        cap.release()
    return written


def _parse_pose_jsons(pose_dir: str) -> np.ndarray:
    """Sorted openpose JSONs → (F, 19, 3) array in image coordinates
    (gen_dataset_h5.py:89-113: largest-bbox person, hand means, zeros
    when nobody detected)."""
    motion, conf, _ = op_io.read_openpose_dir(pose_dir, scale=1.0,
                                              offset=0.0)
    return np.concatenate([motion.transpose(2, 0, 1),
                           conf.transpose(2, 0, 1)], axis=2)


def _pack_image_folder(group: h5py.Group, name: str, folder: str,
                       exts=(".png", ".jpg")) -> int:
    dt = h5py.special_dtype(vlen=np.uint8)
    files = [os.path.join(folder, f) for f in sorted(os.listdir(folder))
             if f.lower().endswith(exts)]
    dset = group.create_dataset(name, (len(files),), chunks=True,
                                dtype=dt)
    for i, path in enumerate(files):
        with open(path, "rb") as fh:
            dset[i] = np.frombuffer(fh.read(), dtype=np.uint8)
    return len(files)


def pack_hsm_h5(root: str, out_path: str) -> Dict[str, int]:
    """Pack the HumanSloMo folder tree into ``HumanSlomo.h5``.

    Expects the reference layout (gen_dataset_h5.py:42-51):
      root/test/{gt, poses, DAIN}/<clip>/…
      root/train/{frames, poses, DAIN}/<clip>/…
    Either phase may be absent.  Returns {clip: frame_count}.
    """
    counts: Dict[str, int] = {}
    with h5py.File(out_path, "w") as out:
        specs = [
            ("test", "gt", ("gt_images", "gt_dain", "gt_poses")),
            ("train", "frames",
             ("train_images", "train_dain", "train_poses")),
        ]
        for phase, img_sub, (k_img, k_dain, k_pose) in specs:
            img_root = os.path.join(root, phase, img_sub)
            if not os.path.isdir(img_root):
                continue
            dain_root = os.path.join(root, phase, "DAIN")
            pose_root = os.path.join(root, phase, "poses")
            for clip in sorted(os.listdir(img_root)):
                clip_img = os.path.join(img_root, clip)
                if not os.path.isdir(clip_img):
                    continue
                grp = out.require_group(clip)
                n = _pack_image_folder(grp, k_img, clip_img)
                counts[clip] = n
                dain_dir = os.path.join(dain_root, clip)
                if os.path.isdir(dain_dir):
                    _pack_image_folder(grp, k_dain, dain_dir)
                pose_dir = os.path.join(pose_root, clip)
                if os.path.isdir(pose_dir):
                    grp.create_dataset(
                        k_pose, data=_parse_pose_jsons(pose_dir),
                        dtype=np.float64)
    return counts


def pack_amass_h5(amass_dir: str, out_path: str,
                  splits: Sequence[str], body_model_path: str = "",
                  keep_middle: float = 0.8) -> int:
    """AMASS npz archives → ``AMASS_3D_joints.h5`` (gen_amass_h5.py:
    34-94): per motion, run SMPL-H forward kinematics over the middle
    ``keep_middle`` of frames and store (T, 52, 3) joints under
    ``<dataset>/<model>_<motion>/joints``.

    Requires the external ``human_body_prior`` package + SMPL-H model
    file (the reference's external dependency); raises ImportError with
    a clear message when absent.  Returns motions written.
    """
    try:
        import torch
        from human_body_prior.body_model.body_model import BodyModel
    except ImportError as e:
        raise ImportError(
            "pack_amass_h5 needs the external 'human_body_prior' package "
            "and an SMPL-H model file (see the AMASS project); this "
            "environment does not ship it. Precomputed-joint h5 files "
            "from the reference pipeline load directly via "
            "renderloom.data.amass.AmassReader.") from e

    written = 0
    with h5py.File(out_path, "w") as out:
        for dataset_name in splits:
            droot = os.path.join(amass_dir, dataset_name)
            if not os.path.isdir(droot):
                continue
            sub = out.create_group(dataset_name)
            for model in sorted(os.listdir(droot)):
                mdir = os.path.join(droot, model)
                if not os.path.isdir(mdir):
                    continue
                for motion in sorted(f for f in os.listdir(mdir)
                                     if f.endswith(".npz")):
                    data = np.load(os.path.join(mdir, motion))
                    if "poses" not in data:
                        continue
                    N = len(data["poses"])
                    lo = int((1 - keep_middle) / 2 * N)
                    hi = int((1 + keep_middle) / 2 * N)
                    if hi - lo < 1:
                        continue
                    n = hi - lo
                    bm = BodyModel(bm_path=body_model_path, num_betas=10,
                                   batch_size=n)
                    body = bm(
                        root_orient=torch.Tensor(data["poses"][lo:hi, :3]),
                        pose_body=torch.Tensor(data["poses"][lo:hi, 3:66]),
                        pose_hand=torch.Tensor(data["poses"][lo:hi, 66:]),
                        betas=torch.Tensor(
                            np.repeat(data["betas"][:10][None], n, 0)),
                        trans=torch.Tensor(data["trans"][lo:hi]))
                    grp = sub.create_group(f"{model}_{motion}")
                    grp.create_dataset(
                        "joints", data=body.Jtr.detach().numpy(),
                        dtype=np.float64)
                    written += 1
    return written
