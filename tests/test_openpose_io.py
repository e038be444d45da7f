"""Openpose JSON IO contract (``Human_Motion_Modelling/utils/utils.py:
81-229``): largest-person selection, hand-mean points, carry-last-pose,
normalization, and writer↔reader round trip."""

import json
import os

import numpy as np
import pytest

from renderloom.data.openpose import (mean_valid_keypoint,
                                      read_openpose_dir,
                                      select_largest_person,
                                      write_openpose_dir)


def _person(cx, cy, size, conf=0.9, n_valid=15):
    body = np.zeros((25, 3))
    for j in range(15):
        ang = 2 * np.pi * j / 15
        body[j] = (cx + size * np.cos(ang), cy + size * np.sin(ang),
                   conf if j < n_valid else 0.0)
    return {"pose_keypoints_2d": body.reshape(-1).tolist(),
            "hand_left_keypoints_2d": [cx - size, cy, conf] * 21,
            "hand_right_keypoints_2d": [cx + size, cy, conf] * 21}


def test_select_largest_person():
    people = [_person(100, 100, 10), _person(300, 200, 80),
              _person(50, 50, 30)]
    assert select_largest_person(people) == 1
    # too few valid joints → skipped even if huge
    people.append(_person(0, 0, 500, n_valid=5))
    assert select_largest_person(people) == 1
    assert select_largest_person([]) == -1


def test_mean_valid_keypoint_needs_six():
    pts = np.zeros((21, 3))
    pts[:5] = [10.0, 20.0, 0.9]
    assert (mean_valid_keypoint(pts) == 0).all()     # only 5 valid
    pts[:8] = [10.0, 20.0, 0.9]
    out = mean_valid_keypoint(pts)
    np.testing.assert_allclose(out[0, :2], [10.0, 20.0])


def test_carry_last_pose_from_frame_one(tmp_path):
    d = tmp_path / "poses"
    d.mkdir()
    with open(d / "000_keypoints.json", "w") as f:
        json.dump({"people": [_person(256, 256, 50)]}, f)
    with open(d / "001_keypoints.json", "w") as f:
        json.dump({"people": []}, f)                 # nobody detected
    motion, conf, _ = read_openpose_dir(str(d), scale=1.0, offset=0.0)
    np.testing.assert_allclose(motion[:, :, 1], motion[:, :, 0])
    np.testing.assert_allclose(conf[:, :, 1], conf[:, :, 0])
    assert np.abs(motion[:, :, 0]).sum() > 0


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    motion = rng.uniform(-0.4, 0.4, (19, 2, 5))
    conf = np.full((19, 1, 5), 0.8)
    d = str(tmp_path / "out")
    write_openpose_dir(motion, conf, d)              # default scale 512
    back, conf2, (scale, offset) = read_openpose_dir(d)
    assert scale == 512 and offset == 256
    np.testing.assert_allclose(back, motion, atol=1e-9)
    np.testing.assert_allclose(conf2, conf)


def test_zero_conf_joints_zeroed(tmp_path):
    d = tmp_path / "poses"
    d.mkdir()
    person = _person(256, 256, 50)
    body = np.asarray(person["pose_keypoints_2d"]).reshape(25, 3)
    body[3, 2] = 0.0                                  # kill one joint
    person["pose_keypoints_2d"] = body.reshape(-1).tolist()
    with open(d / "000_keypoints.json", "w") as f:
        json.dump({"people": [person]}, f)
    motion, conf, _ = read_openpose_dir(str(d), scale=1.0, offset=0.0,
                                        thres=0.01)
    assert (motion[3, :, 0] == 0).all()
    assert conf[3, 0, 0] == 0.0
