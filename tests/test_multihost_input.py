"""Multi-host input pipeline: simulated 2-process streams through the
prefetcher must cover exactly the single-host stream with disjoint
per-process reads (``parallel/mesh.py:process_shard`` contract; new
capability — the reference has no distributed execution, SURVEY.md §2.5).
"""

import io

import h5py
import numpy as np
import pytest

from renderloom.data.amass import AmassReader
from renderloom.data.hsm import HsmReader
from renderloom.data.prefetch import prefetch


@pytest.fixture(scope="module")
def amass_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("amass_mh") / "joints.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        grp = f.create_group("TestSet")
        for i in range(7):
            T = 20 + 3 * i
            joints = rng.normal(0, 0.3, (T, 52, 3))
            grp.create_group(f"m{i}").create_dataset(
                "joints", data=joints.astype(np.float64))
    return path


def _spy_reads(reader, method_name):
    seen = []
    orig = getattr(reader, method_name)

    def spy(*args):
        seen.append(tuple(args))
        return orig(*args)

    setattr(reader, method_name, spy)
    return seen


def _drain(stream):
    n = 0
    for _ in prefetch(stream, depth=2):
        n += 1
    return n


def test_amass_two_process_streams_partition_single_host(amass_h5):
    def run(pi, pc):
        reader = AmassReader(amass_h5, ("TestSet",))
        seen = _spy_reads(reader, "read_motion")
        rng = np.random.default_rng(42)
        _drain(reader.batches(rng, batch_size=2, max_len=17, rate=8,
                              drop_last=False, process_index=pi,
                              process_count=pc))
        return seen

    single = run(0, 1)
    p0, p1 = run(0, 2), run(1, 2)
    assert len(single) == 7
    # disjoint and exactly covering
    assert not set(p0) & set(p1)
    assert set(p0) | set(p1) == set(single)
    # same seed -> same global shuffled order: each process keeps the
    # strided subsequence of the single-host stream, order preserved
    assert p0 == single[0::2]
    assert p1 == single[1::2]


def _png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


@pytest.fixture(scope="module")
def hsm_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hsm_mh") / "HumanSlomo.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        dt = h5py.special_dtype(vlen=np.uint8)
        grp = f.create_group("clip_a")
        n = 9
        imgs = grp.create_dataset("train_images", (n,), dtype=dt)
        dains = grp.create_dataset("train_dain", (n,), dtype=dt)
        poses = np.zeros((n, 19, 3))
        poses[:, :, 2] = 0.9
        poses[:, :, 0] = 30.0
        poses[:, :, 1] = 20.0
        for i in range(n):
            frame = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            imgs[i] = _png(frame)
            dains[i] = _png(frame // 2)
        grp.create_dataset("train_poses", data=poses)
    return path


def test_hsm_two_process_streams_partition_single_host(hsm_h5):
    def run(pi, pc):
        reader = HsmReader(hsm_h5, ["clip_a"], "train", max_frames=3)
        seen = _spy_reads(reader, "read_window")
        rng = np.random.default_rng(7)
        _drain(reader.batches(rng, batch_size=2, drop_last=False,
                              process_index=pi, process_count=pc))
        return seen

    single = run(0, 1)
    p0, p1 = run(0, 2), run(1, 2)
    assert len(single) == len(p0) + len(p1)
    assert not set(p0) & set(p1)
    assert set(p0) | set(p1) == set(single)
    assert p0 == single[0::2]
    assert p1 == single[1::2]
