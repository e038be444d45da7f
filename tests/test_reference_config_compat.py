"""Load the REFERENCE's shipped yaml configs through renderloom's
loaders — the switch-over contract: a user of the reference brings their
experiment yamls unchanged.  Skipped when /root/reference isn't mounted.
"""

import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def test_reference_motion_yaml_loads():
    from renderloom.core.config import load_motion_config

    cfg = load_motion_config(
        os.path.join(REF, "Human_Motion_Modelling/configs/config.yaml"))
    t = cfg.transformer
    assert t.hidden_dim == 128 and t.nheads == 8
    assert t.enc_layers == 6 and t.dec_layers == 6
    assert t.dim_feedforward == 256
    d = cfg.dataset
    assert d.max_seq_length == 321
    assert d.train_sample_rate == 8 and d.test_sample_rate == 16
    assert d.train_sample_size == 50
    assert len(d.train_split) == 12 and len(d.test_split) == 6
    assert cfg.w_codition == 2.0 and cfg.w_2d == 5.0


def test_reference_renderer_yaml_loads():
    from renderloom.core.config import load_renderer_config

    cfg = load_renderer_config(
        os.path.join(REF, "Pose_Guided_Neural_Rendering/configs/HSM.yaml"))
    assert cfg.gen.num_filters == 16
    assert cfg.gen.max_num_filters == 512
    assert cfg.data.model_width == 480 and cfg.data.model_height == 320
    assert cfg.data.max_frames == 4
    assert len(cfg.data.test_video_list) == 6
    assert len(cfg.data.train_video_list) >= 90
    assert cfg.gan_mode == "hinge"
    # TTUR: D learns 4x faster
    assert cfg.optim.lr_d == pytest.approx(4 * cfg.optim.lr)
    # per-pass hinge weights {fuse: 0, raw: 1, face: .1, hand: .1}
    assert cfg.gan.fuse == 0.0 and cfg.gan.raw == 1.0
    assert cfg.gan.face == pytest.approx(0.1)
    assert cfg.gan.hand == pytest.approx(0.1)
