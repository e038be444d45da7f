"""Unit tests for renderloom.ops.pose against numpy oracles.

Oracles are independent small numpy implementations of the behaviors
documented at Human_Motion_Modelling/datasets/AMASS_dataset.py (cited per
test) — hand-written here, used only to pin semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.ops import pose


def rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


class TestRemapAndCentralize:
    def test_joints_to_openpose_shape_and_hands(self):
        data = rand(52, 3, 7)
        out = np.asarray(pose.joints_to_openpose(jnp.asarray(data)))
        assert out.shape == (19, 3, 7)
        # row 0 is SMPL joint 15; hands are cluster means
        np.testing.assert_allclose(out[0], data[15], rtol=1e-6)
        np.testing.assert_allclose(out[17], data[22:37].mean(0), rtol=1e-5)
        np.testing.assert_allclose(out[18], data[37:52].mean(0), rtol=1e-5)

    def test_centralize_zero_means_root(self):
        data = rand(52, 3, 9, seed=1)
        out = np.asarray(pose.centralize(jnp.asarray(data)))
        np.testing.assert_allclose(out[0].mean(axis=-1), 0.0, atol=1e-5)


class TestBasisAndProjection:
    def test_basis_rows_unit_norm_no_rotation(self):
        m = rand(52, 3, 5, seed=2)
        basis = np.asarray(pose.body_basis(jnp.asarray(m)))
        assert basis.shape == (3, 3)
        np.testing.assert_allclose(np.linalg.norm(basis[1]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(basis[2], [0, 0, 1], atol=1e-6)

    def test_zero_angles_equals_no_rotation(self):
        m = rand(52, 3, 5, seed=3)
        b0 = np.asarray(pose.body_basis(jnp.asarray(m)))
        b1 = np.asarray(pose.body_basis(jnp.asarray(m),
                                        jnp.zeros(3)))
        np.testing.assert_allclose(b0, b1, atol=1e-5)

    def test_projection_perspective_oracle(self):
        # AMASS_dataset.py:401-429: x,z scaled by focal/(y+depth), image y
        # negated, clipped to border
        p3 = rand(19, 3, 4, seed=4)
        focal, depth, border = 4.0, 4.0, 10.0
        out = np.asarray(pose.project_2d(jnp.asarray(p3), focal, depth,
                                         border))
        denom = np.maximum(p3[:, 1] + depth, 0.1 * depth)
        exp_x = np.clip(focal * p3[:, 0] / denom, -border, border)
        exp_y = np.clip(-(focal * p3[:, 2] / denom), -border, border)
        np.testing.assert_allclose(out[:, 0], exp_x, rtol=1e-5)
        np.testing.assert_allclose(out[:, 1], exp_y, rtol=1e-5)

    def test_projection_orthogonal(self):
        p3 = rand(19, 3, 4, seed=5)
        out = np.asarray(pose.project_2d(jnp.asarray(p3),
                                         mode="orthogonal"))
        np.testing.assert_allclose(out[:, 0], np.clip(p3[:, 0], -10, 10),
                                   rtol=1e-6)
        np.testing.assert_allclose(out[:, 1], np.clip(-p3[:, 2], -10, 10),
                                   rtol=1e-6)


class TestLocalizeGlobalize:
    @pytest.mark.parametrize("root", [0, 8])
    def test_roundtrip(self, root):
        m = rand(19, 2, 6, seed=6)
        local = pose.localize(jnp.asarray(m), root)
        assert local.shape == (19, 2, 6)
        # root-relative: the row that was at root is gone; last row is the
        # absolute root
        np.testing.assert_allclose(np.asarray(local[-1]), m[root], rtol=1e-6)
        back = np.asarray(pose.globalize(local, root))
        np.testing.assert_allclose(back, m, atol=1e-5)

    def test_normalize_roundtrip(self):
        m = rand(19, 2, 6, seed=7)
        mean = rand(19, 2, seed=8)
        std = np.abs(rand(19, 2, seed=9)) + 0.5
        n = pose.normalize(jnp.asarray(m), jnp.asarray(mean),
                           jnp.asarray(std))
        back = np.asarray(pose.denormalize(n, jnp.asarray(mean),
                                           jnp.asarray(std)))
        np.testing.assert_allclose(back, m, atol=1e-5)


class TestInterpolation:
    def test_linear_keyframe_interp_oracle(self):
        # AMASS_dataset.py:467-482
        rate = 4
        L = rate * 5 + 1
        m = rand(3, 2, L, seed=10)
        out = np.asarray(pose.keyframe_interpolate(jnp.asarray(m), rate))
        idx = np.arange(L)
        chunk, remain = idx // rate, idx % rate
        prev = m[..., chunk * rate]
        nxt = np.concatenate([m[..., (chunk[:-1] + 1) * rate],
                              m[..., -1:]], axis=-1)
        expect = prev / rate * (rate - remain) + nxt / rate * remain
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_linear_interp_exact_at_keyframes(self):
        rate = 8
        m = rand(19, 2, rate * 4 + 1, seed=11)
        out = np.asarray(pose.keyframe_interpolate(jnp.asarray(m), rate))
        np.testing.assert_allclose(out[..., ::rate], m[..., ::rate],
                                   rtol=1e-5)

    def test_quadratic_exact_at_keyframes(self):
        rate = 4
        m = rand(5, 2, rate * 6 + 1, seed=12)
        out = np.asarray(pose.keyframe_interpolate(jnp.asarray(m), rate,
                                                   mode="quadratic"))
        np.testing.assert_allclose(out[..., ::rate], m[..., ::rate],
                                   rtol=1e-4)

    def test_frame_double(self):
        # AMASS_dataset.py:431-465
        m = rand(2, 2, 5, seed=13)
        mask = np.array([0, 0, 0, 1, 1], dtype=np.int32)
        conf = np.abs(rand(2, 1, 5, seed=14))
        out, nmask, nconf = pose.frame_double(jnp.asarray(m),
                                              jnp.asarray(mask),
                                              jnp.asarray(conf))
        assert out.shape[-1] == 9
        np.testing.assert_allclose(np.asarray(out)[..., ::2], m, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[..., 1],
                                   (m[..., 0] + m[..., 1]) / 2, rtol=1e-6)
        # midpoints inherit the next frame's mask
        np.testing.assert_array_equal(np.asarray(nmask),
                                      [0, 0, 0, 0, 0, 1, 1, 1, 1])
        np.testing.assert_allclose(np.asarray(nconf)[..., ::2], conf,
                                   rtol=1e-6)

    def test_interpolate_frames_times(self):
        m = rand(2, 2, 5, seed=15)
        mask = np.zeros(5, np.int32)
        out, nmask, _ = pose.interpolate_frames(jnp.asarray(m),
                                                jnp.asarray(mask), times=3)
        assert out.shape[-1] == (5 - 1) * 8 + 1


class TestMasks:
    def test_encoder_mask(self):
        pad = np.array([0] * 17 + [1] * 8, dtype=np.int32)
        enc = np.asarray(pose.encoder_mask_from_pad(jnp.asarray(pad), 8))
        # visible only at non-padded multiples of 8
        expect = np.ones(25, bool)
        expect[[0, 8, 16]] = False
        np.testing.assert_array_equal(enc, expect)

    def test_decoder_mask_unmasks_targets(self):
        pad = np.zeros(33, np.int32)
        enc = pose.encoder_mask_from_pad(jnp.asarray(pad), 8)
        dec = np.asarray(pose.decoder_mask_from_encoder(
            jax.random.key(0), enc, 10))
        # decoder mask is the encoder mask with extra positions unmasked
        assert (~dec).sum() >= (~np.asarray(enc)).sum()
        assert ((~np.asarray(enc)) & dec).sum() == 0


class TestAugmentation:
    def test_random_drop_touches_only_keyframes(self):
        m = np.abs(rand(19, 2, 33, seed=16)) + 1.0
        out = np.asarray(pose.random_drop(jax.random.key(1),
                                          jnp.asarray(m), rate=8,
                                          noise_rate=3, joint_drop_rate=3,
                                          flip_rate=2))
        non_key = np.ones(33, bool)
        non_key[::8] = False
        np.testing.assert_allclose(out[:, :, non_key], m[:, :, non_key],
                                   rtol=1e-6)
        assert not np.allclose(out[:, :, ::8], m[:, :, ::8])

    def test_random_drop_zeroes_dropped_joints(self):
        m = np.abs(rand(19, 2, 17, seed=17)) + 1.0
        out = np.asarray(pose.random_drop(jax.random.key(2),
                                          jnp.asarray(m), rate=8,
                                          noise_weight=0.0, noise_rate=1,
                                          joint_drop_rate=2, flip_rate=0))
        assert (out == 0.0).any()


class TestSynthesis:
    def test_synthesize_sample_shapes_and_finite(self):
        params = pose.SynthesisParams(rate=8, sample_size=10, noise_rate=3,
                                      joint_drop_rate=3, flip_rate=2)
        m = rand(52, 3, 33, seed=18)
        pad = np.zeros(33, np.int32)
        mean = rand(19, 2, seed=19) * 0.1
        std = np.abs(rand(19, 2, seed=20)) + 0.5
        out = pose.synthesize_sample(jax.random.key(3), jnp.asarray(m),
                                     jnp.asarray(pad), jnp.asarray(mean),
                                     jnp.asarray(std), params)
        assert out["data"].shape == (38, 33)
        assert out["input"].shape == (38, 33)
        assert out["interp"].shape == (38, 33)
        assert out["src_mask"].shape == (33,)
        for v in out.values():
            assert np.isfinite(np.asarray(v, dtype=np.float32)).all()
        # encoder-masked inputs are zeroed (AMASS_dataset.py:139)
        src_mask = np.asarray(out["src_mask"])
        np.testing.assert_allclose(
            np.asarray(out["input"])[:, src_mask], 0.0, atol=1e-6)

    def test_synthesize_batch_jits(self):
        params = pose.SynthesisParams(rate=8, sample_size=10, noise_rate=3,
                                      joint_drop_rate=3, flip_rate=2)
        m = jnp.asarray(rand(4, 52, 3, 33, seed=21))
        pad = jnp.zeros((4, 33), jnp.int32)
        mean = jnp.asarray(rand(19, 2, seed=22) * 0.1)
        std = jnp.asarray(np.abs(rand(19, 2, seed=23)) + 0.5)
        fn = jax.jit(lambda k: pose.synthesize_batch(k, m, pad, mean, std,
                                                     params))
        out = fn(jax.random.key(4))
        assert out["data"].shape == (4, 38, 33)
        assert out["tar_mask"].shape == (4, 33)
