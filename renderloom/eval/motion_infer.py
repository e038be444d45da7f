"""OpenPose-folder motion interpolation (inference path).

Rebuild of ``Evaluator.interpolate_openpose``
(``Human_Motion_Modelling/models/evaluator.py:169-198``) plus the
``Model_inference`` wrapper (``inference.py:12-41``): an openpose JSON dir
at low FPS → ``rate×`` upsampled pose JSONs (model prediction and linear
baseline side by side).

TPU-native differences: arbitrary clip lengths are padded to a bucketed
static length (multiples of ``rate × 8`` plus one) so XLA compiles a
handful of shapes instead of one per clip; the valid prefix is masked and
the sine PE is normalized by the true length, which keeps the math equal
to the reference's unpadded run.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from renderloom.core.config import MotionConfig
from renderloom.data import openpose as op_io
from renderloom.ops import pose as pose_ops


def bucket_length(L: int, rate: int, granule: int = 8) -> int:
    """Smallest padded length ≥ L of the form k·rate·granule + 1."""
    segs = math.ceil((L - 1) / (rate * granule))
    return max(segs, 1) * rate * granule + 1


class MotionInterpolator:
    """Callable wrapper: params + config → openpose-dir upsampling."""

    def __init__(self, model, params, cfg: MotionConfig,
                 mean: np.ndarray, std: np.ndarray):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    @partial(jax.jit, static_argnums=(0, 5))
    def _infer(self, params, inputs, interp, enc_mask, rate: int,
               pad_mask, lengths):
        pred, _ = self.model.apply(
            {"params": params},
            jnp.transpose(inputs, (0, 2, 1)), enc_mask,
            jnp.transpose(interp, (0, 2, 1)), pad_mask, rate,
            deterministic=True, lengths=lengths)
        return jnp.transpose(pred, (0, 2, 1))

    def interpolate_motion(self, motion: np.ndarray, conf: np.ndarray,
                           rate: int
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(19,2,L0) keyframe motion → (pred, linear, conf) at full rate.

        Mirrors ``get_openpose_data`` (AMASS_dataset.py:240-264): repeated
        frame doubling builds the dense linear sequence, the encoder sees
        every ``rate``-th frame, the decoder refines the rest.
        """
        times = int(np.log2(rate))
        dense, dense_mask, dense_conf = pose_ops.interpolate_frames(
            jnp.asarray(motion), jnp.zeros(motion.shape[-1], bool),
            jnp.asarray(conf), times)
        dense = np.asarray(dense)
        dense_conf = np.asarray(dense_conf)
        L = dense.shape[-1]

        L_pad = bucket_length(L, rate)
        padded = np.zeros((dense.shape[0], dense.shape[1], L_pad),
                          dtype=np.float32)
        padded[:, :, :L] = dense
        pad_mask = np.arange(L_pad) >= L

        normed = pose_ops.normalize(
            pose_ops.localize(jnp.asarray(padded), pose_ops.ROOT_2D),
            jnp.asarray(self.mean), jnp.asarray(self.std))
        enc_mask = pose_ops.encoder_mask_from_pad(
            jnp.asarray(pad_mask), rate)
        inputs = normed * (~enc_mask)[None, None, :]

        C = inputs.shape[0] * inputs.shape[1]
        pred = self._infer(self.params,
                           inputs.reshape(C, -1)[None],
                           normed.reshape(C, -1)[None],
                           enc_mask[None], rate, jnp.asarray(pad_mask)[None],
                           jnp.asarray([L]))

        def post(flat):
            data = np.asarray(flat, dtype=np.float64).reshape(19, 2, -1)
            data = data[:, :, :L]
            data = data * self.std[:, :, None] + self.mean[:, :, None]
            return np.asarray(pose_ops.globalize(jnp.asarray(data),
                                                 pose_ops.ROOT_2D))

        return post(pred[0]), post(normed.reshape(C, -1)), dense_conf

    def interpolate_openpose(self, json_dir: str, rate: int,
                             pred_dir: str, linear_dir: str,
                             scale: float = None, offset: float = None):
        """JSON dir in → two JSON dirs out (prediction + linear baseline),
        same contract as evaluator.py:169-198."""
        d = self.cfg.dataset
        motion, conf, (scale, offset) = op_io.read_openpose_dir(
            json_dir, scale or d.openpose_scale,
            offset or d.openpose_offset)
        pred, linear, dense_conf = self.interpolate_motion(motion, conf,
                                                           rate)
        op_io.write_openpose_dir(pred, dense_conf, pred_dir, scale, offset)
        op_io.write_openpose_dir(linear, dense_conf, linear_dir, scale,
                                 offset)
        return pred, linear
