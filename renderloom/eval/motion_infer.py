"""OpenPose-folder motion interpolation (inference path).

Rebuild of ``Evaluator.interpolate_openpose``
(``Human_Motion_Modelling/models/evaluator.py:169-198``) plus the
``Model_inference`` wrapper (``inference.py:12-41``): an openpose JSON dir
at low FPS → ``rate×`` upsampled pose JSONs (model prediction and linear
baseline side by side).

TPU-native structure: the whole per-clip computation — repeated frame
doubling, localization/normalization, mask construction, transformer
forward, denormalization and re-globalization — is ONE jitted function
(the reference runs ~10 separate numpy/torch stages per clip;
single-dispatch matters doubly here because the tunneled-TPU dispatch
latency dwarfs the compute).  Arbitrary clip lengths are padded to a
bucketed static length (multiples of ``rate × 8`` plus one) so XLA
compiles a handful of shapes, with masks + true-length PE keeping the
math equal to the reference's unpadded run.
"""

from __future__ import annotations

import math
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
        self.mean = jnp.asarray(mean, dtype=jnp.float32)
        self.std = jnp.asarray(std, dtype=jnp.float32)

    @partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def _run(self, params, motion, conf, rate: int, times: int,
             pad_to: int):
        """Fused: keyframes (19,2,K) → (pred, linear) global (19,2,L_pad)
        plus dense confidence; one device dispatch per clip."""
        K = motion.shape[-1]
        dense, dense_mask, dense_conf = pose_ops.interpolate_frames(
            motion, jnp.zeros((K,), bool), conf, times)
        L = dense.shape[-1]

        padded = jnp.zeros(dense.shape[:-1] + (pad_to,), jnp.float32)
        padded = padded.at[..., :L].set(dense)
        pad_mask = jnp.arange(pad_to) >= L

        normed = pose_ops.normalize(
            pose_ops.localize(padded, pose_ops.ROOT_2D), self.mean,
            self.std)
        enc_mask = pose_ops.encoder_mask_from_pad(pad_mask, rate)
        inputs = normed * (~enc_mask)[None, None, :]

        C = inputs.shape[0] * inputs.shape[1]
        pred, _ = self.model.apply(
            {"params": params},
            jnp.transpose(inputs.reshape(C, -1)[None], (0, 2, 1)),
            enc_mask[None],
            jnp.transpose(normed.reshape(C, -1)[None], (0, 2, 1)),
            pad_mask[None], rate, deterministic=True,
            lengths=jnp.asarray([L]))
        pred = jnp.transpose(pred, (0, 2, 1))[0]           # (C, L_pad)

        def post(flat):
            data = flat.reshape(19, 2, -1)
            data = pose_ops.denormalize(data, self.mean, self.std)
            return pose_ops.globalize(data, pose_ops.ROOT_2D)

        return post(pred), post(normed.reshape(C, -1)), dense_conf

    def interpolate_motion(self, motion: np.ndarray, conf: np.ndarray,
                           rate: int
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(19,2,K) keyframe motion → (pred, linear, conf) at full rate.

        Mirrors ``get_openpose_data`` (AMASS_dataset.py:240-264): repeated
        frame doubling builds the dense linear sequence, the encoder sees
        every ``rate``-th frame, the decoder refines the rest.
        """
        times = int(np.log2(rate))
        L = (motion.shape[-1] - 1) * (2 ** times) + 1
        pad_to = bucket_length(L, rate)
        pred, linear, dense_conf = self._run(
            self.params, jnp.asarray(motion, jnp.float32),
            jnp.asarray(conf, jnp.float32), rate, times, pad_to)
        return (np.asarray(pred, np.float64)[:, :, :L],
                np.asarray(linear, np.float64)[:, :, :L],
                np.asarray(dense_conf))

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
