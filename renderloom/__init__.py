"""renderloom — TPU-native motion-guided video interpolation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Render-In-Between (azuxmioy/Render-In-Between, BMVC 2021):

* ``renderloom.models.motion_transformer`` — DETR-style pose-sequence
  upsampler (reference: ``Human_Motion_Modelling/models/transformer.py``).
* ``renderloom.models.renderer`` — pose-conditioned SPADE GAN renderer with a
  predicted blending mask (reference:
  ``Pose_Guided_Neural_Rendering/models/generator.py``).
* ``renderloom.ops`` — on-device pose geometry, heatmap/skeleton/mask
  rasterization, flow-based background warping (replacing the reference's
  CPU scipy/cv2 loops and the external DAIN CUDA stage).
* ``renderloom.train`` — functional trainers (masked-L1 motion training,
  TTUR hinge-GAN training) jitted over a ``jax.sharding.Mesh``.

Everything under ``jit`` uses static shapes and ``lax`` control flow; the
autoregressive frame rollout is a ``lax.scan``; batch data-parallelism is
expressed with ``jax.sharding`` so the same code runs on one chip or a pod
slice.
"""

__version__ = "0.1.0"
