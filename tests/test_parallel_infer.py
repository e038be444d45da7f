"""Data-parallel SERVING: the segment rollout sharded over the mesh's
data axis (clip batch), parameters replicated — multi-chip inference
parity with the single-device run.

The reference serves one clip on one GPU (evaluator.py:165-269);
renderloom's rollout is mesh-ready: shard the clip batch, replicate the
folded generator params, and XLA keeps every generator call local to
its shard (no collectives in the forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderloom.core.config import (EmbedConfig, GeneratorConfig,
                                    MaskNetConfig, RendererConfig)
from renderloom.parallel.mesh import (make_mesh, replicate, shard_batch)
from renderloom.train.gan import (create_gan_state, make_inference_pair,
                                  make_segment_rollout)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_segment_rollout_data_parallel():
    H, W, rate, K = 32, 48, 2, 3
    cfg = RendererConfig(gen=GeneratorConfig(
        num_filters=4, max_num_filters=16, num_layers=6,
        num_downsamples=4, do_checkpoint=False,
        mask=MaskNetConfig(num_filters=4, max_num_filters=16,
                           num_downsamples=3, num_res_blocks=1),
        embed=EmbedConfig(num_filters=4, max_num_filters=16,
                          num_downsamples=4)))
    _, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg,
                                      height=H, width=W)
    gen, folded = make_inference_pair(cfg, state.params_g, state.stats_g)
    rollout = make_segment_rollout(gen, cfg, rate)

    rng = np.random.default_rng(0)
    B = 8                               # one clip per device
    L = (K - 1) * rate + 1
    batch = {k: jnp.asarray(rng.uniform(-1, 1, (B, L, H, W, c)),
                            jnp.float32)
             for k, c in (("label", 22), ("back", 3), ("key_img", 3))}

    ref_fused, ref_masks = rollout(folded, {}, batch)

    mesh = make_mesh()
    sharded_batch = shard_batch(mesh, batch)
    sharded_params = replicate(mesh, folded)
    fused, masks = rollout(sharded_params, {}, sharded_batch)
    # the output stays sharded over the data axis
    assert len(fused.sharding.device_set) == 8
    # partitioned codegen reassociates the conv/norm reductions
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref_fused),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               atol=5e-4)
