"""Import reference PyTorch checkpoints into renderloom orbax checkpoints.

The reference's inference story rests on its published artifacts
(``Human_Motion_Modelling/configs/config.yaml`` ``model_epoch399.pth``;
``Pose_Guided_Neural_Rendering/configs/HSM.yaml:2-3``
``netG/netD_epoch006.pth``; torchvision VGG19 for the perceptual loss).
This CLI converts them — torch-free — into checkpoints every renderloom
CLI can ``--resume`` from:

    python -m renderloom.cli.import_checkpoint --kind motion \
        --pth model_epoch399.pth --out runs/motion_ref/ckpt
    python -m renderloom.cli.import_checkpoint --kind renderer \
        --pth netG_epoch006.pth --pth-d netD_epoch006.pth \
        --out runs/renderer_ref/ckpt
    python -m renderloom.cli.import_checkpoint --kind vgg19 \
        --pth vgg19-dcbb9e9d.pth --out data/vgg19_features.npz

Functional parity of the mappings is tested against the reference torch
models in ``tests/test_torch_import.py`` (motion, 2e-4) and
``tests/test_renderer_import.py`` (generator, 2e-3).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import jax
import numpy as np


def _tree_diff(expected, got, where):
    exp = {"/".join(str(k.key) for k in p): tuple(v.shape)
           for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]}
    act = {"/".join(str(k.key) for k in p): tuple(np.shape(v))
           for p, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    missing = sorted(set(exp) - set(act))[:10]
    extra = sorted(set(act) - set(exp))[:10]
    shape = sorted(k for k in set(exp) & set(act)
                   if exp[k] != act[k])[:10]
    if missing or extra or shape:
        raise SystemExit(
            f"{where}: mapped checkpoint does not match the model tree\n"
            f"  missing: {missing}\n  extra: {extra}\n"
            f"  shape mismatches: {[(k, exp[k], act[k]) for k in shape]}")


def _epoch_from_name(path: str) -> int:
    m = re.search(r"epoch(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--kind", required=True,
                   choices=("motion", "renderer", "vgg19"))
    p.add_argument("--pth", required=True,
                   help="reference .pth (netG for --kind renderer)")
    p.add_argument("--pth-d", default=None,
                   help="netD .pth (renderer only, optional)")
    p.add_argument("--opt", default=None,
                   help="opt_epochNNN.pth (motion only): import the "
                        "Adam moments so resumed training continues "
                        "faithfully (trainer.py:100-118)")
    p.add_argument("--out", required=True,
                   help="orbax checkpoint dir (npz path for vgg19)")
    p.add_argument("--config", default=None, help="renderloom yaml config")
    args = p.parse_args(argv)

    from renderloom.core.cache import enable_compile_cache
    enable_compile_cache()

    from renderloom.data.torch_import import (flatten_state_dict,
                                              map_discriminator_params,
                                              map_generator_params,
                                              map_motion_params, read_pth,
                                              vgg19_state_to_npz)

    state_dict = flatten_state_dict(read_pth(args.pth))
    print(f"read {args.pth}: {len(state_dict)} tensors")

    if args.kind == "vgg19":
        n = vgg19_state_to_npz(state_dict, args.out)
        print(f"wrote {n} conv layers -> {args.out} "
              f"(use via VGG19_NPZ={args.out})")
        return

    from renderloom.core import checkpoint as ckpt
    from renderloom.core.config import (MotionConfig, RendererConfig,
                                        load_motion_config,
                                        load_renderer_config)

    epoch = _epoch_from_name(args.pth)
    if args.kind == "motion":
        from renderloom.train.motion import create_motion_state

        cfg = (load_motion_config(args.config) if args.config
               else MotionConfig())
        _, _, state = create_motion_state(jax.random.PRNGKey(0), cfg)
        params = map_motion_params(state_dict)
        _tree_diff(state.params, params, "motion")
        state = state.replace(
            params=jax.tree.map(jax.numpy.asarray, params))
        if args.opt:
            from renderloom.data.torch_import import map_motion_opt_state
            from renderloom.train.motion import splice_amsgrad_state

            # state_dict is the flattened model checkpoint — its key
            # order IS the torch parameters() order the opt slots use
            count, mu, nu, nu_max = map_motion_opt_state(
                read_pth(args.opt), list(state_dict))
            _tree_diff(state.params, mu, "opt exp_avg")
            state = state.replace(opt_state=splice_amsgrad_state(
                state.opt_state, count, mu, nu, nu_max))
            print(f"read {args.opt}: Adam moments at step {count}")
    else:
        from renderloom.train.gan import create_gan_state

        cfg = (load_renderer_config(args.config) if args.config
               else RendererConfig())
        _, _, _, state = create_gan_state(jax.random.PRNGKey(0), cfg)
        params_g, stats_g = map_generator_params(state_dict)
        _tree_diff(state.params_g, params_g, "netG params")
        _tree_diff(state.stats_g, stats_g, "netG spectral stats")
        asarray = lambda t: jax.tree.map(jax.numpy.asarray, t)
        state = state.replace(params_g=asarray(params_g),
                              stats_g=asarray(stats_g))
        if args.pth_d:
            sd_d = flatten_state_dict(read_pth(args.pth_d))
            params_d, stats_d = map_discriminator_params(sd_d)
            _tree_diff(state.params_d, params_d, "netD params")
            _tree_diff(state.stats_d, stats_d, "netD spectral stats")
            state = state.replace(params_d=asarray(params_d),
                                  stats_d=asarray(stats_d))
            print(f"read {args.pth_d}: {len(sd_d)} tensors")

    state = state.replace(
        step=jax.numpy.asarray(epoch, jax.numpy.int32))
    path = ckpt.save_checkpoint(args.out, epoch, state)
    print(f"imported epoch {epoch} -> {path}")


if __name__ == "__main__":
    main()
