"""Typed configuration system.

The reference loads a flat YAML into an ``EasyDict`` and scatters
``getattr(cfg, key, default)`` through model constructors
(``Human_Motion_Modelling/utils/utils.py:27-33``,
``Pose_Guided_Neural_Rendering/models/generator.py:48-65``).  Here every
subsystem gets a frozen dataclass with defaults equal to the reference's
shipped configs (``Human_Motion_Modelling/configs/config.yaml``,
``Pose_Guided_Neural_Rendering/configs/HSM.yaml``), so a config is a pytree
leaf-free static object that can be closed over by ``jit`` without
retracing hazards.  YAML files with the reference's key layout load
directly via :func:`load_motion_config` / :func:`load_renderer_config`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import yaml


def _update_dataclass(obj, data: Mapping[str, Any]):
    """Return a copy of dataclass ``obj`` updated with keys from ``data``.

    Unknown keys are ignored (the reference yamls carry extra keys such as
    checkpoint paths that live in session config here).  Nested dataclass
    fields are updated recursively from nested mappings.
    """
    updates = {}
    names = {f.name: f for f in dataclasses.fields(obj)}
    for key, value in data.items():
        if key not in names:
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, Mapping):
            updates[key] = _update_dataclass(current, value)
        elif isinstance(current, tuple) and isinstance(value, Sequence):
            updates[key] = tuple(value)
        else:
            updates[key] = value
    return dataclasses.replace(obj, **updates)


# ---------------------------------------------------------------------------
# Motion stage (Human_Motion_Modelling)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformerConfig:
    """DETR-style motion transformer hyperparameters.

    Defaults mirror ``Human_Motion_Modelling/configs/config.yaml:78-89``.
    """

    input_joints: int = 38          # 19 joints x 2D
    hidden_dim: int = 128
    dropout: float = 0.1
    nheads: int = 8
    dim_feedforward: int = 256
    enc_layers: int = 6
    dec_layers: int = 6
    activation: str = "leaky_relu"
    pre_norm: bool = True
    intermediate: bool = False
    two_stage: bool = True


@dataclass(frozen=True)
class PosEncodeConfig:
    """Positional encoding config (``configs/config.yaml:92-94``)."""

    hidden_dim: int = 128
    position_embedding: str = "v2"  # 'v2' sine | 'v3' learned
    max_learned_positions: int = 160


@dataclass(frozen=True)
class MotionDatasetConfig:
    """AMASS synthesis parameters (``configs/config.yaml:36-68``)."""

    h5_file: str = "AMASS/AMASS_3D_joints.h5"
    data_root: str = "data"
    train_split: tuple = (
        "CMU", "MPI_Limits", "TotalCapture", "Eyes_Japan_Dataset", "KIT",
        "DFaust_67", "BMLhandball", "BMLmovi", "EKUT", "TCD_handMocap",
        "BioMotionLab_NTroje", "ACCAD",
    )
    test_split: tuple = (
        "Transitions_mocap", "SSM_synced", "HumanEva", "MPI_HDM05", "SFU",
        "MPI_mosh",
    )
    return_type: str = "network"    # 'network' (2D) | '3D'

    # noise augmentation (configs/config.yaml:46-51)
    train_noise: bool = True
    noise_weight: float = 0.5
    noise_rate: int = 15
    joint_drop_rate: int = 15
    flip_rate: int = 8

    # camera / projection (configs/config.yaml:54-61)
    rotation_aug: bool = True
    rotation_axes: tuple = (0.2, 0.0, 1.0)
    camera_project: str = "perspective"
    focal: float = 4.0
    depth: float = 4.0
    projection_noise: bool = True
    frame_boarder: float = 10.0

    # clip sampling (configs/config.yaml:64-68)
    max_seq_length: int = 321       # = train_sample_rate * N + 1
    train_sample_rate: int = 8
    train_sample_size: int = 50
    test_sample_rate: int = 16

    evaluate_noise: bool = True
    openpose_scale: float = 512.0
    openpose_offset: float = 256.0


@dataclass(frozen=True)
class MotionOptimConfig:
    """Motion optimizer settings (``configs/config.yaml:12-20``)."""

    nr_epochs: int = 1000
    lr: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 5e-4
    lr_policy: str = "step"         # constant|lambda|step|multistep
    gamma: float = 0.5
    step_size: int = 100
    warmup: int = 5
    grad_clip: float = 1.0


@dataclass(frozen=True)
class MotionConfig:
    """Full motion-stage configuration."""

    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    pos_encode: PosEncodeConfig = field(default_factory=PosEncodeConfig)
    dataset: MotionDatasetConfig = field(default_factory=MotionDatasetConfig)
    optim: MotionOptimConfig = field(default_factory=MotionOptimConfig)

    # loss weights (configs/config.yaml:111-112)
    w_codition: float = 2.0
    w_2d: float = 5.0

    use_dis: bool = False
    w_gan: float = 0.0

    eval_step: int = 5
    save_step: int = 50

    batch_size: int = 16
    seed: int = 0
    # numerics: params are fp32; set compute_dtype to 'bfloat16' to run
    # matmuls on the MXU in bf16
    compute_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Renderer stage (Pose_Guided_Neural_Rendering)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EmbedConfig:
    """Conditional label embedder (``configs/HSM.yaml:60-67``)."""

    use_embed: bool = True
    arch: str = "encoder"
    num_filters: int = 64
    max_num_filters: int = 512
    num_downsamples: int = 4
    kernel_size: int = 3
    weight_norm_type: str = "spectral"


@dataclass(frozen=True)
class MaskNetConfig:
    """Blend-mask network (``configs/HSM.yaml:51-59``)."""

    num_filters: int = 32
    max_num_filters: int = 512
    num_downsamples: int = 3
    num_res_blocks: int = 4
    kernel_size: int = 3
    activation_norm_type: str = "instance"
    weight_norm_type: str = "spectral"


@dataclass(frozen=True)
class GeneratorConfig:
    """SPADE generator (``configs/HSM.yaml:35-67``)."""

    num_frames_G: int = 2
    input_image_nc: int = 3
    input_label_nc: int = 22        # 3ch skeleton + 19ch heatmaps
    num_filters: int = 16
    max_num_filters: int = 512
    num_layers: int = 6
    num_downsamples: int = 4        # image-branch downsamples
    kernel_size: int = 3
    activation_norm_type: str = "spatially_adaptive"
    spade_kernel_size: int = 1      # activation_norm_params.kernel_size
    weight_norm_type: str = "spectral"
    do_checkpoint: bool = True      # jax.checkpoint the res blocks
    mask: MaskNetConfig = field(default_factory=MaskNetConfig)
    embed: EmbedConfig = field(default_factory=EmbedConfig)


@dataclass(frozen=True)
class PatchDiscConfig:
    """One multi-scale patch discriminator (``configs/HSM.yaml:78-105``)."""

    num_filters: int = 32
    max_num_filters: int = 512
    num_discriminators: int = 2
    num_layers: int = 4
    kernel_size: int = 4
    weight_norm_type: str = "spectral"
    activation_norm_type: str = "instance"


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Full discriminator stack (``configs/HSM.yaml:72-105``)."""

    input_image_nc: int = 3
    input_label_nc: int = 22
    num_frames_D: int = 2
    image: PatchDiscConfig = field(default_factory=PatchDiscConfig)
    face: PatchDiscConfig = field(default_factory=lambda: PatchDiscConfig(
        num_discriminators=1, num_layers=3))
    hand: PatchDiscConfig = field(default_factory=lambda: PatchDiscConfig(
        num_discriminators=1, num_layers=3))
    use_face: bool = True
    use_hand: bool = True


@dataclass(frozen=True)
class GanLossWeights:
    """Per-output GAN loss weights (``configs/HSM.yaml:114-118``)."""

    fuse: float = 0.0
    raw: float = 1.0
    face: float = 0.1
    hand: float = 0.1


@dataclass(frozen=True)
class PerceptualConfig:
    """VGG19 perceptual loss (``configs/HSM.yaml:124-140``)."""

    weight: float = 10.0
    model: str = "vgg19"
    layers: tuple = ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1",
                     "relu_5_1")
    weights: tuple = (0.03125, 0.0625, 0.125, 0.25, 1.0)
    criterion: str = "l1"
    num_scales: int = 1


@dataclass(frozen=True)
class RendererDataConfig:
    """HumanSloMo data settings (``configs/HSM.yaml:151-193``)."""

    h5_file: str = "HumanSlomo.h5"
    train_video_list: tuple = ()
    test_video_list: tuple = ("test_001", "test_006", "test_011", "test_016",
                              "test_021", "test_026")
    max_frames: int = 4
    update_frame_step: int = 10
    random_drop_prob: float = 0.02
    random_blur_rate: float = 0.06
    gauss_sigma: float = 5.0
    skeleton_thres: float = 0.001
    foot_thres: float = 0.001
    load_width: int = 480
    load_height: int = 320
    model_width: int = 480
    model_height: int = 320
    eval_frames: int = 40
    num_joints: int = 19


@dataclass(frozen=True)
class RendererOptimConfig:
    """TTUR Adam settings (``configs/HSM.yaml:9-17``)."""

    nr_epochs: int = 200
    lr: float = 1e-4
    lr_d: float = 4e-4
    beta1: float = 0.0
    beta2: float = 0.999
    weight_decay: float = 5e-4
    lr_policy: str = "step"
    gamma: float = 0.5
    step_size: int = 20


@dataclass(frozen=True)
class RendererConfig:
    """Full renderer-stage configuration."""

    gen: GeneratorConfig = field(default_factory=GeneratorConfig)
    dis: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    data: RendererDataConfig = field(default_factory=RendererDataConfig)
    optim: RendererOptimConfig = field(default_factory=RendererOptimConfig)

    gan_mode: str = "hinge"
    gan: GanLossWeights = field(default_factory=GanLossWeights)
    fm_w: float = 1.0
    perceptual: PerceptualConfig = field(default_factory=PerceptualConfig)
    l1_w: float = 30.0
    mask_w: float = 5.0
    # Optional fg-masked SSIM term, 1−SSIM on the same denorm+mask
    # protocol the evaluator scores (evaluator.py:149-163).  0.0 =
    # reference parity (the reference has no such term); the TPU demo
    # enables it because its perceptual loss runs on random VGG
    # features without a weight snapshot, which wins PSNR but loses
    # SSIM to the warped-background baseline (BASELINE.md round-4 GAN
    # demo: OURS_SSIM 0.906 vs DAIN 0.927).
    ssim_w: float = 0.0
    # Optional fg-masked image-gradient L1 (∇fused vs ∇real, forward
    # differences) — matches local contrast structure while suppressing
    # hallucinated high-frequency texture, the failure mode SSIM
    # punishes in GAN output.  0.0 = reference parity.  Tried after the
    # direct 1−SSIM term measured NEGATIVE at both w=8 and w=2 on the
    # TPU demo (BASELINE.md round-5 GAN-demo table).
    grad_w: float = 0.0

    batch_size: int = 4
    seed: int = 0
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class FlowConfig:
    """Learned flow-interpolator settings (the trainable DAIN
    replacement — ``renderloom/models/flownet.py``; the reference's
    interpolator is the external pretrained DAIN repo)."""

    base_filters: int = 24
    levels: int = 4
    lr: float = 2e-4
    grad_clip: float = 1.0
    w_photo: float = 0.5
    w_smooth: float = 0.05
    nr_epochs: int = 50
    batch_size: int = 8
    compute_dtype: str = "float32"
    # Per-axis displacement bound (full-res px) of the fast separable
    # inference warp (ops/flow.py:backward_warp_shift; cost linear in
    # it).  Raise for content moving >16 px between keyframes — e.g.
    # ~rate·|motion per frame|.  Training always uses the unbounded
    # gather warp, so this only gates inference.
    max_disp: int = 16


def load_flow_config(path: str) -> "FlowConfig":
    return _update_dataclass(FlowConfig(), load_yaml(path))


@dataclass(frozen=True)
class PoseNetConfig:
    """In-framework 2D pose head (the optional AlphaPose alternative —
    ``renderloom/models/posenet.py``; SURVEY.md §2.4)."""

    base_filters: int = 32
    blocks: int = 4
    sigma: float = 6.0          # target gaussian σ in image pixels
    conf_thres: float = 0.05
    fg_weight: float = 20.0     # extra MSE weight on gaussian peaks
    w_coord: float = 1.0
    lr: float = 1e-3
    grad_clip: float = 1.0
    nr_epochs: int = 50
    batch_size: int = 16
    compute_dtype: str = "float32"
    # random-erase occlusion augmentation (on-device, in the jitted
    # step): each image gets `occlude_count` rectangles, each applied
    # with prob `occlude_rate`, sized up to `occlude_frac` of the
    # image side, filled with a random flat color — trains the head to
    # localize partially hidden joints
    occlude_rate: float = 0.0
    occlude_count: int = 2
    occlude_frac: float = 0.3


def load_pose_config(path: str) -> "PoseNetConfig":
    return _update_dataclass(PoseNetConfig(), load_yaml(path))


# ---------------------------------------------------------------------------
# YAML loading — accepts both renderloom layout and the reference's flat
# key layout so existing experiment yamls carry over.
# ---------------------------------------------------------------------------


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def motion_config_from_dict(raw: Mapping[str, Any]) -> MotionConfig:
    cfg = MotionConfig()
    cfg = _update_dataclass(cfg, raw)
    # reference flat-key layout
    cfg = dataclasses.replace(
        cfg,
        transformer=_update_dataclass(cfg.transformer,
                                      raw.get("transformer", {})),
        pos_encode=_update_dataclass(cfg.pos_encode,
                                     raw.get("pos_encode", {})),
        dataset=_update_dataclass(cfg.dataset, raw),
        optim=_update_dataclass(cfg.optim, raw),
    )
    if "dataset" in raw:
        cfg = dataclasses.replace(
            cfg, dataset=_update_dataclass(cfg.dataset, raw["dataset"]))
    if "optim" in raw:
        cfg = dataclasses.replace(
            cfg, optim=_update_dataclass(cfg.optim, raw["optim"]))
    return cfg


def renderer_config_from_dict(raw: Mapping[str, Any]) -> RendererConfig:
    cfg = RendererConfig()
    cfg = _update_dataclass(cfg, raw)
    cfg = dataclasses.replace(
        cfg,
        data=_update_dataclass(cfg.data, raw),
        optim=_update_dataclass(cfg.optim, raw),
    )
    gan_raw = raw.get("gan")
    if isinstance(gan_raw, Mapping):
        cfg = dataclasses.replace(
            cfg, gan=_update_dataclass(GanLossWeights(), gan_raw))
    dis_raw = raw.get("dis", {})
    if dis_raw:
        dis = _update_dataclass(cfg.dis, dis_raw)
        add = dis_raw.get("additional_discriminators", {})
        if "face" in add:
            dis = dataclasses.replace(
                dis, face=_update_dataclass(dis.face, add["face"]))
        if "hand" in add:
            dis = dataclasses.replace(
                dis, hand=_update_dataclass(dis.hand, add["hand"]))
        cfg = dataclasses.replace(cfg, dis=dis)
    gen_raw = raw.get("gen", {})
    if gen_raw:
        gen = _update_dataclass(cfg.gen, gen_raw)
        params = gen_raw.get("activation_norm_params", {})
        if "kernel_size" in params:
            gen = dataclasses.replace(gen,
                                      spade_kernel_size=params["kernel_size"])
        cfg = dataclasses.replace(cfg, gen=gen)
    return cfg


def load_motion_config(path: str) -> MotionConfig:
    return motion_config_from_dict(load_yaml(path))


def load_renderer_config(path: str) -> RendererConfig:
    return renderer_config_from_dict(load_yaml(path))
