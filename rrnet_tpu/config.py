"""Configuration tree for rrnet_tpu.

Mirrors the semantics of the reference's executable EasyDict configs
(`configs/rrnet_config.py`, `configs/centernet_config.py`,
`configs/retinanet_config.py`) as a typed dataclass tree, keeping the
"config is a Python module" ergonomics while adding:

  * presets (`rrnet_config()`, `centernet_config()`, `retinanet_config()`);
  * simple dotted-path CLI overrides (`apply_overrides`);
  * a Mesh block replacing the reference's `Config.Distributed`
    (world_size / rank / gpu_id / dist_url -> mesh axis names + sizes).

All static shape budgets that replace the reference's dynamic shapes
(max objects per image, top-k, ROI budget) live here so that one config
compiles to one XLA program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple


@dataclass
class TrainConfig:
    # Dataloader params (reference configs/rrnet_config.py:20-23).
    batch_size: int = 4          # per device
    num_workers: int = 4

    # Optimizer params (reference configs/rrnet_config.py:25-32).
    lr: float = 2.5e-4
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_milestones: Tuple[int, ...] = (60000, 80000)
    lr_gamma: float = 0.1
    warmup_steps: int = 0        # reference utils/warmup_lr.py (off by default)
    warmup_factor: float = 1.0 / 3.0
    iter_num: int = 100000

    # Transform pipeline (reference configs/rrnet_config.py:34-49).
    crop_size: Tuple[int, int] = (512, 512)   # (h, w)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    scale_factor: int = 4        # output stride of the stride-4 feature map
    with_road: bool = True
    multi_scales: Tuple[float, ...] = (1.0, 1.15, 1.25, 1.35, 1.5)
    hflip_prob: float = 0.5
    fill_duck: bool = True
    fill_duck_classes: Tuple[int, ...] = (1, 2, 3, 7, 8, 10)
    fill_duck_factor: float = 0.00005

    # Static shape budget: fixed per-image annotation capacity replacing the
    # reference's pad-to-batch-max collate (datasets/drones_det.py:56-94).
    max_objects: int = 320

    # Loss weights (reference operators/rrnet_operator.py:136, centernet :98).
    wh_weight: float = 0.1
    stage2_warmup_steps: int = 2000   # stage-2 loss gated off before this

    # Logging / checkpointing (reference configs/rrnet_config.py:51-53).
    print_interval: int = 20
    checkpoint_interval: int = 5000

    pretrained: bool = True

    # Host->device batch transport (see ValConfig.transport / data/
    # yuv420.py): 'rgb' (default) ships full-precision (B, H, W, 3)
    # uint8 crops, matching the reference's training inputs. 'yuv420'
    # is an opt-in for bandwidth-constrained links: packed (B, 1.5*H*W)
    # uint8 YUV planes reconstructed to RGB on device — half the wire
    # bytes, but lossy (4:2:0 chroma re-subsampling of augmented crops),
    # so it is NOT the training default. On a real TPU host PCIe never
    # gates at these sizes.
    transport: str = "rgb"


@dataclass
class ValConfig:
    batch_size: int = 1
    num_workers: int = 4
    model_path: str = ""
    auto_test: bool = True
    scales: Tuple[float, ...] = (1.0, 1.1, 1.2, 1.3, 1.4, 1.5)
    flip_tta: bool = False       # CenterNet eval uses hflip TTA
    score_threshold: float = 0.01
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    result_dir: str = "./results"
    max_det: int = 500           # reference utils/metrics/metrics.py max_det_num
    # Host->device image transport: 'yuv420' ships JPEG-native planes
    # (Y full-res + 2x2-subsampled CbCr = 1.5 B/px) and reconstructs RGB
    # on device — half the bytes of 'rgb' (3 B/px) with no information
    # the 4:2:0 source JPEGs ever carried. 'rgb' ships raw uint8 RGB.
    transport: str = "yuv420"


@dataclass
class SoftNMSConfig:
    """Soft-NMS parameters (reference ext/nms call sites: Nt=0.7,
    threshold=0.1, method=2/gaussian, sigma=0.5)."""
    method: str = "gaussian"     # 'gaussian' | 'linear' | 'hard'
    sigma: float = 0.5
    iou_threshold: float = 0.7   # Nt
    score_threshold: float = 0.1


@dataclass
class ModelConfig:
    name: str = "rrnet"          # 'rrnet' | 'centernet' | 'retinanet'
    backbone: str = "hourglass"
    num_stacks: int = 2
    head_channels: int = 256
    wh_kernel: int = 17          # asymmetric 17x1 / 1x17 wh-head kernels

    # Stage-1 candidate/NMS settings (reference configs/rrnet_config.py:80-83
    # and models/rrnet.py:25-80).
    topk: int = 1500
    nms_type_for_stage1: str = "nms"     # 'nms' | 'soft_nms'
    nms_per_class_for_stage1: bool = True
    stage1_nms_iou: float = 0.7
    # Static ROI budget for stage 2 (replaces the reference's dynamic
    # post-NMS ROI count at models/rrnet.py:37-51).
    stage2_rois: int = 512

    soft_nms: SoftNMSConfig = field(default_factory=SoftNMSConfig)

    # Optional windowed self-attention on stack features (RRNet; realizes
    # the reference's unwired SelfAttentionModule).
    with_self_attention: bool = False

    # RetinaNet (reference modules/anchor.py + operators/retinanet_operator.py).
    anchor_levels: Tuple[int, ...] = (3, 4, 5)
    anchor_sizes: Tuple[int, ...] = (16, 64, 128)   # operator override :30
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_scales: Tuple[float, ...] = (1.0, 1.2599210498948732, 1.5874010519681994)
    fpn_channels: int = 256
    retina_pos_iou: float = 0.5
    retina_neg_iou: float = 0.4
    retina_alpha: float = 0.75
    retina_gamma: float = 2.0

    # Numerics. bfloat16 compute is the TPU-native choice: the v5e MXU
    # is bf16-native and fp32 convs measure ~30x slower on this chip.
    # Params/optimizer state stay float32; losses/decode cast to f32.
    dtype: str = "bfloat16"      # compute dtype: 'float32' | 'bfloat16'
    param_dtype: str = "float32"
    sync_bn: bool = True         # RRNet converts to SyncBatchNorm; CenterNet not


@dataclass
class MeshConfig:
    """Replaces the reference `Config.Distributed` block: instead of
    world_size/rank/gpu_id/dist_url (operators/distributed_wrapper.py) we
    describe a `jax.sharding.Mesh`. Axis sizes of -1 mean "all devices"."""
    data_axis: str = "data"
    data_parallel: int = -1      # -1 => len(jax.devices())
    # Extra axes reserved for scale-out experiments (unused by these models).
    model_axis: str = "model"
    model_parallel: int = 1


@dataclass
class Config:
    seed: int = 219
    dataset: str = "drones_det"
    data_root: str = "./data/DronesDET"
    log_prefix: str = "TwoStageNet"
    log_dir: str = "./log"
    use_tensorboard: bool = True
    num_classes: int = 10

    train: TrainConfig = field(default_factory=TrainConfig)
    val: ValConfig = field(default_factory=ValConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets — one per reference experiment config module.
# ---------------------------------------------------------------------------

def rrnet_config(**overrides: Any) -> Config:
    """Preset mirroring reference configs/rrnet_config.py."""
    cfg = Config(
        log_prefix="TwoStageNet",
        model=ModelConfig(name="rrnet", backbone="hourglass", num_stacks=2,
                          sync_bn=True),
    )
    return _apply_kw(cfg, overrides)


def centernet_config(**overrides: Any) -> Config:
    """Preset mirroring reference configs/centernet_config.py."""
    cfg = Config(
        log_prefix="CenterNet",
        model=ModelConfig(name="centernet", backbone="hourglass",
                          num_stacks=2, sync_bn=False),
        val=ValConfig(flip_tta=True),
    )
    return _apply_kw(cfg, overrides)


def retinanet_config(**overrides: Any) -> Config:
    """Preset mirroring reference configs/retinanet_config.py (the live
    parts — the reference transform list there is stale, see SURVEY §2)."""
    cfg = Config(
        log_prefix="RetinaNet",
        train=TrainConfig(lr=1e-4, with_road=False, fill_duck=False),
        model=ModelConfig(name="retinanet", backbone="resnet50",
                          num_stacks=1, sync_bn=False),
        val=ValConfig(scales=(1.0,), auto_test=False),
    )
    return _apply_kw(cfg, overrides)


def rrnet_hrnetv2_attention_config(**overrides: Any) -> Config:
    """RRNet with the HRNetV2-w40 backbone and self-attention on stack
    features — the 'rrnet_hrnetv2_attention' experiment configuration
    (BASELINE configs; the reference defined but never wired the
    attention module)."""
    cfg = Config(
        log_prefix="RRNetHRNetV2Attn",
        model=ModelConfig(name="rrnet", backbone="hrnetv2", num_stacks=2,
                          sync_bn=True, with_self_attention=True),
    )
    return _apply_kw(cfg, overrides)


PRESETS = {
    "rrnet": rrnet_config,
    "centernet": centernet_config,
    "retinanet": retinanet_config,
    "rrnet_hrnetv2_attention": rrnet_hrnetv2_attention_config,
}


# ---------------------------------------------------------------------------
# Overrides
# ---------------------------------------------------------------------------

def _apply_kw(cfg: Config, overrides: dict) -> Config:
    for k, v in overrides.items():
        cfg = set_by_path(cfg, k, v)
    return cfg


def set_by_path(cfg: Any, path: str, value: Any) -> Any:
    """Return a copy of `cfg` with the dotted-path field replaced.

    e.g. set_by_path(cfg, 'train.lr', 1e-3).
    """
    head, _, rest = path.partition(".")
    if not hasattr(cfg, head):
        raise AttributeError(f"config has no field {head!r} (path {path!r})")
    if rest:
        sub = set_by_path(getattr(cfg, head), rest, value)
        return dataclasses.replace(cfg, **{head: sub})
    cur = getattr(cfg, head)
    if cur is not None and not isinstance(cur, (bool, str)) and isinstance(cur, (int, float)):
        value = type(cur)(value) if not isinstance(value, (tuple, list)) else value
    return dataclasses.replace(cfg, **{head: value})


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply 'a.b.c=value' CLI override strings (values parsed as Python
    literals when possible)."""
    import ast

    for ov in overrides:
        path, _, raw = ov.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        cfg = set_by_path(cfg, path.strip(), value)
    return cfg
