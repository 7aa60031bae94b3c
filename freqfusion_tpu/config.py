"""Configuration tree mirroring the reference's train_config.yaml schema.

The single YAML (reference configs/train_config.yaml, 354 lines) is the
source of truth for the whole system; this module gives it a typed dataclass
form while keeping the original file loadable verbatim via ``load_config``.
"""

from __future__ import annotations


from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import yaml

__all__ = [
    "ExpertConfig", "FusionConfig", "OptimizerConfig", "SchedulerConfig",
    "EMAConfig", "TrainingConfig", "LossStage", "LossConfig", "DatasetConfig",
    "AugmentationConfig", "ValidationConfig", "CheckpointConfig", "Config",
    "load_config", "default_config",
]


@dataclass(frozen=True)
class ExpertConfig:
    name: str
    weight_path: Optional[str] = None
    frozen: bool = True
    remote_only: bool = False
    architecture: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class FusionConfig:
    num_experts: int = 4
    fusion_dim: int = 128
    refine_channels: int = 128
    refine_depth: int = 6
    base_channels: int = 64
    block_size: int = 8
    upscale: int = 4
    # Championship improvement toggles (train_config.yaml:74-80)
    dynamic_expert_selection: bool = True
    cross_band_attention: bool = True
    adaptive_frequency_bands: bool = True
    multi_resolution_fusion: bool = True
    collaborative_learning: bool = True
    edge_enhancement: bool = True


@dataclass(frozen=True)
class OptimizerConfig:
    type: str = "AdamW"
    lr: float = 2.0e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 1.0e-4
    eps: float = 1.0e-8


@dataclass(frozen=True)
class SchedulerConfig:
    type: str = "CosineAnnealingWarmRestarts"
    T_0: int = 50
    T_mult: int = 2
    eta_min: float = 5.0e-8
    warmup_epochs: int = 5
    warmup_lr: float = 5.0e-7


@dataclass(frozen=True)
class EMAConfig:
    enabled: bool = True
    decay: float = 0.9995


@dataclass(frozen=True)
class TrainingConfig:
    total_epochs: int = 150
    batch_size: int = 8
    num_workers: int = 4
    precision: str = "fp32"
    gradient_clip: float = 1.0
    accumulation_steps: int = 4
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    ema: EMAConfig = field(default_factory=EMAConfig)


@dataclass(frozen=True)
class LossStage:
    """One stage of the 3-stage curriculum (train_config.yaml:138-175)."""
    epochs: Tuple[int, int]
    stage_name: str
    weights: Dict[str, float]
    description: str = ""


def _default_stages() -> Tuple[LossStage, ...]:
    return (
        LossStage((0, 50), "foundation_psnr",
                  {"l1": 1.0, "charbonnier": 0.0, "swt": 0.0, "fft": 0.0,
                   "ssim": 0.0, "vgg": 0.0},
                  "Build strong pixel-level reconstruction"),
        LossStage((50, 100), "frequency_refinement",
                  {"l1": 0.75, "charbonnier": 0.0, "swt": 0.20, "fft": 0.05,
                   "ssim": 0.0, "vgg": 0.0},
                  "Enhance frequency detail with SWT + FFT"),
        LossStage((100, 150), "detail_enhancement",
                  {"l1": 0.60, "charbonnier": 0.0, "swt": 0.25, "fft": 0.10,
                   "ssim": 0.05, "vgg": 0.0},
                  "Final edge and texture refinement"),
    )


@dataclass(frozen=True)
class LossConfig:
    stages: Tuple[LossStage, ...] = field(default_factory=_default_stages)
    charbonnier_eps: float = 1.0e-6
    swt_wavelet: str = "haar"   # CombinedLoss default (perceptual_loss.py:1137-1141)
    swt_levels: int = 2
    fft_loss_type: str = "l1"
    ssim_window: int = 11


@dataclass(frozen=True)
class AugmentationConfig:
    enabled: bool = True
    use_flip: bool = True
    flip_prob: float = 0.5
    use_rotation: bool = True
    rotation_prob: float = 0.5


@dataclass(frozen=True)
class DatasetConfig:
    train_root: str = "dataset/DF2K"
    train_hr_subdir: str = "train_HR"
    train_lr_subdir: str = "train_LR"
    val_root: str = "dataset/DF2K"
    val_hr_subdir: str = "val_HR"
    val_lr_subdir: str = "val_LR"
    lr_patch_size: int = 64
    scale: int = 4
    repeat_factor: int = 1
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)


@dataclass(frozen=True)
class ValidationConfig:
    validate_every: int = 5
    crop_border: int = 4
    test_y_channel: bool = True
    # Validation batches per jitted call (same-shape samples are bucketed);
    # the reference runs val at batch 1 (train.py:644-649) — batching is a
    # TPU-side throughput choice with identical per-image metrics.
    batch_size: int = 4


@dataclass(frozen=True)
class CheckpointConfig:
    checkpoint_dir: str = "checkpoints/default"
    save_every: int = 10
    keep_best_k: int = 5
    keep_last_n: int = 10
    metric: str = "psnr"
    mode: str = "max"


@dataclass(frozen=True)
class LoggingConfig:
    """TensorBoard logging knobs (reference train_config.yaml:287-292)."""

    tensorboard: bool = True
    log_images: bool = True
    # grids logged from each validation epoch; cap per-epoch volume
    max_image_rows: int = 4
    print_freq: int = 50


@dataclass(frozen=True)
class TSDSRConfig:
    """TSD-SR refiner gate (reference train_config.yaml:85-92) — enabled
    but use_during_training: false in the reference recipe; the submission
    path mocks it out (io.py:45-54)."""

    enabled: bool = True
    use_during_training: bool = False
    student_path: str = "pretrained/tsdsr/transformer.safetensors"
    teacher_path: str = "pretrained/teacher/teacher.safetensors"
    vae_path: str = "pretrained/tsdsr/vae.safetensors"
    inference_steps: int = 1
    use_teacher_for_validation: bool = False


def _default_experts() -> Tuple[ExpertConfig, ...]:
    return (
        ExpertConfig("DRCT", architecture={
            "type": "DRCT-L", "embed_dim": 180,
            "depths": [6] * 12, "num_heads": [6] * 12, "window_size": 16}),
        ExpertConfig("GRL", architecture={
            "type": "GRL-B", "embed_dim": 180,
            "depths": [4, 4, 8, 8, 8, 4, 4], "window_size": 8}),
        ExpertConfig("NAFNet", architecture={
            "type": "NAFNet-SIDD-width64", "width": 64, "middle_blk_num": 12,
            "enc_blk_nums": [2, 2, 4, 8], "dec_blk_nums": [2, 2, 2, 2]}),
        ExpertConfig("MambaIR", remote_only=True, architecture={
            "type": "MambaIR", "embed_dim": 180, "depths": [6] * 6,
            "upsampler": "pixelshuffle"}),
    )


@dataclass(frozen=True)
class Config:
    experiment_name: str = "freqfusion_tpu"
    scale: int = 4
    seed: int = 42
    experts: Tuple[ExpertConfig, ...] = field(default_factory=_default_experts)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    validation: ValidationConfig = field(default_factory=ValidationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    tsdsr: TSDSRConfig = field(default_factory=TSDSRConfig)


def default_config() -> Config:
    return Config()


def _get(d: Dict, *keys, default=None):
    for k in keys:
        if not isinstance(d, dict) or k not in d:
            return default
        d = d[k]
    return d


def load_config(path: str) -> Config:
    """Load the reference train_config.yaml schema into a Config."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    experts = []
    for e in _get(raw, "model", "experts", default=[]) or []:
        experts.append(ExpertConfig(
            name=e.get("name", "?"),
            weight_path=e.get("weight_path"),
            frozen=e.get("frozen", True),
            remote_only=e.get("remote_only", False),
            architecture=e.get("architecture", {}) or {},
        ))
    if not experts:
        experts = list(_default_experts())

    fusion_raw = _get(raw, "model", "fusion", default={}) or {}
    imp = fusion_raw.get("improvements", {}) or {}
    fusion = FusionConfig(
        num_experts=fusion_raw.get("num_experts", 4),
        fusion_dim=fusion_raw.get("fusion_dim", 128),
        refine_channels=fusion_raw.get("refine_channels", 128),
        refine_depth=fusion_raw.get("refine_depth", 6),
        base_channels=fusion_raw.get("base_channels", 64),
        upscale=_get(raw, "model", "scale", default=4),
        dynamic_expert_selection=imp.get("dynamic_expert_selection", True),
        cross_band_attention=imp.get("cross_band_attention", True),
        adaptive_frequency_bands=imp.get("adaptive_frequency_bands", True),
        multi_resolution_fusion=imp.get("multi_resolution_fusion", True),
        collaborative_learning=imp.get("collaborative_learning", True),
        edge_enhancement=imp.get("edge_enhancement", True),
    )

    tr = raw.get("training", {}) or {}
    opt_raw = tr.get("optimizer", {}) or {}
    sch_raw = tr.get("scheduler", {}) or {}
    ema_raw = tr.get("ema", {}) or {}
    training = TrainingConfig(
        total_epochs=tr.get("total_epochs", 150),
        batch_size=tr.get("batch_size", 8),
        num_workers=tr.get("num_workers", 4),
        precision=tr.get("precision", "fp32"),
        gradient_clip=tr.get("gradient_clip", 1.0),
        accumulation_steps=tr.get("accumulation_steps", 4),
        optimizer=OptimizerConfig(
            type=opt_raw.get("type", "AdamW"),
            lr=float(opt_raw.get("lr", 2.0e-4)),
            betas=tuple(opt_raw.get("betas", (0.9, 0.999))),
            weight_decay=float(opt_raw.get("weight_decay", 1.0e-4)),
            eps=float(opt_raw.get("eps", 1.0e-8)),
        ),
        scheduler=SchedulerConfig(
            type=sch_raw.get("type", "CosineAnnealingWarmRestarts"),
            T_0=sch_raw.get("T_0", 50),
            T_mult=sch_raw.get("T_mult", 2),
            eta_min=float(sch_raw.get("eta_min", 5.0e-8)),
            warmup_epochs=sch_raw.get("warmup_epochs", 5),
            warmup_lr=float(sch_raw.get("warmup_lr", 5.0e-7)),
        ),
        ema=EMAConfig(
            enabled=ema_raw.get("enabled", True),
            decay=float(ema_raw.get("decay", 0.9995)),
        ),
    )

    stages = []
    for s in _get(raw, "loss", "stages", default=[]) or []:
        stages.append(LossStage(
            epochs=tuple(s.get("epochs", (0, 0))),
            stage_name=s.get("stage_name", "stage"),
            weights={k: float(v) for k, v in (s.get("weights", {}) or {}).items()},
            description=s.get("description", ""),
        ))
    loss = LossConfig(
        stages=tuple(stages) if stages else _default_stages(),
        charbonnier_eps=float(_get(raw, "loss", "charbonnier", "eps", default=1.0e-6)),
        swt_wavelet=_get(raw, "loss", "swt", "wavelet", default="haar") or "haar",
        swt_levels=int(_get(raw, "loss", "swt", "levels", default=2) or 2),
        fft_loss_type=_get(raw, "loss", "fft", "loss_type", default="l1") or "l1",
        ssim_window=int(_get(raw, "loss", "ssim", "window_size", default=11) or 11),
    )

    ds = raw.get("dataset", {}) or {}
    aug_raw = ds.get("augmentation", {}) or {}
    dataset = DatasetConfig(
        train_root=_get(ds, "train", "root", default="dataset/DF2K"),
        train_hr_subdir=_get(ds, "train", "hr_subdir", default="train_HR"),
        train_lr_subdir=_get(ds, "train", "lr_subdir", default="train_LR"),
        val_root=_get(ds, "val", "root", default="dataset/DF2K"),
        val_hr_subdir=_get(ds, "val", "hr_subdir", default="val_HR"),
        val_lr_subdir=_get(ds, "val", "lr_subdir", default="val_LR"),
        lr_patch_size=ds.get("lr_patch_size", 64),
        scale=ds.get("scale", 4),
        repeat_factor=ds.get("repeat_factor", 1),
        augmentation=AugmentationConfig(
            enabled=aug_raw.get("enabled", True),
            use_flip=aug_raw.get("use_flip", True),
            flip_prob=float(aug_raw.get("flip_prob", 0.5)),
            use_rotation=aug_raw.get("use_rotation", True),
            rotation_prob=float(aug_raw.get("rotation_prob", 0.5)),
        ),
    )

    val_raw = raw.get("validation", {}) or {}
    validation = ValidationConfig(
        validate_every=val_raw.get("validate_every", 5),
        crop_border=val_raw.get("crop_border", 4),
        batch_size=val_raw.get("batch_size", 4),
        test_y_channel=val_raw.get("test_y_channel", True),
    )

    ck = raw.get("checkpoint", {}) or {}
    checkpoint = CheckpointConfig(
        checkpoint_dir=ck.get("checkpoint_dir", "checkpoints/default"),
        save_every=ck.get("save_every", 10),
        keep_best_k=ck.get("keep_best_k", 5),
        keep_last_n=ck.get("keep_last_n", 10),
        metric=ck.get("metric", "psnr"),
        mode=ck.get("mode", "max"),
    )

    lg = raw.get("logging", {}) or {}
    tb_raw = lg.get("tensorboard", {}) or {}
    logging = LoggingConfig(
        tensorboard=tb_raw.get("enabled", True),
        log_images=bool(tb_raw.get("log_images_every", 500)),
        print_freq=lg.get("print_freq", 50),
    )

    ts = raw.get("tsdsr", {}) or {}
    tsdsr = TSDSRConfig(
        enabled=ts.get("enabled", True),
        use_during_training=ts.get("use_during_training", False),
        student_path=ts.get("student_path",
                            "pretrained/tsdsr/transformer.safetensors"),
        teacher_path=ts.get("teacher_path",
                            "pretrained/teacher/teacher.safetensors"),
        vae_path=ts.get("vae_path", "pretrained/tsdsr/vae.safetensors"),
        inference_steps=ts.get("inference_steps", 1),
        use_teacher_for_validation=ts.get("use_teacher_for_validation",
                                          False),
    )

    return Config(
        experiment_name=raw.get("experiment_name", "freqfusion_tpu"),
        scale=_get(raw, "model", "scale", default=4),
        seed=raw.get("seed", 42),
        experts=tuple(experts),
        fusion=fusion,
        training=training,
        loss=loss,
        dataset=dataset,
        validation=validation,
        checkpoint=checkpoint,
        logging=logging,
        tsdsr=tsdsr,
    )
