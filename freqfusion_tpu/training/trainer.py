"""Training driver: cached-mode (and live-expert) fusion training.

Functional re-design of the reference train loop (train.py:536-1179):
config -> data -> model -> staged CombinedLoss -> AdamW + warmup/cosine
warm restarts + grad accumulation -> EMA -> validation (EMA weights,
Y-channel PSNR/SSIM crop 4) -> best-K checkpointing with amnesia-proof
resume. One jitted train step per loss stage (stage weights are static per
trace, so each stage compiles to its own lean program — the XLA analogue of
"components computed only if weight > 0", perceptual_loss.py:1228-1231).

Data parallel by construction: params replicated, batch sharded over the
mesh's data axis (parallel/mesh.py).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.cached import CachedFeatureDataset, EXPERTS, FEATURE_CHANNELS
from ..data.loader import Batcher, PrefetchLoader
from ..models.fusion.fusion_v2 import CompleteEnhancedFusionSR
from ..parallel.mesh import batch_sharding, make_mesh, replicate
from ..utils.logger import MetricLogger
from .checkpoint import CheckpointManager, load_pytree, save_pytree
from .schedule import MultiStageLossScheduler
from .state import (TrainState, create_optimizer, make_eval_step,
                    make_train_step, split_variables)

__all__ = ["FusionTrainer"]


def _batch_to_model_inputs(batch: Dict[str, np.ndarray]):
    imgs = {e: batch[f"{e}_img"] for e in EXPERTS if f"{e}_img" in batch}
    feats = {e: batch[f"{e}_feat"] for e in EXPERTS if f"{e}_feat" in batch}
    return {"lr": batch["lr"], "hr": batch["hr"],
            "expert_imgs": imgs, "expert_feats": feats}


class FusionTrainer:
    """Cached-mode fusion training (the reference's --cached fast path).

    Live mode (experts inside the step, reference train_epoch
    train.py:130-248): pass ``expert_params`` and a paired-image dataset
    via ``live_data=(lr_dir, hr_dir)`` instead of a cache. Experts run
    frozen under stop_gradient in the same jitted step; on TPU there is no
    OOM choreography — XLA schedules all four plus the fusion backward.
    """

    def __init__(self, cfg: Config, cache_dir: Optional[str] = None,
                 val_cache_dir: Optional[str] = None,
                 checkpoint_dir: Optional[str] = None,
                 n_devices: Optional[int] = None,
                 live_data: Optional[tuple] = None,
                 expert_params: Optional[Dict[str, Any]] = None,
                 expert_models: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        self.model = CompleteEnhancedFusionSR(
            num_experts=cfg.fusion.num_experts,
            fusion_dim=cfg.fusion.fusion_dim,
            refine_channels=cfg.fusion.refine_channels,
            refine_depth=cfg.fusion.refine_depth,
            base_channels=cfg.fusion.base_channels,
            upscale=cfg.fusion.upscale,
            enable_dynamic_selection=cfg.fusion.dynamic_expert_selection,
            enable_cross_band_attn=cfg.fusion.cross_band_attention,
            enable_adaptive_bands=cfg.fusion.adaptive_frequency_bands,
            enable_multi_resolution=cfg.fusion.multi_resolution_fusion,
            enable_collaborative=cfg.fusion.collaborative_learning,
            enable_edge_enhance=cfg.fusion.edge_enhancement,
        )

        self.expert_params = expert_params
        self.expert_models = None
        if live_data is not None:
            from ..data.dataset import SRPairDataset
            from ..models.pipeline import build_expert_models
            lr_dir, hr_dir = live_data
            self.train_data = SRPairDataset(
                lr_dir, hr_dir, scale=cfg.dataset.scale,
                lr_patch_size=cfg.dataset.lr_patch_size,
                augment=cfg.dataset.augmentation.enabled,
                repeat_factor=cfg.dataset.repeat_factor, seed=cfg.seed)
            self.expert_models = (expert_models
                                  or build_expert_models(cfg.dataset.scale))
        else:
            self.train_data = CachedFeatureDataset(
                cache_dir, augment=cfg.dataset.augmentation.enabled,
                flip_prob=cfg.dataset.augmentation.flip_prob,
                rot_prob=cfg.dataset.augmentation.rotation_prob,
                repeat_factor=cfg.dataset.repeat_factor, seed=cfg.seed)
        self.val_data = (CachedFeatureDataset(val_cache_dir, augment=False)
                         if val_cache_dir else None)

        self.batcher = PrefetchLoader(
            Batcher(self.train_data, cfg.training.batch_size,
                    shuffle=True, seed=cfg.seed),
            prefetch=max(1, cfg.training.num_workers // 2))
        self.steps_per_epoch = len(self.batcher)

        if n_devices is None:
            # largest device count that divides the global batch
            import math
            n_devices = math.gcd(cfg.training.batch_size,
                                 len(jax.devices()))
        self.mesh = make_mesh(n_data=n_devices)
        self.scheduler = MultiStageLossScheduler(cfg.loss.stages)
        self.ckpt = CheckpointManager(
            checkpoint_dir or cfg.checkpoint.checkpoint_dir,
            keep_best_k=cfg.checkpoint.keep_best_k,
            keep_last_n=cfg.checkpoint.keep_last_n,
            metric=cfg.checkpoint.metric, mode=cfg.checkpoint.mode)
        self.logger = MetricLogger(self.ckpt.dir / "train_log.jsonl")
        from ..utils.logger import TensorBoardLogger
        self.tb = TensorBoardLogger(str(self.ckpt.dir / "tb"))

        self.tx = create_optimizer(cfg, self.steps_per_epoch)
        self.state: Optional[TrainState] = None
        self._train_steps: Dict[int, Any] = {}
        self._eval_step = None
        self.start_epoch = 0
        self.best_psnr = -1.0

    # -- setup -----------------------------------------------------------
    def _init_state(self) -> TrainState:
        sample = _batch_to_model_inputs(self.train_data[0])
        lr = sample["lr"][None]
        if sample["expert_imgs"]:
            imgs = {k: v[None] for k, v in sample["expert_imgs"].items()}
            feats = {k: v[None] for k, v in sample["expert_feats"].items()}
        else:  # live mode: init against zero expert stand-ins
            s = self.cfg.dataset.scale
            h, w = lr.shape[1], lr.shape[2]
            imgs = {e: np.zeros((1, h * s, w * s, 3), np.float32)
                    for e in EXPERTS}
            feats = {e: np.zeros((1, h, w, FEATURE_CHANNELS[e]), np.float32)
                     for e in EXPERTS}
        variables = self.model.init(
            jax.random.PRNGKey(self.cfg.seed), lr, imgs, feats)
        params, model_state = split_variables(variables)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
        print(f"fusion trainable params: {n / 1e6:.3f}M")
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.array, params),
            model_state=model_state,
            rng=jax.random.PRNGKey(self.cfg.seed),
        )

    def _expert_forward(self, lr):
        """Frozen expert inference inside the step (live mode). LR patches
        are window-multiple (64), so no padding is needed; NAFNet's HR
        feature is resized to LR like io.py:255-258."""
        from ..models.pipeline import EXPERT_ORDER
        from ..ops.resize import resize_bilinear

        h, w = lr.shape[1], lr.shape[2]
        imgs, feats = {}, {}
        for name in EXPERT_ORDER:
            if name not in self.expert_params:
                continue
            sr, feat = self.expert_models[name].apply(
                self.expert_params[name], lr)
            if name == "mamba":
                sr = jnp.clip(sr, 0.0, 1.0)
            if feat.shape[1] != h:
                feat = resize_bilinear(feat, h, w)
            imgs[name] = jax.lax.stop_gradient(sr)
            feats[name] = jax.lax.stop_gradient(feat)
        return imgs, feats

    def _apply_train(self, params, model_state, batch, rng):
        if self.expert_models is not None:
            imgs, feats = self._expert_forward(batch["lr"])
        else:
            imgs, feats = batch["expert_imgs"], batch["expert_feats"]
        sr, updated = self.model.apply(
            {"params": params, **model_state},
            batch["lr"], imgs, feats,
            train=True, rngs={"dropout": rng},
            mutable=list(model_state.keys()))
        return sr, updated

    def _apply_eval(self, params, model_state, batch):
        return self.model.apply(
            {"params": params, **model_state},
            batch["lr"], batch["expert_imgs"], batch["expert_feats"],
            train=False)

    def _step_for_stage(self, stage_idx: int, weights: Dict[str, float]):
        if stage_idx not in self._train_steps:
            self._train_steps[stage_idx] = make_train_step(
                self._apply_train, self.tx,
                loss_weights=weights,
                ema_decay=(self.cfg.training.ema.decay
                           if self.cfg.training.ema.enabled else None))
        return self._train_steps[stage_idx]

    # -- resume ----------------------------------------------------------
    def maybe_resume(self, path: Optional[str] = None) -> bool:
        target_path = path or self.ckpt.latest_path()
        if target_path is None:
            return False
        if self.state is None:
            self.state = self._init_state()
        payload = {"state": self.state, "epoch": 0, "best_psnr": 0.0}
        payload = load_pytree(target_path, payload)
        self.state = payload["state"]
        self.start_epoch = int(payload["epoch"]) + 1
        self.best_psnr = float(payload["best_psnr"])
        print(f"resumed from {target_path} at epoch {self.start_epoch}")
        return True

    # -- loops -----------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        if self.state is None:
            self.state = self._init_state()
        weights, changed = self.scheduler.step(epoch)
        stage_idx = self.scheduler.stage_index(epoch)
        if changed:
            stage = self.scheduler.current_stage
            print(f"epoch {epoch}: loss stage '{stage.stage_name}' "
                  f"weights={stage.weights}")
        step_fn = self._step_for_stage(
            stage_idx, {k: v for k, v in weights.items() if v > 0})

        self.batcher.set_epoch(epoch)
        shard = batch_sharding(self.mesh)
        # Metrics accumulate on-device; syncing (float()) every step would
        # force a host round-trip per batch and defeat async dispatch
        # (the reference only syncs every print_freq, train.py:363-374).
        totals_dev = None
        count = 0
        t0 = time.time()
        with self.mesh:
            for batch in self.batcher:
                inputs = _batch_to_model_inputs(batch)
                dev = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, shard), inputs)
                self.state, metrics = step_fn(self.state, dev)
                count += 1
                totals_dev = (metrics if totals_dev is None else
                              jax.tree_util.tree_map(jnp.add, totals_dev,
                                                     metrics))
        totals = ({} if totals_dev is None else
                  {k: float(v) for k, v in totals_dev.items()})
        dt = time.time() - t0
        avg = {k: v / max(count, 1) for k, v in totals.items()}
        avg["imgs_per_sec"] = (count * self.cfg.training.batch_size) / max(dt, 1e-9)
        return avg

    def validate(self) -> Dict[str, float]:
        if self.val_data is None:
            return {}
        if self._eval_step is None:
            self._eval_step = make_eval_step(
                self._apply_eval,
                crop_border=self.cfg.validation.crop_border,
                test_y_channel=self.cfg.validation.test_y_channel)
        # validate with EMA weights applied (train.py:449-452)
        params = self.state.ema_params or self.state.params

        # Bucket samples by LR shape and run each bucket as batched jitted
        # calls — the former batch-1 Python loop paid ~26 ms relay overhead
        # per image before any compute. Eval metrics come back per-image.
        buckets: Dict[tuple, list] = {}
        for i in range(len(self.val_data)):
            sample = _batch_to_model_inputs(self.val_data[i])
            buckets.setdefault(sample["lr"].shape, []).append(sample)

        max_bs = max(1, self.cfg.validation.batch_size)
        sums: Dict[str, float] = {}
        n = 0
        self._last_val_images = None
        for samples in buckets.values():
            for start in range(0, len(samples), max_bs):
                group = samples[start:start + max_bs]
                batch = {
                    "lr": np.stack([s["lr"] for s in group]),
                    "hr": np.stack([s["hr"] for s in group]),
                    "expert_imgs": {
                        k: np.stack([s["expert_imgs"][k] for s in group])
                        for k in group[0]["expert_imgs"]},
                    "expert_feats": {
                        k: np.stack([s["expert_feats"][k] for s in group])
                        for k in group[0]["expert_feats"]},
                }
                sr, metrics = self._eval_step(params, self.state.model_state,
                                              batch)
                if (self._last_val_images is None
                        and getattr(self.cfg.logging, "log_images", True)):
                    # First validation group: LR/SR/HR grids for TB
                    # (reference logs these from validate, logger.py:31+)
                    rows = getattr(self.cfg.logging, "max_image_rows", 4)
                    self._last_val_images = {
                        "lr": batch["lr"][:rows],
                        "sr": np.asarray(sr[:rows]),
                        "hr": batch["hr"][:rows],
                    }
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
                n += len(group)
        return {k: v / max(n, 1) for k, v in sums.items()}

    def fit(self, total_epochs: Optional[int] = None) -> Dict[str, float]:
        total = total_epochs or self.cfg.training.total_epochs
        if self.state is None:
            self.state = self._init_state()
        last_val: Dict[str, float] = {}
        for epoch in range(self.start_epoch, total):
            train_metrics = self.train_epoch(epoch)
            log = {"epoch": epoch, **{f"train/{k}": v
                                      for k, v in train_metrics.items()}}

            # Reset per epoch: only epochs that actually validated may be
            # recorded as 'best' (reference resets val_metrics=None each
            # epoch, train.py:1087) — a stale carry-over would mark
            # non-validated epochs best with an unmeasured PSNR.
            val_metrics: Optional[Dict[str, float]] = None
            if (self.val_data is not None
                    and ((epoch + 1) % self.cfg.validation.validate_every == 0
                         or epoch == total - 1)):
                val_metrics = self.validate()
                last_val = val_metrics
                log.update({f"val/{k}": v for k, v in val_metrics.items()})
                if val_metrics.get("psnr", -1) > self.best_psnr:
                    self.best_psnr = val_metrics["psnr"]
                if getattr(self, "_last_val_images", None):
                    for tag, imgs in self._last_val_images.items():
                        self.tb.images(f"val/{tag}", imgs, epoch)

            self.logger.log(log)
            self.tb.scalars({k: v for k, v in log.items() if k != "epoch"},
                            epoch)
            print(f"epoch {epoch}: loss={train_metrics.get('loss', 0):.4f} "
                  + (f"psnr={last_val.get('psnr', 0):.2f} " if last_val else "")
                  + f"({train_metrics['imgs_per_sec']:.1f} img/s)")

            scheduled = ((epoch + 1) % self.cfg.checkpoint.save_every == 0
                         or epoch == total - 1)
            self.ckpt.save(
                {"state": self.state, "epoch": epoch,
                 "best_psnr": self.best_psnr},
                epoch, metrics=val_metrics, scheduled=scheduled)
        return last_val
