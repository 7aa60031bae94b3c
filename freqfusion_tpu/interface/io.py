"""NTIRE submission interface: main(model_dir, input_path, output_path, device).

Drop-in equivalent of the reference's models/team29_FreqFusionSR/io.py
entry point (:295-347): loads the four expert checkpoints + fusion weights
from ``model_dir`` and runs x4 SR over every image in ``input_path``.

Checkpoint resolution order, per model:
  1. native msgpack ``{name}.ckpt`` written by our tools, else
  2. the reference's torch ``.pth`` files (DRCT-L_X4.pth, GRL-B_SR_x4.pth,
     NAFNet-SIDD-width64.pth, MambaIR_x4.pth, fusion_best.pth), converted
     on the fly via freqfusion_tpu.convert (requires torch on the host),
  3. missing -> that expert degrades gracefully (bilinear image + zero
     features, like cached_dataset.py:176-203 / train.py:739 warnings).

``device`` is accepted for interface compatibility; device placement is
JAX's (the default backend — a TPU under jit).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.pipeline import FreqFusionPipeline, build_expert_models
from ..utils.image_io import read_image, write_image

__all__ = ["main", "load_pipeline"]

_TORCH_FILES = {
    "drct": "DRCT-L_X4.pth",
    "grl": "GRL-B_SR_x4.pth",
    "nafnet": "NAFNet-SIDD-width64.pth",
    "mamba": "MambaIR_x4.pth",
    "fusion": "fusion_best.pth",
}

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _sniff_config(name: str, sd) -> Optional[Dict[str, Any]]:
    """Shape-derived model kwargs so checkpoints trained at a different
    geometry (e.g. official DRCT-L mlp_ratio=2 vs the reference's 4) load
    into a matching model instead of hard-failing (expert_loader.py:81-118
    equivalent)."""
    try:
        if name == "drct":
            from ..convert.drct import sniff_drct_config
            return sniff_drct_config(sd)
        if name == "mamba":
            from ..convert.mambair import sniff_mambair_config
            return sniff_mambair_config(sd)
    except Exception as e:  # noqa: BLE001 — sniffing is best-effort
        print(f"  ! {name} config sniff failed: {e}")
    return None


def _convert_torch(name: str, path: str):
    """Returns (params_or_None, sniffed_config_or_None)."""
    from ..convert.common import load_torch_state_dict
    sd = load_torch_state_dict(path)
    sniffed = _sniff_config(name, sd)
    return _convert_torch_sd(name, sd), sniffed


def _convert_torch_sd(name: str, sd) -> Optional[Dict[str, Any]]:
    if name == "drct":
        from ..convert.drct import convert_drct
        return convert_drct(sd)
    if name == "grl":
        from ..convert.grl import convert_grl
        return convert_grl(sd)
    if name == "nafnet":
        from ..convert.nafnet import convert_nafnet
        return convert_nafnet(sd)
    if name == "mamba":
        from ..convert.mambair import convert_mambair
        return convert_mambair(sd)
    if name == "fusion":
        from ..convert.fusion import convert_fusion
        return convert_fusion(sd)
    if name == "dat":
        from ..convert.dat import convert_dat
        return convert_dat(sd)
    if name == "hat":
        from ..convert.hat import convert_hat
        return convert_hat(sd)
    if name == "edsr":
        from ..convert.edsr import convert_edsr
        return convert_edsr(sd)
    return None


def _load_params(model_dir: str, verbose: bool = True) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    overrides: Dict[str, Dict[str, Any]] = {}
    mdir = Path(model_dir)
    for name in ("drct", "grl", "nafnet", "mamba", "fusion"):
        native = mdir / f"{name}.ckpt"
        torch_path = mdir / _TORCH_FILES[name]
        if native.exists():
            from ..training.checkpoint import load_pytree
            from flax import serialization
            with open(native, "rb") as f:
                params[name] = serialization.msgpack_restore(f.read())
            if verbose:
                print(f"  loaded {name} from {native.name}")
        elif torch_path.exists():
            try:
                params[name], sniffed = _convert_torch(name, str(torch_path))
                if sniffed:
                    overrides[name] = sniffed
                if verbose:
                    print(f"  converted {name} from {torch_path.name}")
            except Exception as e:  # noqa: BLE001 — degrade like the reference
                print(f"  ! {name} conversion failed: {e}")
        else:
            if verbose:
                print(f"  ! {name} checkpoint not found "
                      f"({native.name} / {torch_path.name})")
    return params, overrides


def load_pipeline(model_dir: str, scale: int = 4,
                  init_missing_fusion: bool = True,
                  verbose: bool = True,
                  jit_mode: str = "per_expert",
                  use_scan: bool = False) -> FreqFusionPipeline:
    """use_scan=True restacks converted params for the nn.scan layer
    variants (smaller programs; enables jit_mode='full' single-program
    execution)."""
    import jax.numpy as jnp

    expert_dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
        os.environ.get("FREQFUSION_EXPERT_DTYPE", "").lower())
    expert_parallel = os.environ.get(
        "FREQFUSION_EXPERT_PARALLEL", "0") not in ("0", "false", "")
    params, overrides = _load_params(model_dir, verbose)
    if "fusion" not in params and init_missing_fusion:
        # Random fusion weights (warned, like train.py:739)
        import jax
        from ..models.fusion.fusion_v2 import CompleteEnhancedFusionSR
        print("  ! fusion weights missing — random init")
        model = CompleteEnhancedFusionSR(upscale=scale)
        h = w = 16
        mock_imgs = {k: jnp.zeros((1, h * scale, w * scale, 3))
                     for k in ("drct", "grl", "nafnet", "mamba")}
        mock_feats = {k: jnp.zeros(
            (1, h, w, FreqFusionPipeline.FEATURE_CHANNELS[k]))
            for k in ("drct", "grl", "nafnet", "mamba")}
        params["fusion"] = model.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, h, w, 3)),
                                      mock_imgs, mock_feats)
    if expert_parallel:
        import jax
        if len(jax.devices()) >= 2:
            # one expert per chip, host-async dispatch: ensemble latency
            # becomes max(expert latencies) instead of their sum
            from ..models.pipeline import build_expert_models
            from ..parallel.expert_parallel import ExpertParallelPipeline
            if verbose:
                print(f"  expert-parallel over {len(jax.devices())} devices")
            return ExpertParallelPipeline(
                params, scale=scale, expert_dtype=expert_dtype,
                models=build_expert_models(scale, use_scan=use_scan,
                                           overrides=overrides or None))
        print("  ! FREQFUSION_EXPERT_PARALLEL needs >= 2 devices — "
              "falling back to the single-device pipeline")
    return FreqFusionPipeline(params, scale=scale, jit_mode=jit_mode,
                              use_scan=use_scan, expert_dtype=expert_dtype,
                              model_overrides=overrides or None)


def _load_tsdsr_refiner(model_dir: str):
    """Optional TSD-SR perceptual refiner. The reference's submission
    path mocks the whole module out (io.py:45-54); ours mirrors that
    default and only activates when FREQFUSION_TSDSR=1 AND both weight
    files exist in model_dir (tsdsr_dit.pth + tsdsr_vae.pth, or
    .safetensors)."""
    from ..models.tsdsr import TSDSRRefiner

    if os.environ.get("FREQFUSION_TSDSR", "0") in ("0", "false", ""):
        return TSDSRRefiner(enabled=False)
    mdir = Path(model_dir)
    dit_p = vae_p = None
    for ext in (".pth", ".safetensors", ".pt"):
        if (mdir / f"tsdsr_dit{ext}").exists():
            dit_p = mdir / f"tsdsr_dit{ext}"
        if (mdir / f"tsdsr_vae{ext}").exists():
            vae_p = mdir / f"tsdsr_vae{ext}"
    if dit_p is None or vae_p is None:
        return TSDSRRefiner(enabled=True)  # warns + identity
    try:
        from ..convert.common import load_torch_state_dict
        from ..convert.tsdsr import convert_sd_vae, convert_tsdsr_dit
        dit_params = convert_tsdsr_dit(load_torch_state_dict(str(dit_p)))
        vae_params = convert_sd_vae(load_torch_state_dict(str(vae_p)))
        return TSDSRRefiner(enabled=True, dit_params=dit_params,
                            vae_params=vae_params)
    except Exception as e:  # noqa: BLE001 — degrade like the reference
        print(f"  ! TSD-SR conversion failed: {e}")
        return TSDSRRefiner(enabled=True)


def main(model_dir: str, input_path: str, output_path: str,
         device=None) -> None:
    """NTIRE challenge ABI (reference io.py:295-347)."""
    os.makedirs(output_path, exist_ok=True)
    pipeline = load_pipeline(model_dir)
    refiner = _load_tsdsr_refiner(model_dir)

    files = sorted(p for p in Path(input_path).iterdir()
                   if p.suffix.lower() in _IMG_EXTS)
    print(f"FreqFusionSR-TPU: {len(files)} images")
    for i, path in enumerate(files):
        t0 = time.perf_counter()
        lr = read_image(str(path))[None]          # [1, H, W, 3]
        sr_b = pipeline(jnp.asarray(lr))
        if refiner.enabled:
            sr_b = refiner(sr_b)
        sr = np.asarray(sr_b[0])
        out_file = Path(output_path) / f"{path.stem}.png"
        write_image(str(out_file), sr)
        print(f"  [{i + 1}/{len(files)}] {path.name} "
              f"{lr.shape[1]}x{lr.shape[2]} -> {sr.shape[0]}x{sr.shape[1]} "
              f"({time.perf_counter() - t0:.2f}s)")
