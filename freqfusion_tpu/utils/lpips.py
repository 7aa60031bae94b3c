"""LPIPS (VGG16 variant) — learned perceptual distance, JAX forward.

The reference computes LPIPS through pyiqa (eval.py:61-125). Neither
pyiqa nor network egress exists here, so this module implements the LPIPS
forward natively (Zhang et al. 2018, the 'vgg' net with linear
calibration): VGG16 features at relu{1_2,2_2,3_3,4_3,5_3}, channel-unit
normalization, squared difference, learned 1x1 non-negative weights,
spatial average, sum over taps.

Weights are a user-supplied artifact: point ``--lpips_weights`` at either
(a) an .npz produced by ``freqfusion_tpu.convert.lpips.convert_lpips``
from the official checkpoints, or (b) the official torch files directly
(vgg16 features state dict + LPIPS lin state dict) — conversion then runs
on the fly. Without a weights file the metric is reported unavailable
(never silently zero).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lpips_forward", "load_lpips_params", "VGG_CFG", "TAPS"]

# VGG16 'features' plan: channel widths per conv, 'M' = 2x2 maxpool.
VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
# tap after the ReLU of these conv indices (0-based over convs only):
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
TAPS = [1, 3, 6, 9, 12]

# Official input normalization (lpips/pretrained_networks ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [B, H, W, 3] in [-1, 1]. Returns the 5 tapped feature maps."""
    h = (x - _SHIFT.reshape(1, 1, 1, 3)) / _SCALE.reshape(1, 1, 1, 3)
    taps = []
    conv_i = 0
    for item in VGG_CFG:
        if item == "M":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        w = params[f"conv{conv_i}_kernel"]
        b = params[f"conv{conv_i}_bias"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        if conv_i in TAPS:
            taps.append(h)
        conv_i += 1
    return taps


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_forward(params: Dict, img0: jnp.ndarray,
                  img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch element. Images [B, H, W, 3] in [0, 1]."""
    x0 = img0 * 2.0 - 1.0
    x1 = img1 * 2.0 - 1.0
    f0 = _vgg_features(params, x0)
    f1 = _vgg_features(params, x1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = params[f"lin{i}_kernel"]          # [1, 1, C, 1]
        val = jax.lax.conv_general_dilated(
            d, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


def load_lpips_params(path: str) -> Dict:
    """Load converted LPIPS weights (.npz from convert_lpips), or convert
    torch checkpoints on the fly when given '<vgg.pth>:<lin.pth>'."""
    if ":" in path and not path.endswith(".npz"):
        from ..convert.lpips import convert_lpips_files
        vgg_path, lin_path = path.split(":", 1)
        return convert_lpips_files(vgg_path, lin_path)
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}
