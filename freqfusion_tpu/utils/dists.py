"""DISTS (Deep Image Structure and Texture Similarity) — JAX forward.

The reference computes DISTS through pyiqa (reference eval.py:85-90, one
of the six Perception-track metrics in the Total Score formula,
eval.py:234-256). Like LPIPS (utils/lpips.py) it is a VGG16-feature
metric, so it gets the same native, weights-gated treatment: point
``--dists_weights`` at a converted .npz (convert.dists) or at
'<vgg16.pth>:<dists_weights.pt>' torch files, and the full Total Score
becomes computable without pyiqa.

Formula (Ding et al. 2020, official implementation): VGG16 features with
maxpool replaced by L2-pooling (3-tap hann window, stride 2), 6 stages
(the input image + relu{1_2,2_2,3_3,4_3,5_3}); per stage and channel,
texture similarity from spatial means and structure similarity from
variances/covariance, combined with the learned alpha/beta weights
(normalized by their joint sum); score = 1 - (texture + structure).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .lpips import VGG_CFG

__all__ = ["dists_forward", "load_dists_params", "CHNS"]

# per-stage channel counts: input image + the five tapped stages
CHNS = [3, 64, 128, 256, 512, 512]
# convs after whose ReLU a stage ends (0-based conv index in VGG_CFG)
_STAGE_END = [1, 3, 6, 9, 12]

# ImageNet normalization (the official DISTS mean/std buffers)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

# L2-pooling filter: hanning(5)[1:-1] outer product, normalized
_H3 = np.array([0.5, 1.0, 0.5], np.float32)
_L2_FILTER = (_H3[:, None] * _H3[None, :]) / 4.0  # [3, 3]


def _l2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(depthwise_conv(x^2, hann3x3, stride 2) + eps) — the official
    L2pooling(filter_size=5, stride=2) whose effective taps are 3."""
    c = x.shape[-1]
    k = jnp.asarray(_L2_FILTER).reshape(3, 3, 1, 1)
    k = jnp.broadcast_to(k, (3, 3, 1, c)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x * x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return jnp.sqrt(out + 1e-12)


def _vgg_stages(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [B, H, W, 3] in [0, 1]. Returns the 6 DISTS stages (incl. x)."""
    h = (x - _MEAN.reshape(1, 1, 1, 3)) / _STD.reshape(1, 1, 1, 3)
    stages = [x]
    conv_i = 0
    for item in VGG_CFG:
        if item == "M":
            h = _l2_pool(h)
            continue
        w = params[f"conv{conv_i}_kernel"]
        b = params[f"conv{conv_i}_bias"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        if conv_i in _STAGE_END:
            stages.append(h)
        conv_i += 1
    return stages


def dists_forward(params: Dict, img0: jnp.ndarray,
                  img1: jnp.ndarray) -> jnp.ndarray:
    """DISTS distance per batch element. Images [B, H, W, 3] in [0, 1]."""
    f0 = _vgg_stages(params, img0)
    f1 = _vgg_stages(params, img1)
    alpha = params["alpha"].reshape(-1)
    beta = params["beta"].reshape(-1)
    w_sum = jnp.sum(alpha) + jnp.sum(beta)
    c1 = c2 = 1e-6
    dist = 0.0
    off = 0
    for k, c in enumerate(CHNS):
        a_k = (alpha[off: off + c] / w_sum).reshape(1, c)
        b_k = (beta[off: off + c] / w_sum).reshape(1, c)
        off += c
        x_mean = jnp.mean(f0[k], axis=(1, 2))          # [B, C]
        y_mean = jnp.mean(f1[k], axis=(1, 2))
        s1 = (2 * x_mean * y_mean + c1) / (x_mean ** 2 + y_mean ** 2 + c1)
        x_var = jnp.mean((f0[k] - x_mean[:, None, None]) ** 2, axis=(1, 2))
        y_var = jnp.mean((f1[k] - y_mean[:, None, None]) ** 2, axis=(1, 2))
        xy_cov = jnp.mean(f0[k] * f1[k], axis=(1, 2)) - x_mean * y_mean
        s2 = (2 * xy_cov + c2) / (x_var + y_var + c2)
        dist = dist + jnp.sum(a_k * s1 + b_k * s2, axis=1)
    return 1.0 - dist


def load_dists_params(path: str) -> Dict:
    """Load converted DISTS weights (.npz from convert.dists), or convert
    torch checkpoints on the fly when given '<vgg16.pth>:<weights.pt>'."""
    if ":" in path and not path.endswith(".npz"):
        from ..convert.dists import convert_dists_files
        vgg_path, w_path = path.split(":", 1)
        return convert_dists_files(vgg_path, w_path)
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}
