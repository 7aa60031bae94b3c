"""VGG-perceptual and CLIP-threshold loss components (availability-gated).

The reference defines both (perceptual_loss.py:298-499 VGG19 relu2_2/
relu3_4/relu4_4; :856-989 CLIP pos/neg-prompt threshold loss) but ships
them with weight 0 in every training stage (configs/train_config.yaml:
201-210) — they are dormant in the recipe. Their pretrained backbones
(torchvision VGG19, CLIP) also require network downloads this environment
forbids.

This module preserves the contract: ``vgg_loss_fn()`` / ``clip_loss_fn()``
return CombinedLoss-compatible callables when the torch backbones are
locally available, else None (the reference's own import-guard pattern,
perceptual_loss.py:39-59). They execute on the host via pure_callback, so
they are usable for evaluation and (slowly) for training; a JAX-native VGG
port becomes worthwhile only if a recipe ever sets their weight > 0.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["vgg_loss_fn", "clip_loss_fn"]


def _try_vgg():
    try:
        import torch
        import torchvision
        vgg = torchvision.models.vgg19(weights="DEFAULT").features.eval()
        return torch, vgg
    except Exception:
        return None


def vgg_loss_fn(layers=(8, 17, 26),
                weights=(0.5, 0.3, 0.2)) -> Optional[Callable]:
    """relu2_2 / relu3_4 / relu4_4 feature L1 (perceptual_loss.py:455-499).
    Returns None when torchvision VGG19 weights are unavailable."""
    loaded = _try_vgg()
    if loaded is None:
        return None
    torch, vgg = loaded
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def host_loss(pred_np: np.ndarray, target_np: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            total = 0.0
            for img_pair in [(pred_np, target_np)]:
                p = torch.from_numpy(np.ascontiguousarray(
                    np.asarray(img_pair[0]).transpose(0, 3, 1, 2)))
                t = torch.from_numpy(np.ascontiguousarray(
                    np.asarray(img_pair[1]).transpose(0, 3, 1, 2)))
                p = (p - mean) / std
                t = (t - mean) / std
                loss = 0.0
                x_p, x_t = p, t
                last = 0
                for li, w in zip(layers, weights):
                    for mod in list(vgg.children())[last:li + 1]:
                        x_p = mod(x_p)
                        x_t = mod(x_t)
                    last = li + 1
                    loss = loss + w * (x_p - x_t).abs().mean()
                total += float(loss)
            return np.float32(total)

    def loss(pred, target):
        import jax
        import jax.numpy as jnp
        return jax.pure_callback(
            host_loss, jax.ShapeDtypeStruct((), jnp.float32), pred, target)

    return loss


POSITIVE_PROMPTS = (
    "a high quality detailed sharp photograph",
    "a professional clear image with fine details",
    "a sharp high resolution photo with crisp edges",
    "a perfectly focused detailed photograph",
    "an ultra high definition clear image",
)
NEGATIVE_PROMPTS = (
    "a blurry low quality noisy image",
    "an unclear distorted photograph",
    "a low resolution blurry picture",
    "a pixelated degraded image",
    "an out of focus fuzzy photo",
)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_threshold_loss(pos_sim, neg_sim, threshold: float = 0.5):
    """The pure threshold math of CLIPPerceptualLoss
    (perceptual_loss.py:977-988): quality = (pos - neg + 1)/2, penalize
    only below threshold with a 0.1 margin."""
    import jax.numpy as jnp
    quality = (pos_sim - neg_sim + 1.0) / 2.0
    return jnp.maximum(threshold - quality + 0.1, 0.0).mean()


def clip_loss_fn(threshold: float = 0.5) -> Optional[Callable]:
    """CLIP pos/neg prompt similarity threshold loss
    (perceptual_loss.py:856-989). None when CLIP is unavailable.

    When the ``clip`` package (and torch) is importable, builds the full
    SNUCV-style loss: encode the prompt banks once, then per call resize
    pred to 224, CLIP-normalize, encode on the host (pure_callback — the
    backbone is frozen, no_grad in the reference too), and apply the
    threshold penalty in JAX."""
    try:
        import clip
        import torch
        device = "cpu"
        model, _ = clip.load("ViT-B/32", device=device)
    except Exception:
        return None

    model.eval()
    with torch.no_grad():
        pos = model.encode_text(clip.tokenize(list(POSITIVE_PROMPTS))).float()
        neg = model.encode_text(clip.tokenize(list(NEGATIVE_PROMPTS))).float()
        pos = pos / pos.norm(dim=-1, keepdim=True)
        neg = neg / neg.norm(dim=-1, keepdim=True)

    def host_sims(pred_np):
        with torch.no_grad():
            p = torch.from_numpy(
                np.ascontiguousarray(np.asarray(pred_np).transpose(0, 3, 1, 2)))
            p = torch.nn.functional.interpolate(
                p, size=(224, 224), mode="bicubic",
                align_corners=False).clamp(0, 1)
            p = (p - torch.from_numpy(_CLIP_MEAN).view(1, 3, 1, 1)) \
                / torch.from_numpy(_CLIP_STD).view(1, 3, 1, 1)
            feat = model.encode_image(p).float()
            feat = feat / feat.norm(dim=-1, keepdim=True)
            return ((feat @ pos.T).mean(dim=1).numpy().astype(np.float32),
                    (feat @ neg.T).mean(dim=1).numpy().astype(np.float32))

    def loss(pred, target=None):
        import jax
        import jax.numpy as jnp
        b = pred.shape[0]
        shape = jax.ShapeDtypeStruct((b,), jnp.float32)
        pos_sim, neg_sim = jax.pure_callback(host_sims, (shape, shape), pred)
        return clip_threshold_loss(pos_sim, neg_sim, threshold)

    return loss
