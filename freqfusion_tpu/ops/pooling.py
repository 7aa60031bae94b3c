"""Pooling primitives, NHWC layout."""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["avg_pool_2x2", "global_avg_pool"]


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """avg_pool2d(kernel=2, stride=2) — floors odd sizes like PyTorch.

    Uses lax.reduce_window (XLA's native pooling path). The previous
    6-D reshape + mean((2,4)) split W — the sublane dimension — into
    strided pairs, which XLA lowered as full relayout copies: the
    round-3 GRL trace priced it at ~50 ms/img across 40 anchor
    downsamples (reshape 22 + copy 15 + reduce 13.5), ~16x the read
    roofline. FREQFUSION_POOL2X2=reshape restores the old route for
    measurement.
    """
    if os.environ.get("FREQFUSION_POOL2X2") == "reshape":
        b, h, w, c = x.shape
        h2, w2 = h // 2, w // 2
        x = x[:, : h2 * 2, : w2 * 2, :]
        x = x.reshape(b, h2, 2, w2, 2, c)
        return x.mean(axis=(2, 4))
    # flax's avg_pool rides the reduce-window-sum monoid (differentiable;
    # a dtype-array init_value would miss the monoid dispatch and lose
    # reverse-mode autodiff).
    return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) — mean over H, W."""
    return x.mean(axis=(1, 2), keepdims=keepdims)
