"""Pooling primitives, NHWC layout."""

from __future__ import annotations


import jax.numpy as jnp

__all__ = ["avg_pool_2x2", "global_avg_pool"]


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """avg_pool2d(kernel=2, stride=2) — floors odd sizes like PyTorch."""
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :]
    x = x.reshape(b, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) — mean over H, W."""
    return x.mean(axis=(1, 2), keepdims=keepdims)
