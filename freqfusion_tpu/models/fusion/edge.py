"""Phase 7b: Laplacian-pyramid edge refinement.

Re-design of src/models/edge_enhancement.py:126-260: 3-level Laplacian
pyramid (5x5 Gaussian sigma 1.5 blur + 2x2 avg-pool downsample), per-level
residual edge-refine CNNs with spatial attention, softmax level weights,
fusion conv to an edge map, and a per-pixel gate with a learnable edge
strength (init 0.15). Output clamped to [0,1] like the reference.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.pooling import avg_pool_2x2
from ...ops.resize import resize_bilinear
from ...ops.conv1x1 import Conv1x1

__all__ = ["LaplacianPyramidRefinement", "gaussian_blur_5x5"]

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU()'s default, which every fusion
    module in the reference uses (e.g. edge_enhancement.py, 17 sites)."""
    return nn.gelu(x, approximate=False)



def _gaussian_kernel_np(kernel_size: int = 5, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float32) - kernel_size // 2
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g)


def gaussian_blur_5x5(x: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Fixed depthwise Gaussian blur, SAME (zero) padding like torch conv2d."""
    c = x.shape[-1]
    k = _gaussian_kernel_np(5, sigma)
    kernel = jnp.tile(jnp.asarray(k).astype(x.dtype)[:, :, None, None],
                      (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class EdgeRefineBlock(nn.Module):
    """3-conv residual refiner + spatial attention (reference :92-119)."""

    feat_ch: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = Conv1x1(self.feat_ch, name="proj")(x)
        h = _gelu(nn.Conv(self.feat_ch, (3, 3), padding=((1, 1), (1, 1)),
                            name="conv1")(x))
        h = _gelu(nn.Conv(self.feat_ch, (3, 3), padding=((1, 1), (1, 1)),
                            name="conv2")(h))
        h = nn.Conv(self.feat_ch, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(h)
        h = h + identity
        a = Conv1x1(self.feat_ch // 4, name="attn_0")(h)
        a = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="attn_2")(_gelu(a))
        return h * nn.sigmoid(a)


def build_laplacian_pyramid(img: jnp.ndarray, num_levels: int
                            ) -> Tuple[List[jnp.ndarray], List[Tuple[int, int]]]:
    """Gaussian-blur pyramid; last level is the low-pass residual."""
    pyramid, sizes = [], []
    current = img
    for level in range(num_levels):
        h, w = current.shape[1], current.shape[2]
        sizes.append((h, w))
        if level < num_levels - 1:
            down = avg_pool_2x2(gaussian_blur_5x5(current))
            up = resize_bilinear(down, h, w)
            pyramid.append(current - up)
            current = down
        else:
            pyramid.append(current)
    return pyramid, sizes


class LaplacianPyramidRefinement(nn.Module):
    num_levels: int = 3
    channels: int = 32
    init_edge_strength: float = 0.15

    @nn.compact
    def __call__(self, sr_img: jnp.ndarray) -> jnp.ndarray:
        h, w = sr_img.shape[1], sr_img.shape[2]
        level_weights = self.param(
            "level_weights",
            lambda rng: jnp.full((self.num_levels,), 1.0 / self.num_levels,
                                 jnp.float32))
        edge_strength = self.param(
            "edge_strength",
            lambda rng: jnp.asarray(self.init_edge_strength, jnp.float32))

        pyramid, _ = build_laplacian_pyramid(sr_img, self.num_levels)
        lw = nn.softmax(level_weights)

        import os

        from ...ops.dispatch import use_pallas
        if (os.environ.get("FREQFUSION_EDGE") == "1" and use_pallas()
                and self.num_levels == 3):
            # The whole 32-channel compute (per-level EdgeRefineBlock +
            # weighted concat + fusion/gate chain) in 4 halo-4 passes
            # (ops/pallas_edge.py); only the 3-channel pyramid build and
            # the 2 feature upsamples stay in XLA. EVAL-ONLY: no VJP —
            # the flag is for the inference bench path, never training.
            from ..param_decl import Conv1x1Params, Conv3x3Params
            from ...ops.pallas_edge import edge_fuse_fused, edge_refine_fused

            class _RefineP(nn.Module):
                cin: int
                f: int

                @nn.compact
                def __call__(self):
                    return {
                        "proj": Conv1x1Params(self.cin, self.f,
                                              name="proj")(),
                        "conv1": Conv3x3Params(self.cin, self.f,
                                               name="conv1")(),
                        "conv2": Conv3x3Params(self.f, self.f,
                                               name="conv2")(),
                        "conv3": Conv3x3Params(self.f, self.f,
                                               name="conv3")(),
                        "attn_0": Conv1x1Params(self.f, self.f // 4,
                                                name="attn_0")(),
                        "attn_2": Conv3x3Params(self.f // 4, 1,
                                                name="attn_2")(),
                    }

            kfeats = []
            for level, lap in enumerate(pyramid):
                pr = _RefineP(lap.shape[-1], self.channels,
                              name=f"edge_refiners_{level}")()
                f = edge_refine_fused(lap, pr)
                if f.shape[1] != h or f.shape[2] != w:
                    f = resize_bilinear(f, h, w)
                kfeats.append(f)
            pf = {
                "fusion_0": Conv3x3Params(self.channels * 3,
                                          self.channels,
                                          name="fusion_0")(),
                "fusion_2": Conv3x3Params(self.channels, 3,
                                          name="fusion_2")(),
                "edge_gate_0": Conv3x3Params(6, 16, name="edge_gate_0")(),
                "edge_gate_2": Conv3x3Params(16, 1, name="edge_gate_2")(),
            }
            return edge_fuse_fused(sr_img, kfeats[0], kfeats[1],
                                   kfeats[2], lw, edge_strength, pf)

        feats = []
        for level, lap in enumerate(pyramid):
            f = EdgeRefineBlock(self.channels, name=f"edge_refiners_{level}")(lap)
            if f.shape[1] != h or f.shape[2] != w:
                f = resize_bilinear(f, h, w)
            feats.append(f * lw[level])

        allf = jnp.concatenate(feats, axis=-1)
        e = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="fusion_0")(allf)
        edge_map = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)),
                           name="fusion_2")(_gelu(e))

        g = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), name="edge_gate_0")(
            jnp.concatenate([sr_img, edge_map], axis=-1))
        gate = nn.sigmoid(nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                                  name="edge_gate_2")(_gelu(g)))

        enhanced = sr_img + gate * edge_strength * edge_map
        return jnp.clip(enhanced, 0.0, 1.0)
