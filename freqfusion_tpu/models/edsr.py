"""EDSR-L legacy expert, TPU-native (NHWC flax).

Re-design of src/models/edsr/edsr_arch.py: 32 ResBlocks x 256 features,
res_scale 0.1, img_range 255 (the official BasicSR weights are trained at
255 scale — edsr_arch.py:66-72), pixel-shuffle x4. Part of the legacy v1
expert roster (fusion_network.py:420 naming); kept for inventory parity.
Returns (sr, conv_after_body feature) like the other experts.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.pixel_shuffle import pixel_shuffle

__all__ = ["EDSR"]

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


class ResBlock(nn.Module):
    num_feat: int = 256
    res_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(x)
        h = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(nn.relu(h))
        return x + h * self.res_scale


class EDSR(nn.Module):
    num_feat: int = 256
    num_block: int = 32
    upscale: int = 4
    res_scale: float = 0.1
    img_range: float = 255.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(_RGB_MEAN).reshape(1, 1, 1, 3).astype(x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_first")(x)
        res = feat
        for i in range(self.num_block):
            res = ResBlock(self.num_feat, self.res_scale,
                           name=f"body_{i}")(res)
        res = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv_after_body")(res)
        feature = res  # hook target (edsr_arch.py:95-96)
        res = res + feat

        up = res
        for s in range(int(np.log2(self.upscale))):
            up = nn.Conv(4 * self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                         name=f"upsample_{2 * s}")(up)
            up = pixel_shuffle(up, 2)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), name="conv_last")(up)

        out = out / self.img_range + mean
        return out, feature
