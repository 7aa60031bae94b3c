"""1x1 convolution as a dot_general, with nn.Conv's exact param layout.

On TPU, a (1, 1) nn.Conv lowers to a `convolution` HLO: XLA gives its
activations the conv-preferred {3,1,2,0} 8-row-blocked layout (inserting
full-tensor relayout copies against the {3,2,1,0} the surrounding
elementwise/matmul fusions use) and cannot fuse elementwise producers/
consumers into the conv itself — the round-3 DRCT trace shows 33 ms of
UNfused leaky_relu passes after the 1x1 `adjust` convs plus 26 ms of
layout copies, and the NAFNet trace attributes its 54 ms copy bucket to
conv-layout transitions. A 1x1 conv over NHWC is exactly a feature-axis
matmul, so expressing it as dot_general keeps the standard layout and
joins XLA's elementwise fusion world.

Param names/shapes (`kernel` [1, 1, C_in, C_out], `bias` [C_out]) match
nn.Conv bit-for-bit, so converted torch Conv2d(k=1) weights drop in
unchanged and every existing converter/parity test is untouched.
FREQFUSION_CONV1X1=conv restores the nn.Conv lowering for measurement.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

__all__ = ["Conv1x1"]


class Conv1x1(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if os.environ.get("FREQFUSION_CONV1X1") == "conv":
            x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y if bias is None else y + bias
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        y = jax.lax.dot_general(x, kernel[0, 0],
                                (((x.ndim - 1,), (0,)), ((), ())))
        return y if bias is None else y + bias
