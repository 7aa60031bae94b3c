"""Param-only stand-in modules for fused-kernel routes.

A fused Pallas kernel replaces a subgraph of flax submodules; these
stand-ins declare the SAME param trees (names, shapes, initializers) as
the modules they replace, so a model can hand raw params to the kernel
while converted checkpoints and random inits stay interchangeable with
the unfused route (pinned by the route-parity tests)."""

from __future__ import annotations

import flax.linen as nn

__all__ = ["LNParams", "DenseParams", "Conv1x1Params", "DWConvParams",
           "BNParams", "DWKParams",
           "MlpParams"]


class LNParams(nn.Module):
    """nn.LayerNorm's tree: {scale, bias}."""

    c: int

    @nn.compact
    def __call__(self):
        return {"scale": self.param("scale", nn.initializers.ones,
                                    (self.c,)),
                "bias": self.param("bias", nn.initializers.zeros,
                                   (self.c,))}


class DenseParams(nn.Module):
    """nn.Dense's tree: {kernel [in, out], bias [out]}."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return {"kernel": self.param("kernel",
                                     nn.initializers.lecun_normal(),
                                     (self.cin, self.cout)),
                "bias": self.param("bias", nn.initializers.zeros,
                                   (self.cout,))}


class Conv1x1Params(nn.Module):
    """Conv1x1/nn.Conv(k=1) tree: {kernel [1,1,in,out], bias [out]}
    (bias omitted when use_bias=False, matching Conv1x1's tree)."""

    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        out = {"kernel": self.param("kernel",
                                    nn.initializers.lecun_normal(),
                                    (1, 1, self.cin, self.cout))}
        if self.use_bias:
            out["bias"] = self.param("bias", nn.initializers.zeros,
                                     (self.cout,))
        return out


class DWConvParams(nn.Module):
    """Depthwise nn.Conv(3x3, groups=C) tree: {kernel [3,3,1,C], bias}."""

    c: int

    @nn.compact
    def __call__(self):
        return {"kernel": self.param("kernel",
                                     nn.initializers.lecun_normal(),
                                     (3, 3, 1, self.c)),
                "bias": self.param("bias", nn.initializers.zeros,
                                   (self.c,))}


class Conv3x3Params(nn.Module):
    """nn.Conv(3x3) tree: {kernel [3,3,in,out], bias [out]} (bias row
    omitted when use_bias=False, matching nn.Conv's tree)."""

    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        out = {"kernel": self.param("kernel",
                                    nn.initializers.lecun_normal(),
                                    (3, 3, self.cin, self.cout))}
        if self.use_bias:
            out["bias"] = self.param("bias", nn.initializers.zeros,
                                     (self.cout,))
        return out


class CABParams(nn.Module):
    """GRL/MambaIR CAB subtree: cab_0/cab_2 3x3 convs + ca_1/ca_3 1x1
    squeeze (models/grl.py CAB, models/mambair.py CAB)."""

    dim: int
    compress: int
    squeeze: int

    @nn.compact
    def __call__(self):
        d, cr, sq = self.dim, self.compress, self.squeeze
        return {
            "cab_0": Conv3x3Params(d, d // cr, name="cab_0")(),
            "cab_2": Conv3x3Params(d // cr, d, name="cab_2")(),
            "ca_1": Conv1x1Params(d, d // sq, name="ca_1")(),
            "ca_3": Conv1x1Params(d // sq, d, name="ca_3")(),
        }


class MlpParams(nn.Module):
    """DRCT/HAT Mlp submodule tree: {fc1: Dense, fc2: Dense}."""

    cin: int
    hidden: int

    @nn.compact
    def __call__(self):
        return {"fc1": DenseParams(self.cin, self.hidden, name="fc1")(),
                "fc2": DenseParams(self.hidden, self.cin, name="fc2")()}


class BNParams(nn.Module):
    """nn.BatchNorm's trees, merged into one dict: params {scale, bias}
    + batch_stats {mean, var} (same names/shapes/initializers)."""

    c: int

    @nn.compact
    def __call__(self):
        import jax.numpy as jnp
        return {
            "scale": self.param("scale", nn.initializers.ones, (self.c,)),
            "bias": self.param("bias", nn.initializers.zeros, (self.c,)),
            "mean": self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.c,))).value,
            "var": self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.c,))).value,
        }


class DWKParams(nn.Module):
    """Depthwise nn.Conv(kh x kw, groups=C, no bias) tree:
    {kernel [kh, kw, 1, C]}."""

    kh: int
    kw: int
    c: int

    @nn.compact
    def __call__(self):
        return {"kernel": self.param("kernel",
                                     nn.initializers.lecun_normal(),
                                     (self.kh, self.kw, 1, self.c))}
