"""Phase 5a: hierarchical multi-resolution fusion (HR/4 -> HR/2 -> HR).

Re-design of src/models/hierarchical_fusion.py:67-201. Each stage is
conv -> spatial gate -> residual block over the concatenated expert RGBs;
learnable cross-stage residual weights start at 0.2. Resolution levels are
derived from the incoming HR size (aspect-ratio preserving).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_bilinear
from ...ops.conv1x1 import Conv1x1

__all__ = ["SpatialGate", "FusionResBlock", "HierarchicalMultiResolutionFusion"]

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU()'s default, which every fusion
    module in the reference uses (e.g. edge_enhancement.py, 17 sites)."""
    return nn.gelu(x, approximate=False)



class SpatialGate(nn.Module):
    """Per-pixel importance gate: channel squeeze -> sigmoid map."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = Conv1x1(c // 4, name="gate_0")(x)
        g = Conv1x1(1, name="gate_2")(_gelu(g))
        return x * nn.sigmoid(g)


class FusionResBlock(nn.Module):
    """conv-GELU-conv with a 0.1-init learnable residual scale."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", lambda rng: jnp.asarray(0.1, jnp.float32))
        h = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="block_0")(x)
        h = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="block_2")(_gelu(h))
        return x + scale * h


def _conv_gelu_pair(x, c1, c2, name):
    x = nn.Conv(c1, (3, 3), padding=((1, 1), (1, 1)), name=f"{name}_0")(x)
    x = nn.Conv(c2, (3, 3), padding=((1, 1), (1, 1)), name=f"{name}_2")(_gelu(x))
    return _gelu(x)


class HierarchicalMultiResolutionFusion(nn.Module):
    num_experts: int = 4
    base_channels: int = 128

    @nn.compact
    def __call__(self, expert_outputs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        bc = self.base_channels
        stack = jnp.concatenate(list(expert_outputs.values()), axis=-1)
        _, h_hr, w_hr, _ = stack.shape
        h1, w1 = max(h_hr // 4, 1), max(w_hr // 4, 1)
        h2, w2 = max(h_hr // 2, 1), max(w_hr // 2, 1)

        rw12 = self.param("residual_weight_1_2",
                          lambda rng: jnp.asarray(0.2, jnp.float32))
        rw23 = self.param("residual_weight_2_3",
                          lambda rng: jnp.asarray(0.2, jnp.float32))

        # Stage 1 — coarse
        s1_in = resize_bilinear(stack, h1, w1)
        f1 = _conv_gelu_pair(s1_in, bc, bc, "stage1_conv")
        f1 = SpatialGate(name="stage1_gate")(f1)
        f1 = FusionResBlock(name="stage1_res")(f1)

        # Stage 2 — mid
        f1_up = resize_bilinear(f1, h2, w2)
        s2_in = jnp.concatenate([f1_up, resize_bilinear(stack, h2, w2)], axis=-1)
        f2 = _conv_gelu_pair(s2_in, bc, bc, "stage2_conv")
        f2 = SpatialGate(name="stage2_gate")(f2)
        f2 = FusionResBlock(name="stage2_res")(f2)
        f2 = f2 + rw12 * f1_up

        # Stage 3 — full HR
        f2_up = resize_bilinear(f2, h_hr, w_hr)
        s3_in = jnp.concatenate([f2_up, stack], axis=-1)

        import os

        from ...ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_HIER") == "1" and use_pallas():
            # whole HR stage (6 convs + gate + residuals + to_rgb) in ONE
            # halo-6 pass (ops/pallas_hier.py). EVAL-ONLY: no VJP — the
            # flag is for the inference bench path, never training.
            from ..param_decl import Conv1x1Params, Conv3x3Params
            from ...ops.pallas_hier import hier_stage3_fused

            class _GateP(nn.Module):
                c: int

                @nn.compact
                def __call__(self):
                    return {"gate_0": Conv1x1Params(
                                self.c, self.c // 4, name="gate_0")(),
                            "gate_2": Conv1x1Params(
                                self.c // 4, 1, name="gate_2")()}

            class _ResP(nn.Module):
                c: int

                @nn.compact
                def __call__(self):
                    return {
                        "block_0": Conv3x3Params(self.c, self.c,
                                                 use_bias=False,
                                                 name="block_0")(),
                        "block_2": Conv3x3Params(self.c, self.c,
                                                 use_bias=False,
                                                 name="block_2")(),
                        "scale": self.param(
                            "scale",
                            lambda rng: jnp.asarray(0.1, jnp.float32)),
                    }

            cin3 = s3_in.shape[-1]
            p = {
                "stage3_conv_0": Conv3x3Params(cin3, bc,
                                               name="stage3_conv_0")(),
                "stage3_conv_2": Conv3x3Params(bc, bc // 2,
                                               name="stage3_conv_2")(),
                "stage3_gate": _GateP(bc // 2, name="stage3_gate")(),
                "stage3_res": _ResP(bc // 2, name="stage3_res")(),
                "rw23": rw23,
                "to_rgb_0": Conv3x3Params(bc // 2, bc // 4,
                                          name="to_rgb_0")(),
                "to_rgb_2": Conv3x3Params(bc // 4, 3, name="to_rgb_2")(),
            }
            return hier_stage3_fused(s3_in, p)

        f3 = _conv_gelu_pair(s3_in, bc, bc // 2, "stage3_conv")
        f3 = SpatialGate(name="stage3_gate")(f3)
        f3 = FusionResBlock(name="stage3_res")(f3)
        f3 = f3 + rw23 * f2_up[..., : bc // 2]

        out = nn.Conv(bc // 4, (3, 3), padding=((1, 1), (1, 1)), name="to_rgb_0")(f3)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), name="to_rgb_2")(_gelu(out))
        return nn.sigmoid(out)
