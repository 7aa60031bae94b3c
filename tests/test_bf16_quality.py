"""bf16 expert mode: quantify the PSNR cost vs fp32 on a small model.

The pipeline's expert_dtype=bfloat16 option doubles MXU rate; this test
pins down that the numeric cost stays within the error budget at small
scale (the reference itself runs MambaIR under fp16 autocast, io.py:263).
"""

import jax
import jax.numpy as jnp
import numpy as np

from freqfusion_tpu.models.nafnet import NAFNetSR
from freqfusion_tpu.utils.metrics import psnr


def test_bf16_expert_outputs_close_to_fp32():
    model = NAFNetSR(upscale=4, width=16, middle_blk_num=2,
                     enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    sr32, _ = model.apply(params, x)
    params16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params)
    sr16, _ = model.apply(params16, x.astype(jnp.bfloat16))
    sr16 = sr16.astype(jnp.float32)

    # bf16 vs fp32 self-PSNR must stay far above the SR operating point
    # (~35 dB target) so the mode costs << 0.05 dB end to end.
    p = float(psnr(sr16, sr32))
    assert p > 45.0, f"bf16 deviation too large: self-PSNR {p:.1f} dB"


def test_bf16_full_pipeline_psnr_budget():
    """Full 4-expert + fusion pipeline at expert_dtype=bf16 vs fp32:
    the bench-default mode must stay within the 0.05 dB budget
    (BASELINE.md). Small expert configs, real pipeline wiring."""
    from freqfusion_tpu.models.drct import DRCT
    from freqfusion_tpu.models.grl import GRL
    from freqfusion_tpu.models.mambair import MambaIR
    from freqfusion_tpu.models.fusion.fusion_v2 import CompleteEnhancedFusionSR
    from freqfusion_tpu.models.pipeline import FreqFusionPipeline

    rng = np.random.default_rng(0)
    lr_np = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)

    models = {
        "drct": DRCT(upscale=4, embed_dim=60, num_layers=1, num_heads=6,
                     window_size=8, gc=12),
        "grl": GRL(upscale=4, embed_dim=48, depths=(2,), num_heads_w=3,
                   num_heads_s=3, window_size=8),
        "nafnet": NAFNetSR(upscale=4, width=16, middle_blk_num=2,
                           enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)),
        "mamba": MambaIR(upscale=4, embed_dim=60, depths=(2,), d_state=8,
                         scan_chunk=64),
    }
    params = {}
    for name, model in models.items():
        params[name] = model.init(jax.random.PRNGKey(hash(name) % 2**31),
                                  jnp.asarray(lr_np))
    fusion = CompleteEnhancedFusionSR(upscale=4)
    feat_ch = {"drct": 60, "grl": 48, "nafnet": 16, "mamba": 60}
    mock_imgs = {k: jnp.zeros((1, 64, 64, 3)) for k in models}
    mock_feats = {k: jnp.zeros((1, 16, 16, c)) for k, c in feat_ch.items()}
    params["fusion"] = fusion.init(jax.random.PRNGKey(9),
                                   jnp.asarray(lr_np), mock_imgs, mock_feats)

    def run(expert_dtype):
        pipe = FreqFusionPipeline(dict(params), scale=4,
                                  fusion_model=fusion,
                                  expert_dtype=expert_dtype)
        pipe.models = models              # small-config models
        pipe.FEATURE_CHANNELS = feat_ch
        pipe._jit_full = jax.jit(pipe._forward_full)
        pipe._jit_experts = jax.jit(pipe._run_experts_padded)
        pipe._jit_one = {n: jax.jit(lambda p, x, m=m: m.apply(p, x))
                         for n, m in models.items()}
        return np.asarray(pipe(jnp.asarray(lr_np)))

    sr32 = run(None)
    sr16 = run(jnp.bfloat16)
    p = float(psnr(jnp.asarray(np.clip(sr16, 0, 1)),
                   jnp.asarray(np.clip(sr32, 0, 1))))
    # self-PSNR >= 45 dB ==> well under 0.05 dB end-to-end at the ~35 dB
    # operating point
    assert p > 45.0, f"bf16 pipeline deviation too large: {p:.1f} dB"


def test_bf16_fusion_dtype_psnr_budget():
    """fusion_dtype=bf16 (the bench default once the fusion net was
    measured at 465 ms/img fp32 — no longer negligible) must stay within
    the same self-PSNR budget vs the fp32 fusion."""
    from freqfusion_tpu.models.fusion.fusion_v2 import CompleteEnhancedFusionSR
    from freqfusion_tpu.models.pipeline import FreqFusionPipeline

    rng = np.random.default_rng(1)
    lr_np = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    feat_ch = {"drct": 60, "grl": 48, "nafnet": 16, "mamba": 60}
    fusion = CompleteEnhancedFusionSR(upscale=4)
    imgs = {k: jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3))
                           .astype(np.float32)) for k in feat_ch}
    feats = {k: jnp.asarray(rng.normal(size=(1, 16, 16, c))
                            .astype(np.float32)) for k, c in feat_ch.items()}
    variables = fusion.init(jax.random.PRNGKey(3), jnp.asarray(lr_np),
                            imgs, feats)

    sr32 = np.asarray(fusion.apply(variables, jnp.asarray(lr_np), imgs,
                                   feats))
    v16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
    sr16 = np.asarray(fusion.apply(
        v16, jnp.asarray(lr_np).astype(jnp.bfloat16),
        {k: v.astype(jnp.bfloat16) for k, v in imgs.items()},
        {k: v.astype(jnp.bfloat16) for k, v in feats.items()}
    ).astype(jnp.float32))

    from freqfusion_tpu.utils.metrics import psnr
    p = float(psnr(jnp.asarray(np.clip(sr16, 0, 1)),
                   jnp.asarray(np.clip(sr32, 0, 1))))
    assert p > 45.0, f"bf16 fusion deviation too large: {p:.1f} dB"
