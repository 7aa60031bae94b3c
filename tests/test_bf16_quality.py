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
