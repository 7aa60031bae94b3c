"""Standalone hardware probes for the gated Pallas kernels.

The round-5 recovery battery's [2a]/[2d] steps (full pipeline with
FREQFUSION_NAFBLOCK etc.) hung past the 2400 s timeout and wedged the
relay. This isolates the cause: each probe runs ONE kernel (or one
matching flax-route program) on the real TPU at a production geometry
in a subprocess with its own timeout, so a hang is attributed to a
specific kernel rather than to the composed pipeline.

Usage: python scripts/probe_kernels_hw.py [nafblock mlp cab dwconv hier edge lka]
Each probe prints PASS <seconds> or HANG/FAIL.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBES = {
    # one fused NAFBlock at the enc0 bench geometry (the heaviest level)
    "nafblock": """
import jax, jax.numpy as jnp, numpy as np
from freqfusion_tpu.models.nafnet import NAFBlock
import os; os.environ["FREQFUSION_NAFBLOCK"] = "1"
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 64)).astype(np.float32)).astype(jnp.bfloat16)
m = NAFBlock(64)
v = m.init(jax.random.PRNGKey(0), x)
out = m.apply(v, x)
print("sum", float(jnp.sum(out.astype(jnp.float32))))
""",
    "mlp": """
import jax, jax.numpy as jnp, numpy as np
from freqfusion_tpu.ops.pallas_mlp import fused_mlp_block
rng = np.random.default_rng(0)
c, ch = 180, 360
x = jnp.asarray(rng.normal(0, 1, (4096, 256, c)).astype(np.float32)).astype(jnp.bfloat16)
a = lambda *s: jnp.asarray(rng.normal(0, 0.02, s).astype(np.float32)).astype(jnp.bfloat16)
y = fused_mlp_block(x, a(c, ch), a(ch), a(ch, c), a(c), a(c), a(c))
print("sum", float(jnp.sum(y.astype(jnp.float32))))
""",
    "dwconv": """
import jax, jax.numpy as jnp, numpy as np
from freqfusion_tpu.ops.pallas_dwconv import dwconv3x3_pallas
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 64)).astype(np.float32))
w = jnp.asarray(rng.normal(0, 1, (3, 3, 1, 64)).astype(np.float32))
y = dwconv3x3_pallas(x, w, jnp.zeros((64,), jnp.float32))
print("sum", float(jnp.sum(y)))
""",
    "cab": """
import os; os.environ["FREQFUSION_CAB"] = "1"
import jax, jax.numpy as jnp, numpy as np
from freqfusion_tpu.models.grl import CAB
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 180)).astype(np.float32)).astype(jnp.bfloat16)
m = CAB(180)
v = m.init(jax.random.PRNGKey(0), x)
out = m.apply(v, x)
print("sum", float(jnp.sum(out.astype(jnp.float32))))
""",
    "hier": """
import jax, jax.numpy as jnp, numpy as np
import os; os.environ["FREQFUSION_HIER"] = "1"; os.environ["FREQFUSION_PALLAS"] = "1"
from freqfusion_tpu.models.fusion.hierarchical import HierarchicalMultiResolutionFusion
rng = np.random.default_rng(0)
imgs = {k: jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32))
        for k in ("drct", "grl", "nafnet", "mamba")}
m = HierarchicalMultiResolutionFusion(num_experts=4, base_channels=64)
v = m.init(jax.random.PRNGKey(0), imgs)
out = m.apply(v, imgs)
print("sum", float(jnp.sum(out)))
""",
    "edge": """
import jax, jax.numpy as jnp, numpy as np
import os; os.environ["FREQFUSION_EDGE"] = "1"; os.environ["FREQFUSION_PALLAS"] = "1"
from freqfusion_tpu.models.fusion.edge import LaplacianPyramidRefinement
rng = np.random.default_rng(0)
sr = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32))
m = LaplacianPyramidRefinement(num_levels=3, channels=32)
v = m.init(jax.random.PRNGKey(0), sr)
out = m.apply(v, sr)
print("sum", float(jnp.sum(out)))
""",
    "token_attn": """
import jax, jax.numpy as jnp, numpy as np
from freqfusion_tpu.ops.pallas_token_attention import fused_token_attention
rng = np.random.default_rng(0)
p, t, e, nh = 86016, 9, 64, 4
x = jnp.asarray(rng.normal(0, 1, (p, t, e)).astype(np.float32)).astype(jnp.bfloat16)
a = lambda *s: jnp.asarray(rng.normal(0, 0.02, s).astype(np.float32)).astype(jnp.bfloat16)
y = fused_token_attention(x, a(e, 3 * e), a(3 * e), a(e, e), a(e), num_heads=nh)
print("sum", float(jnp.sum(y.astype(jnp.float32))))
""",
    "lka": """
import jax, jax.numpy as jnp, numpy as np
import os; os.environ["FREQFUSION_LKA"] = "1"; os.environ["FREQFUSION_PALLAS"] = "1"
from freqfusion_tpu.models.fusion.lka import LKABlock
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (1, 336, 512, 64)).astype(np.float32))
m = LKABlock(kernel_size=21)
v = m.init(jax.random.PRNGKey(0), x)
out = m.apply(v, x)
print("sum", float(jnp.sum(out)))
""",
}


def run(name, timeout=420):
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", PROBES[name]],
                           timeout=timeout, capture_output=True,
                           text=True, cwd=REPO)
        dt = time.time() - t0
        if r.returncode == 0:
            print(f"{name}: PASS {dt:.1f}s  ({r.stdout.strip().splitlines()[-1]})")
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-6:]
            print(f"{name}: FAIL {dt:.1f}s")
            for ln in tail:
                print(f"    {ln}")
    except subprocess.TimeoutExpired:
        print(f"{name}: HANG >{timeout}s")


if __name__ == "__main__":
    names = sys.argv[1:] or ["nafblock", "dwconv", "hier", "edge", "lka"]
    for nm in names:
        run(nm)
