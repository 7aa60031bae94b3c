"""Local (relay-free) TPU AOT compile checks for the Pallas kernels.

libtpu can lower Mosaic kernels against a deviceless v5e topology (see
CLAUDE.md "Local AOT compile without the relay"), so kernel compile
health is checkable even during relay outages. Execution is impossible —
this validates compile + VMEM budgets only.

Usage: run with the env set BEFORE jax import (the script re-execs
itself with the right env if needed):

    python scripts/aot_check.py [scan_rev] [grl_qkv] [all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ENV = {
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "TPU_ACCELERATOR_TYPE": "v5litepod-4",
    "TPU_WORKER_HOSTNAMES": "localhost",
}

if any(os.environ.get(k) != v for k, v in _ENV.items()):
    env = dict(os.environ, **_ENV)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def _tpu_sharding():
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    import numpy as np
    mesh = Mesh(np.asarray(topo.devices).reshape(-1), ("d",))
    return NamedSharding(mesh, P())


def _aot(fn, *shapes_dtypes, **static):
    sh = _tpu_sharding()
    args = [jax.ShapeDtypeStruct(s, d, sharding=sh) for s, d in shapes_dtypes]
    import functools
    f = functools.partial(fn, **static) if static else fn
    jax.jit(f).lower(*args).compile()


def check_scan_rev():
    """v5 + v6 chain scans, reverse=True, MULTI-chunk full geometry
    (T=512 -> wc=128, 4 chunks at Dp=384, N=16 fp32) — the exact route
    the reverse-carry fix (ADVICE r3 high) changed."""
    from freqfusion_tpu.ops.selective_scan import (
        selective_scan_pallas_chain, selective_scan_pallas_chain_proj)
    b, t, r, d, n, dtr = 1, 512, 8, 384, 16, 12
    for rev in (False, True):
        _aot(selective_scan_pallas_chain,
             ((b, t, r, d), jnp.float32), ((b, t, r, d), jnp.float32),
             ((d, n), jnp.float32), ((b, t, r, n), jnp.float32),
             ((b, t, r, n), jnp.float32), ((d,), jnp.float32),
             ((d,), jnp.float32), reverse=rev)
        print(f"scan v5 reverse={rev}: compile OK")
        _aot(selective_scan_pallas_chain_proj,
             ((b, t, r, d), jnp.float32),
             ((dtr + 2 * n, d), jnp.float32), ((d, dtr), jnp.float32),
             ((d, n), jnp.float32), ((d,), jnp.float32),
             ((d,), jnp.float32), reverse=rev)
        print(f"scan v6 reverse={rev}: compile OK")


def check_grl_qkv():
    """GRL-B full-geometry qkv-in-kernel route with the corrected VMEM
    picker (_pick_wpb_grl_qkv), shifted (x_rolled+mask) and plain."""
    from freqfusion_tpu.ops.pallas_attention import (
        fused_grl_mixed_attention_qkv_nhwc)
    b, hh, ww, c = 1, 256, 256, 180
    nhw = nhs = 6
    ws, df = 16, 2
    c2 = c // 2
    n, na = ws * ws, (ws // df) ** 2
    nw = (hh // ws) * (ww // ws)
    dt = jnp.bfloat16
    common = [((b, hh, ww, c), dt)]
    anchor = ((b, hh // df, ww // df, c2), dt)
    wq = ((c, 6 * c2), dt)
    bq = ((6 * c2,), dt)
    scales = [((nhw, 1, 1), jnp.float32)] * 3
    biases = [((nhw, n, n), jnp.float32), ((nhs, na, n), jnp.float32),
              ((nhs, n, na), jnp.float32)]
    _aot(fused_grl_mixed_attention_qkv_nhwc,
         *common, common[0], anchor, wq, bq, *scales, *biases,
         ((nw, n, n), jnp.float32),
         num_heads_w=nhw, num_heads_s=nhs, window_size=ws, down_factor=df)
    print("grl qkv shifted: compile OK")

    def plain(x, a, w, bb, s1, s2, s3, b1, b2, b3):
        return fused_grl_mixed_attention_qkv_nhwc(
            x, None, a, w, bb, s1, s2, s3, b1, b2, b3, None,
            num_heads_w=nhw, num_heads_s=nhs, window_size=ws,
            down_factor=df)
    _aot(plain, *common, anchor, wq, bq, *scales, *biases)
    print("grl qkv plain: compile OK")


def check_nafblock():
    """Whole-NAFBlock fused kernel (ops/pallas_nafblock.py) at the real
    UNet level geometries of the 336x512 bench image (HR 1344x2048):
    full-res C=64 (the traffic-dominant encoder/decoder blocks) and the
    C=1024 middle blocks (weight-heavy: ~10 MB resident)."""
    from freqfusion_tpu.ops.pallas_nafblock import nafblock_fused
    sh = _tpu_sharding()
    dt = jnp.bfloat16

    def struct(*shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    for h, w, c in ((1344, 2048, 64), (336, 512, 256), (84, 128, 1024)):
        wtree = {
            "norm1": {"scale": struct(c), "bias": struct(c)},
            "conv1": {"kernel": struct(1, 1, c, 2 * c),
                      "bias": struct(2 * c)},
            "conv2": {"kernel": struct(3, 3, 1, 2 * c),
                      "bias": struct(2 * c)},
            "sca": {"kernel": struct(1, 1, c, c), "bias": struct(c)},
            "conv3": {"kernel": struct(1, 1, c, c), "bias": struct(c)},
            "beta": struct(c),
            "norm2": {"scale": struct(c), "bias": struct(c)},
            "conv4": {"kernel": struct(1, 1, c, 2 * c),
                      "bias": struct(2 * c)},
            "conv5": {"kernel": struct(1, 1, c, c), "bias": struct(c)},
            "gamma": struct(c),
        }
        jax.jit(nafblock_fused).lower(struct(1, h, w, c), wtree).compile()
        print(f"nafblock fused {h}x{w} C={c}: compile OK")


def check_mlp():
    """Fused FFN kernel at the bench-geometry token counts: DRCT ratio-4
    (244->976, the largest hidden), DRCT ratio-1 (308->308) and GRL
    post-norm ratio-2 (180->360), all at 336x512 pixels bf16."""
    from freqfusion_tpu.ops.pallas_mlp import fused_mlp_block
    m = 336 * 512
    dt = jnp.bfloat16
    for c, ch, pre in ((244, 976, True), (308, 308, True),
                       (180, 360, False)):
        _aot(fused_mlp_block,
             ((1, m, c), dt), ((c, ch), dt), ((ch,), dt), ((ch, c), dt),
             ((c,), dt), ((c,), jnp.float32), ((c,), jnp.float32),
             prenorm=pre, res_scale=1.0)
        print(f"mlp fused C={c} hidden={ch} prenorm={pre}: compile OK")


def check_cab():
    """Fused CAB kernel at the bench geometry: GRL (180->45, branch
    only) and MambaIR (180->60, LN+skip folded), 336x512 bf16."""
    from freqfusion_tpu.ops.pallas_cab import cab_fused
    sh = _tpu_sharding()
    dt = jnp.bfloat16

    def struct(*shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    for c, cr, sq, fold in ((180, 4, 18, False), (180, 3, 30, True)):
        ccr, csq = c // cr, c // sq
        w = {"cab_0": {"kernel": struct(3, 3, c, ccr),
                       "bias": struct(ccr)},
             "cab_2": {"kernel": struct(3, 3, ccr, c), "bias": struct(c)},
             "ca_1": {"kernel": struct(1, 1, c, csq), "bias": struct(csq)},
             "ca_3": {"kernel": struct(1, 1, csq, c), "bias": struct(c)}}
        ln = ({"scale": struct(c, d=jnp.float32),
               "bias": struct(c, d=jnp.float32)} if fold else None)
        sk = struct(c, d=jnp.float32) if fold else None
        jax.jit(cab_fused).lower(struct(1, 336, 512, c), w, ln,
                                 sk).compile()
        print(f"cab fused C={c} ccr={ccr} fold={fold}: compile OK")


def check_hier():
    """Fused hierarchical stage-3 kernel at the full-HR bench geometry
    (1344x2048, 76 = 64 + 4*3 input channels), bf16."""
    from freqfusion_tpu.ops.pallas_hier import hier_stage3_fused
    sh = _tpu_sharding()
    dt = jnp.bfloat16

    def struct(*shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    def c3(cin, cout, bias=True):
        out = {"kernel": struct(3, 3, cin, cout)}
        if bias:
            out["bias"] = struct(cout)
        return out

    p = {
        "stage3_conv_0": c3(76, 64),
        "stage3_conv_2": c3(64, 32),
        "stage3_gate": {"gate_0": {"kernel": struct(1, 1, 32, 8),
                                   "bias": struct(8)},
                        "gate_2": {"kernel": struct(1, 1, 8, 1),
                                   "bias": struct(1)}},
        "stage3_res": {"block_0": c3(32, 32, bias=False),
                       "block_2": c3(32, 32, bias=False),
                       "scale": struct(d=jnp.float32)},
        "rw23": struct(d=jnp.float32),
        "to_rgb_0": c3(32, 16),
        "to_rgb_2": c3(16, 3),
    }
    jax.jit(hier_stage3_fused).lower(struct(1, 1344, 2048, 76),
                                     p).compile()
    print("hier stage3 fused 1344x2048x76: compile OK")


def check_edge():
    """Fused edge-refine + fuse/gate kernels at the full-HR bench
    geometry (1344x2048 plus the HR/2 and HR/4 pyramid levels), bf16."""
    from freqfusion_tpu.ops.pallas_edge import (edge_fuse_fused,
                                                edge_refine_fused)
    sh = _tpu_sharding()
    dt = jnp.bfloat16

    def struct(*shape, d=dt):
        return jax.ShapeDtypeStruct(shape, d, sharding=sh)

    def c3(cin, cout):
        return {"kernel": struct(3, 3, cin, cout), "bias": struct(cout)}

    def c1(cin, cout):
        return {"kernel": struct(1, 1, cin, cout), "bias": struct(cout)}

    pr = {"proj": c1(3, 32), "conv1": c3(3, 32), "conv2": c3(32, 32),
          "conv3": c3(32, 32), "attn_0": c1(32, 8), "attn_2": c3(8, 1)}
    for h, w in ((1344, 2048), (672, 1024), (336, 512)):
        jax.jit(edge_refine_fused).lower(struct(1, h, w, 3), pr).compile()
        print(f"edge refine fused {h}x{w}: compile OK")
    pf = {"fusion_0": c3(96, 32), "fusion_2": c3(32, 3),
          "edge_gate_0": c3(6, 16), "edge_gate_2": c3(16, 1)}
    jax.jit(edge_fuse_fused).lower(
        struct(1, 1344, 2048, 3), struct(1, 1344, 2048, 32),
        struct(1, 1344, 2048, 32), struct(1, 1344, 2048, 32),
        struct(3, d=jnp.float32), struct(d=jnp.float32), pf).compile()
    print("edge fuse fused 1344x2048: compile OK")


def check_token_attn():
    """Fused per-pixel token MHA (ops/pallas_token_attention.py,
    transposed [T, E, pb] formulation after the relay's reshape
    rejection, MEASURE_r5f [F3]) at both fusion-net geometries."""
    from freqfusion_tpu.ops.pallas_token_attention import (
        fused_token_attention)
    dt = jnp.bfloat16
    for p, t, e, nh in ((86016, 9, 64, 4), (86016, 4, 128, 8)):
        _aot(fused_token_attention,
             ((p, t, e), dt), ((e, 3 * e), dt), ((3 * e,), dt),
             ((e, e), dt), ((e,), dt), num_heads=nh)
        print(f"token attn P={p} T={t} E={e} nh={nh}: compile OK")


CHECKS = {"scan_rev": check_scan_rev, "grl_qkv": check_grl_qkv,
          "nafblock": check_nafblock, "mlp": check_mlp,
          "cab": check_cab, "hier": check_hier, "edge": check_edge,
          "token_attn": check_token_attn}

if __name__ == "__main__":
    names = sys.argv[1:] or ["all"]
    if "all" in names:
        names = list(CHECKS)
    for nm in names:
        CHECKS[nm]()
    print("ALL AOT CHECKS PASSED")
