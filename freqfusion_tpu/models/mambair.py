"""MambaIR expert: state-space SR model, TPU-native.

Re-design of the reference (src/models/mambair/mambair_arch.py): 6 RSSGs x
6 VSSBlocks; each VSSBlock = LN -> SS2D 2-D selective scan + CAB conv
branch with learnable skip scales (:391-422). SS2D: in_proj -> depthwise
conv -> 4-directional scan (row-major, column-major, and both reversed,
forward_core :339-369) through the selective-scan recurrence (d_state 16,
expand 2, dt_rank ceil(d/16)), out-LN x SiLU(z) gate. Config from the
submission loader (models/team29_FreqFusionSR/io.py:156-163): embed 180,
depths (6,)*6, mlp_ratio 2.0, pixelshuffle x4.

The CUDA ``selective_scan_fn`` — the reference's one hard native
dependency, which doesn't even build on every machine (remote-only
Decoupled Compute, configs/train_config.yaml:53-56) — is replaced by the
Pallas kernels in ops/selective_scan.py. On TPU the 4 directions run
spatial-direct: row/column sequences are read straight from the NHWC
tensor (columns via its one transpose) and the reversed directions
execute a backward recurrence in-kernel, so no flipped or re-laid-out
sequence is ever materialized. The XLA fallback path uses the plain
layout transforms (transpose/flip) around the chunked associative scan.

Frozen inference expert: no dropout / drop-path. Returns
(sr, conv_after_body feature) — the hook target at io.py:172-176.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.pooling import global_avg_pool
from ..ops.selective_scan import selective_scan

__all__ = ["SS2D", "VSSBlock", "MambaIR"]

_RGB_MEAN = np.array([0.4488, 0.4371, 0.4040], np.float32)


class _SplitProj(nn.Module):
    """in_proj as two half-width matmuls from one shared kernel — same
    params/state-dict layout as Dense(2*d_inner), but the [.., 2*D] xz
    tensor is never materialized (its split cost ~15 ms/img in the
    round-3 trace). ``pad_x`` zero-pads the x-half's OUTPUT columns so xc
    is born lane-aligned for the chain scan kernels (no pad op on the
    [B, H, W, D] activation)."""

    features: int
    pad_x: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (x.shape[-1], self.features))
        half = self.features // 2
        kx = kern[:, :half]
        if self.pad_x:
            kx = jnp.pad(kx, [(0, 0), (0, self.pad_x)])
        return x @ kx, x @ kern[:, half:]


class _DWConv(nn.Module):
    """Depthwise conv with the nn.Conv param layout ('kernel'/'bias'),
    zero-padded at APPLY time to ``pad_c`` extra channels (zero taps keep
    the padded channels exactly zero through silu)."""

    d_inner: int
    d_conv: int
    pad_c: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.d_conv, self.d_conv, 1, self.d_inner))
        bias = self.param("bias", nn.initializers.zeros, (self.d_inner,))
        if self.pad_c:
            kern = jnp.pad(kern, [(0, 0)] * 3 + [(0, self.pad_c)])
            bias = jnp.pad(bias, [(0, self.pad_c)])
        import os

        from ..ops.dispatch import use_pallas
        if (self.d_conv == 3 and use_pallas()
                and os.environ.get("FREQFUSION_DWCONV") == "1"):
            from ..ops.pallas_dwconv import dwconv3x3_pallas
            return dwconv3x3_pallas(x, kern.astype(x.dtype), bias)
        pad = (self.d_conv - 1) // 2
        return jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.d_inner + self.pad_c) + bias.astype(
                x.dtype)


class SS2D(nn.Module):
    """2-D selective scan block (mambair_arch.py:209-388)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: float = 2.0
    scan_chunk: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        l = h * w
        d_inner = int(self.expand * self.d_model)
        dt_rank = math.ceil(self.d_model / 16)
        n = self.d_state
        k = 4

        import os

        from ..ops.dispatch import use_pallas
        pallas = use_pallas()
        spatial_ok = pallas and h % 8 == 0 and w % 8 == 0
        impl = os.environ.get("FREQFUSION_SCAN", "chain")
        chain = spatial_ok and impl in ("chain", "chainproj", "chainv5")
        # v6/v7 (default "chain"): silu + the dt/B/C projections happen
        # INSIDE the scan kernels — the 132 MB activation is read once
        # per pass instead of once per projection einsum, and dt/B/C
        # never round-trip through HBM (~170 ms/img of XLA passes in the
        # round-3 trace). The default further uses the v7 single-dispatch
        # kernel (whole 8-chain group resident in VMEM, one prologue,
        # homogeneous correction pass) when the strips fit VMEM;
        # "chainproj" pins the v6 three-dispatch route, "chainv5" the
        # explicit-projection route.
        proj_in_kernel = chain and impl in ("chain", "chainproj")
        spatial = spatial_ok and not chain
        dp = -(-d_inner // 128) * 128 if chain else d_inner
        pad_d = dp - d_inner

        # With the chain kernels, xc is born 384-wide straight from the
        # projection + depthwise conv (weights padded at apply time) —
        # zero pad ops on activations anywhere in the scan path.
        xc, z = _SplitProj(d_inner * 2, pad_x=pad_d, name="in_proj")(x)
        xc = _DWConv(d_inner, self.d_conv, pad_c=pad_d, name="conv2d")(xc)
        if not proj_in_kernel:
            xc = nn.silu(xc)                       # [B, H, W, Dp]

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.normal(0.02),
            (k, dt_rank + 2 * n, d_inner))
        dt_projs_weight = self.param(
            "dt_projs_weight", nn.initializers.normal(0.02),
            (k, d_inner, dt_rank))
        dt_projs_bias = self.param(
            "dt_projs_bias", nn.initializers.zeros, (k, d_inner))
        A_logs = self.param(
            "A_logs",
            lambda rng: jnp.tile(
                jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))[None],
                (k * d_inner, 1)),
            )
        Ds = self.param("Ds", nn.initializers.ones, (k * d_inner,))

        A = -jnp.exp(A_logs.astype(jnp.float32)).reshape(k, d_inner, n)
        Dsk = Ds.astype(jnp.float32).reshape(k, d_inner)

        if not chain:
            # Direction layouts over [B, L, D] (forward_core :339-369):
            # 0: row-major; 1: column-major; 2/3: their reversals.
            x_row = xc.reshape(b, l, d_inner)
            x_col = xc.transpose(0, 2, 1, 3).reshape(b, l, d_inner)
            dirs = (x_row, x_col, x_row[:, ::-1], x_col[:, ::-1])

        if chain:
            # Chain-parallel kernels (v5): each direction scans 8
            # consecutive chains (image rows / columns) in the sublanes
            # with a serial time walk — no in-group Hillis-Steele at all.
            # The T-major layouts the kernels want are exactly the two
            # layouts SS2D already has: row directions read the [B, W, H,
            # D] transpose, column directions read the NHWC tensor
            # itself, so no extra layout copies appear. D is padded 360 ->
            # 384 so every per-state slice op in-kernel is lane-aligned
            # (the padded channels have A=D=bias=0 and contribute exactly
            # zero). Exactness across chain boundaries comes from the
            # summary pass + O(rows) associative scan inside the wrapper.
            from ..ops.selective_scan import (
                chain_fused_fits, selective_scan_pallas_chain,
                selective_scan_pallas_chain_fused,
                selective_scan_pallas_chain_proj)

            # VERDICT-r2 item 9: approximate scan (independent per-chain
            # zero inits; skips the summary+compose passes). DEFAULT ON
            # real TPU: at converted weights its self-PSNR is 61.15 dB —
            # above the 54 dB end-to-end bf16 floor (tests/test_bf16_e2e)
            # — for -18.6% s/img standalone and 1.165 -> 1.229 MP/s
            # in-pipeline (BENCH_NOTES r5 D2/F0). Exact on CPU so parity
            # tests compare true S6 semantics; FREQFUSION_SCAN_APPROX=0/1
            # forces either way. MambaIR is a frozen expert (forward
            # only), so this never touches a gradient path.
            approx_env = os.environ.get("FREQFUSION_SCAN_APPROX")
            if approx_env is None:
                approx = jax.default_backend() != "cpu"
            else:
                approx = approx_env == "1"

            A_p = jnp.pad(A, [(0, 0), (0, pad_d), (0, 0)])
            D_p = jnp.pad(Dsk, [(0, 0), (0, pad_d)])
            bias_p = jnp.pad(dt_projs_bias.astype(jnp.float32),
                             [(0, 0), (0, pad_d)])
            xc_t = xc.transpose(0, 2, 1, 3)               # [B, W, H, D]
            pair_sums = []
            # row dirs (weights 0/2) scan T=W -> the transpose layout;
            # col dirs (weights 1/3) scan T=H -> the NHWC tensor itself
            # dt projection weights padded on the OUTPUT dim so dts comes
            # out of the matmul already 384-wide; x_proj contraction
            # weights padded on the INPUT dim to match the padded xc
            dtw_p = jnp.pad(dt_projs_weight, [(0, 0), (0, pad_d), (0, 0)])
            xpw_p = jnp.pad(x_proj_weight, [(0, 0), (0, 0), (0, pad_d)])
            for sel, x_lay in ((slice(0, None, 2), xc_t),
                               (slice(1, None, 2), xc)):
                u_p = x_lay
                y_pair = None
                # per-direction einsums (no [k, ...] stack to slice —
                # the k-axis slices cost real copies per the trace)
                t_len = x_lay.shape[1]
                # v7 only on a real TPU backend: its interpret-mode
                # emulation (manual DMA + two fori sweeps) is far slower
                # than v6's, and CPU runs are always interpret. The v7<->
                # v6 equivalence is pinned at the kernel level
                # (test_pallas_scan.py) in interpret mode.
                fused = (impl == "chain"
                         and jax.default_backend() != "cpu"
                         and chain_fused_fits(
                             t_len, dp, n, x_lay.dtype.itemsize,
                             x_lay.dtype.itemsize))
                for j, rev in enumerate((False, True)):
                    k_idx = sel.indices(4)[0] + 2 * j     # 0/2 or 1/3
                    if proj_in_kernel:
                        scan_fn = (selective_scan_pallas_chain_fused
                                   if fused else
                                   selective_scan_pallas_chain_proj)
                        y_j = scan_fn(
                            x_lay, xpw_p[k_idx], dtw_p[k_idx], A_p[k_idx],
                            D_p[k_idx], bias_p[k_idx], reverse=rev,
                            out_dtype=x_lay.dtype, approx_init=approx)
                        y_pair = y_j if y_pair is None else y_pair + y_j
                        continue
                    wk = xpw_p[k_idx]                     # [C, Dp]
                    dt_low = jnp.einsum(
                        "btrd,cd->btrc", x_lay, wk[:dt_rank],
                        preferred_element_type=jnp.float32)
                    dt_j = jnp.einsum(
                        "btrc,dc->btrd", dt_low, dtw_p[k_idx],
                        preferred_element_type=jnp.float32
                        ).astype(x_lay.dtype)
                    bs_j = jnp.einsum(
                        "btrd,cd->btrc", x_lay, wk[dt_rank: dt_rank + n],
                        preferred_element_type=jnp.float32
                        ).astype(x_lay.dtype)
                    cs_j = jnp.einsum(
                        "btrd,cd->btrc", x_lay, wk[dt_rank + n:],
                        preferred_element_type=jnp.float32
                        ).astype(x_lay.dtype)
                    y_j = selective_scan_pallas_chain(
                        u_p, dt_j, A_p[k_idx], bs_j, cs_j, D_p[k_idx],
                        bias_p[k_idx], reverse=rev, out_dtype=x_lay.dtype,
                        approx_init=approx)
                    y_pair = y_j if y_pair is None else y_pair + y_j
                pair_sums.append(y_pair[..., :d_inner])
            # pair 0 came back [B, W, H, D]; transpose once to NHWC
            y = pair_sums[1] + pair_sums[0].transpose(0, 2, 1, 3)
            ys = None
        elif spatial:
            # Spatial-direct kernels: the row-major sequence is the NHWC
            # rows in order; the column-major one is the rows of its
            # [B, W, H, D] transpose. Both forward AND backward kernels
            # read/write the natural spatial layouts (backward = suffix
            # recurrence + reversed row walk), so the only layout copy in
            # the whole 4-direction scan is the single transpose — no
            # per-direction sequence materialization, no stack, and the
            # direction sum happens spatially.
            from ..ops.selective_scan import selective_scan_pallas_spatial

            xc_t = xc.transpose(0, 2, 1, 3)               # [B, W, H, D]
            pair_sums = []
            for sel, x_sp in ((slice(0, None, 2), xc),
                              (slice(1, None, 2), xc_t)):
                # dt/B/C projected straight to their own arrays (a packed
                # x_dbl + big slices cost ~0.13 s/img of copies); outputs
                # follow the network dtype — the kernel promotes to fp32
                # internally, matching the reference's fp16-autocast
                # boundary around its CUDA scan (io.py:263)
                wsel = x_proj_weight[sel]                 # [2(fwd/bwd), C, D]
                dt_low = jnp.einsum("brtd,kcd->kbrtc", x_sp,
                                    wsel[:, :dt_rank],
                                    preferred_element_type=jnp.float32)
                dts = jnp.einsum("kbrtc,kdc->kbrtd", dt_low,
                                 dt_projs_weight[sel],
                                 preferred_element_type=jnp.float32
                                 ).astype(x_sp.dtype)
                bs = jnp.einsum("brtd,kcd->kbrtc", x_sp,
                                wsel[:, dt_rank: dt_rank + n],
                                preferred_element_type=jnp.float32
                                ).astype(x_sp.dtype)
                cs = jnp.einsum("brtd,kcd->kbrtc", x_sp,
                                wsel[:, dt_rank + n:],
                                preferred_element_type=jnp.float32
                                ).astype(x_sp.dtype)
                a_p, d_p, b_p = A[sel], Dsk[sel], dt_projs_bias[sel]
                y_pair = None
                for j, rev in enumerate((False, True)):
                    y_j = selective_scan_pallas_spatial(
                        x_sp, dts[j], a_p[j], bs[j], cs[j], d_p[j], b_p[j],
                        reverse=rev)
                    y_pair = y_j if y_pair is None else y_pair + y_j
                pair_sums.append(y_pair)
            y = pair_sums[0] + pair_sums[1].transpose(0, 2, 1, 3)
            ys = None
        elif pallas:
            # Bidirectional direction-batched kernel: dirs 2/3 run a
            # BACKWARD recurrence over the natural-order sequences, so no
            # flip is ever materialized (neither inputs nor outputs) and
            # the whole layer is two pallas dispatches. The per-direction
            # projections batch over directions on the MXU: weights
            # [4, C, D] -> [fwd/bwd, row/col, C, D] so each unflipped
            # layout feeds both its forward and backward weight sets.
            from ..ops.selective_scan import selective_scan_pallas_bidir

            xs2 = jnp.stack(dirs[:2], 0)                  # [2, B, L, D]
            w4 = x_proj_weight.reshape(2, 2, dt_rank + 2 * n, d_inner)
            x_dbl = jnp.einsum("ibld,jicd->jiblc", xs2, w4,
                               preferred_element_type=jnp.float32)
            x_dbl = x_dbl.reshape(k, b, l, dt_rank + 2 * n)
            dts = jnp.einsum("kblr,kdr->kbld", x_dbl[..., :dt_rank],
                             dt_projs_weight,
                             preferred_element_type=jnp.float32)
            y_fwd, y_bwd = selective_scan_pallas_bidir(
                xs2, dts, A, x_dbl[..., dt_rank: dt_rank + n],
                x_dbl[..., dt_rank + n:], Dsk, dt_projs_bias,
                chunk=min(self.scan_chunk, 128))
            # All four outputs already in natural order.
            ys = (y_fwd[0], y_fwd[1], y_bwd[0], y_bwd[1])
        else:
            ys = []
            for ki, xk in enumerate(dirs):
                x_dbl = jnp.einsum("bld,cd->blc", xk, x_proj_weight[ki],
                                   preferred_element_type=jnp.float32)
                dts = x_dbl[..., :dt_rank]
                bs = x_dbl[..., dt_rank : dt_rank + n]
                cs = x_dbl[..., dt_rank + n :]
                dts = jnp.einsum("blr,dr->bld", dts, dt_projs_weight[ki],
                                 preferred_element_type=jnp.float32)
                y = selective_scan(xk, dts, A[ki], bs, cs, Dsk[ki],
                                   delta_bias=dt_projs_bias[ki],
                                   delta_softplus=True,
                                   chunk=self.scan_chunk)
                ys.append(y)

        # Undo the direction layouts and sum (chain/spatial paths already
        # summed in NHWC; the bidir path needs the column transpose; the
        # XLA path additionally un-flips dirs 2/3).
        if ys is not None:
            if pallas:
                yf = ys[0] + ys[2]
                y_col = ys[1] + ys[3]
            else:
                yf = ys[0] + ys[2][:, ::-1]
                y_col = ys[1] + ys[3][:, ::-1]
            yf = yf + y_col.reshape(b, w, h, d_inner).transpose(
                0, 2, 1, 3).reshape(b, l, d_inner)
            y = yf.reshape(b, h, w, d_inner)

        # Scan state/output is fp32 (reference forces fp32 in forward_core);
        # drop back to the network compute dtype so a bf16 run stays bf16.
        y = y.astype(x.dtype)
        y = nn.LayerNorm(epsilon=1e-5, name="out_norm")(y)
        y = y * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class CAB(nn.Module):
    """Conv-GELU-conv + RCAN channel attention (mambair_arch.py:40-62;
    compress 3, squeeze 30)."""

    dim: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.dim // self.compress_ratio, (3, 3),
                    padding=((1, 1), (1, 1)), name="cab_0")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="cab_2")(y)
        a = nn.Conv(self.dim // self.squeeze_factor, (1, 1),
                    name="ca_1")(global_avg_pool(y))
        a = nn.Conv(self.dim, (1, 1), name="ca_3")(nn.relu(a))
        return y * nn.sigmoid(a)


class VSSBlock(nn.Module):
    """LN -> SS2D with skip scale; LN -> CAB with skip scale
    (mambair_arch.py:391-422)."""

    dim: int
    d_state: int = 16
    expand: float = 2.0
    scan_chunk: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skip_scale = self.param("skip_scale", nn.initializers.ones, (self.dim,))
        skip_scale2 = self.param("skip_scale2", nn.initializers.ones, (self.dim,))
        # BasicLayer passes norm_layer=nn.LayerNorm, overriding the eps=1e-6
        # partial default (mambair_arch.py:460-466) — so ln_1 eps is 1e-5.
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x * skip_scale + SS2D(self.dim, self.d_state,
                                  expand=self.expand,
                                  scan_chunk=self.scan_chunk,
                                  name="self_attention")(y)
        import os

        from ..ops.dispatch import use_pallas
        if os.environ.get("FREQFUSION_CAB") == "1" and use_pallas():
            # whole half-block fused: LN2 + CAB + skip-scale residual in
            # the two-pass CAB kernel (read x once per pass, write once)
            from ..ops.pallas_cab import cab_fused
            from .param_decl import CABParams, LNParams
            ln2 = LNParams(self.dim, name="ln_2")()
            w = CABParams(self.dim, 3, 30, name="conv_blk")()
            return cab_fused(x, w, ln=ln2, skip_scale=skip_scale2)
        y2 = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        return x * skip_scale2 + CAB(self.dim, name="conv_blk")(y2)


class ResidualGroup(nn.Module):
    """RSSG: VSSBlocks + 3x3 conv + residual (mambair_arch.py:701-766)."""

    dim: int
    depth: int
    d_state: int = 16
    expand: float = 2.0
    scan_chunk: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for j in range(self.depth):
            res = VSSBlock(self.dim, self.d_state, self.expand,
                           self.scan_chunk, name=f"blocks_{j}")(res)
        res = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv")(res)
        return res + x


class MambaIR(nn.Module):
    """MambaIR SR model; returns (sr, conv_after_body feature)."""

    upscale: int = 4
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    d_state: int = 16
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    num_feat: int = 64
    scan_chunk: int = 512
    # nn.scan over the (identical) RSSGs with stacked params; ~6x smaller
    # HLO. Use convert_mambair + stack_layers for the stacked layout.
    use_scan: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mean = jnp.asarray(_RGB_MEAN).reshape(1, 1, 1, 3).astype(x.dtype)
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_first")(x)
        t = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(feat)
        if self.use_scan:
            assert len(set(self.depths)) == 1, "scan needs equal depths"

            class _Body(nn.Module):
                dim: int
                depth: int
                d_state: int
                expand: float
                chunk: int

                @nn.compact
                def __call__(self, carry, _):
                    out = ResidualGroup(self.dim, self.depth, self.d_state,
                                        self.expand, self.chunk,
                                        name="rdg")(carry)
                    return out, None

            scanned = nn.scan(
                _Body, variable_axes={"params": 0},
                split_rngs={"params": True}, length=len(self.depths))(
                self.embed_dim, self.depths[0], self.d_state,
                self.mlp_ratio, self.scan_chunk, name="layers")
            t, _ = scanned(t, None)
        else:
            for i, depth in enumerate(self.depths):
                t = ResidualGroup(self.embed_dim, depth, self.d_state,
                                  self.mlp_ratio, self.scan_chunk,
                                  name=f"layers_{i}")(t)
        t = nn.LayerNorm(epsilon=1e-5, name="norm")(t)

        body = nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_after_body")(t)
        feature = body  # hook target (io.py:172-176)
        feat = body + feat

        up = nn.Conv(self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                     name="conv_before_upsample_0")(feat)
        up = nn.leaky_relu(up, 0.01)
        for s in range(int(np.log2(self.upscale))):
            up = nn.Conv(4 * self.num_feat, (3, 3), padding=((1, 1), (1, 1)),
                         name=f"upsample_{2 * s}")(up)
            up = pixel_shuffle(up, 2)
        out = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), name="conv_last")(up)

        out = out / self.img_range + mean
        return out, feature
