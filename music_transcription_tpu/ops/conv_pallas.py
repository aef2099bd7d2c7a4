"""Fused inference conv kernels (Pallas, TPU): conv + BN-affine + ReLU
[+ residual] [+ maxpool(2,1)] in one VMEM pass.

STATUS: numerically exact but MEASURED SLOWER than the XLA path at every
serving-shape stage (batch 16, v5e; on-device-loop timing):

    stage              XLA      this kernel
    conv1+pool       5.1 ms      13.3 ms   (C_in=1: 1-lane layouts)
    res_block1+pool 10.6 ms      12.5 ms   (C 32->64)
    res_block2       5.5 ms       8.7 ms   (C 64->128; needs f_blk=2 for VMEM)

NOT wired into the model. Kept (with tests) because the kernels are correct
and the loss is a Mosaic constraint, not a design one: 16-bit lane-offset
relayouts are unsupported, so every im2col concat/shift must detour through
fp32 (upcast + lane-concat + sublane-roll), and that VPU/relayout traffic
outweighs the MXU utilization win (K widened from C_in to 3*C_in). If a
later toolchain lifts the 16-bit relayout restriction (or adds native
windowed/im2col loads), this file is the starting point. See DESIGN.md
"Fused conv kernels" for the full experiment log.

Why it was attempted: XLA lowers the early CNNRNNLarge convs (reference
models/cnn_rnn_model.py:262-289) at 13-43% of the MXU roofline at serving
shapes — the blocks are channel-starved (C=32..64 under 128-wide K/N tiles;
per-tap contractions run the MXU at ~12.5% utilization) and every
conv/BN/relu boundary round-trips a 150-300 MB activation through HBM
(measured: conv1+pool 5.4 ms, res_block1+pool 10.7 ms, res_block2 5.9 ms at
batch 16; XLA-level reformulations — folded affines, channel padding, exact
space-to-depth — do NOT close the gap either, see DESIGN.md).

Kernel strategy (Mosaic-constrained: 16-bit lane-offset relayouts are
unsupported, so no bf16 concatenation/shifting):

- The input arrives per grid step as an overlapping halo window
  (element-indexed BlockSpec), so each block is read once and pipelined.
- The 3x3 conv contracts K = kh*C_in per matmul: the kh row-shifted slices
  (offset only in the untiled major dim — free) are upcast to fp32,
  concatenated on the lane axis (32-bit relayout — supported), and the kw
  time taps become `jnp.roll` shifts of that fp32 im2col matrix before the
  bf16 downcast feeding the MXU. K goes from C_in to 3*C_in (~12.5% ->
  38-75% MXU utilization at C=32..128) with no redundant FLOPs.
- Time is padded to a multiple of 16 (t_pad) so (f, t, c) -> (f*t, c)
  reshapes are layout-preserving collapses; roll wrap-around lands in
  columns >= t_out that every consumer slices away.
- BatchNorm inference affine + ReLU run on the fp32 accumulator; only the
  final (optionally pooled) bf16 activation is written back to HBM.

Numerics mirror the XLA inference path op-for-op: conv accumulates fp32 and
rounds (with the conv bias) to bf16 once, the BN affine and the residual add
run fp32, ReLU last, output bf16 — the same rounding points as
nn.Conv(dtype=bf16) + fp32 nn.BatchNorm (models/cnn_rnn.py ConvBNRelu /
ResidualBlock).

Inference-only (BN affine comes from running stats); training keeps the XLA
path. Single-device kernels: the sharded serving path (shard_map) runs them
per shard unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax._src.pallas.core import Element  # element-indexed (halo) block dims


def _tpad(t_out: int, kw: int) -> int:
    """Time extent used on-chip: fits t_out + the kw-1 halo, multiple of 16
    (so bf16/fp32 (f, t, c) -> (f*t, c) reshapes are layout-preserving) and
    leaves the roll wrap-around columns (>= t_pad - (kw-1)) outside
    [0, t_out)."""
    need = t_out + kw - 1
    pad = (need + 15) // 16 * 16
    assert pad - (kw - 1) >= t_out
    return pad


def _conv_accum(x, wk, f_out: int, t_pad: int, kh: int, kw: int, c_in: int,
                c_out: int):
    """Wide-K conv on the MXU.

    x: (f_out + kh - 1, t_pad, c_in) bf16, offset-0 layout. wk: (kw, kh*c_in,
    c_out) bf16 — tap dt's weights stacked over (df, c). Returns fp32
    (f_out, t_pad, c_out) where column j is the conv output whose time-window
    starts at input column j (consumers slice the alignment they need).
    """
    xc = jnp.concatenate(
        [x[df : df + f_out].astype(jnp.float32) for df in range(kh)], axis=-1
    )  # (f_out, t_pad, kh*c_in) fp32
    acc = None
    for dt in range(kw):
        xdt = jnp.roll(xc, -dt, axis=1) if dt else xc
        m = xdt.astype(jnp.bfloat16).reshape(f_out * t_pad, kh * c_in)
        p = jnp.dot(m, wk[dt], preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc.reshape(f_out, t_pad, c_out)


def _bn_relu_bf16(acc, bias, scale, offset, relu: bool = True):
    """Match the XLA path's rounding: bf16(conv+bias) -> fp32 affine [-> relu]."""
    h = (acc + bias).astype(jnp.bfloat16).astype(jnp.float32)
    h = h * scale + offset
    if relu:
        h = jnp.maximum(h, 0.0)
    return h


def _maxpool_rows(h, f_out: int, t_out: int, c_out: int):
    """(F, T, C) -> (F//2, T, C) max over row pairs (maxpool (2,1) VALID)."""
    return jnp.max(h.reshape(f_out // 2, 2, t_out, c_out), axis=1)


def _affine_params(scale, bias, mean, var, eps: float = 1e-5):
    """BN inference affine: y = x*s + o with s = g/sqrt(var+eps), o = b - mean*s."""
    inv = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    return inv, (bias - mean * inv).astype(jnp.float32)


def _stack_taps(kernel):
    """(kh, kw, C_in, C_out) -> (kw, kh*C_in, C_out) bf16 for _conv_accum."""
    kh, kw, c_in, c_out = kernel.shape
    return kernel.transpose(1, 0, 2, 3).reshape(kw, kh * c_in, c_out).astype(
        jnp.bfloat16
    )


def _halo_spec(f_win: int, t_pad: int, c_in: int, f_step: int):
    """Element-indexed input spec: overlapping (f_win)-row halo windows."""
    return pl.BlockSpec(
        (Element(1), Element(f_win), Element(t_pad), Element(c_in)),
        lambda b, i: (b, i * f_step, 0, 0),
    )


# ---------------------------------------------------------------------------
# ConvBNRelu (+ optional pool)
# ---------------------------------------------------------------------------


def _conv_bn_kernel(x_ref, wk, bias, scale, offset, o_ref, *,
                    f_blk, t_out, t_pad, kh, kw, c_in, c_out, pool):
    acc = _conv_accum(x_ref[0], wk[:], f_blk, t_pad, kh, kw, c_in, c_out)
    h = _bn_relu_bf16(acc, bias[:], scale[:], offset[:])
    h = h[:, :t_out].astype(jnp.bfloat16)
    if pool:
        h = _maxpool_rows(h, f_blk, t_out, c_out)
    o_ref[0] = h


def fused_conv_bn_relu(x, kernel, conv_bias, bn_scale, bn_bias, bn_mean, bn_var,
                       *, pool: bool = False, f_blk: int | None = None,
                       interpret: bool = False):
    """Fused Conv(SAME)+BN(inference)+ReLU[+maxpool(2,1)] on NHWC bf16 input.

    x (B, F, T, C_in); kernel (kh, kw, C_in, C_out). Returns
    (B, F[/2], T, C_out) bf16. Same math as ConvBNRelu(train=False)
    [+ _maxpool_freq] in models/cnn_rnn.py.
    """
    b, f, t, c_in = x.shape
    kh, kw, _, c_out = kernel.shape
    hf = kh // 2
    t_pad = _tpad(t, kw)
    if f % 2 or (pool and f % 4):
        raise ValueError(
            f"F={f} must be divisible by 2 (by 4 with pool) for the blocked "
            f"frequency grid"
        )
    if f_blk is None:
        f_blk = 8 if c_in <= 32 else 4
    while f % f_blk or (pool and f_blk % 2):
        f_blk //= 2
    assert f_blk >= 2, (f, f_blk)

    # Row pad: SAME halo. Time: kw//2 leading zeros inside the t_pad window so
    # _conv_accum column j is the conv output centered at global t = j.
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (hf, hf), (kw // 2, t_pad - t - (kw // 2)), (0, 0)),
    )
    wk = _stack_taps(kernel)
    s, o = _affine_params(bn_scale, bn_bias, bn_mean, bn_var)
    vec = lambda v: v.astype(jnp.float32).reshape(1, c_out)
    const = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))

    f_out_blk = f_blk // 2 if pool else f_blk
    grid = (b, f // f_blk)
    out = pl.pallas_call(
        functools.partial(
            _conv_bn_kernel, f_blk=f_blk, t_out=t, t_pad=t_pad, kh=kh, kw=kw,
            c_in=c_in, c_out=c_out, pool=pool,
        ),
        grid=grid,
        in_specs=[
            _halo_spec(f_blk + kh - 1, t_pad, c_in, f_blk),
            const((kw, kh * c_in, c_out)),
            const((1, c_out)), const((1, c_out)), const((1, c_out)),
        ],
        out_specs=pl.BlockSpec(
            (1, f_out_blk, t, c_out), lambda b, i: (b, i, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, f // 2 if pool else f, t, c_out),
                                       jnp.bfloat16),
        interpret=interpret,
    )(xp, wk, vec(conv_bias), vec(s), vec(o))
    return out


# ---------------------------------------------------------------------------
# ResidualBlock (+ optional pool)
# ---------------------------------------------------------------------------


def _res_block_kernel(x_ref, w1, b1, s1, o1, w2, b2, s2, o2, ws, bs_, ss, os_,
                      o_ref, *, f_blk, f_total, t_out, t_pad, c_in,
                      c_mid, c_out, pool, has_skip):
    i = pl.program_id(1)
    x = x_ref[0]  # (f_blk+4, t_pad, c_in) bf16; local col j = global t - 2

    # conv1 over the halo-1 region -> h1 (f_blk+2, t_pad, c_mid) fp32.
    # h1 local col j = global t - 1 (conv window starting at x col j is
    # centered at x col j+1 = global j-1).
    f2 = f_blk + 2
    acc1 = _conv_accum(x, w1[:], f2, t_pad, 3, 3, c_in, c_mid)
    h1 = _bn_relu_bf16(acc1, b1[:], s1[:], o1[:])
    # conv2's SAME padding sees ZEROS outside the true tensor; halo rows/cols
    # of h1 past the boundary (and roll wrap columns) must be zeroed to match
    # XLA. Valid: global row in [0, f_total), global col in [0, t_out).
    row = jax.lax.broadcasted_iota(jnp.int32, (f2, t_pad, c_mid), 0) + i * f_blk - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (f2, t_pad, c_mid), 1) - 1
    valid = (row >= 0) & (row < f_total) & (col >= 0) & (col < t_out)
    h1 = jnp.where(valid, h1, 0.0).astype(jnp.bfloat16)

    # conv2 -> y local col j = global t = j (centered at h1 col j+1 = global j)
    acc2 = _conv_accum(h1, w2[:], f_blk, t_pad, 3, 3, c_mid, c_out)
    h2 = _bn_relu_bf16(acc2, b2[:], s2[:], o2[:], relu=False)[:, :t_out]

    # identity / 1x1-conv skip from the center rows of x (global t = col - 2)
    xc = x[2 : 2 + f_blk].reshape(f_blk * t_pad, c_in)
    if has_skip:
        accs = jnp.dot(xc, ws[:], preferred_element_type=jnp.float32)
        idn = _bn_relu_bf16(
            accs.reshape(f_blk, t_pad, c_out), bs_[:], ss[:], os_[:], relu=False
        )
    else:
        idn = xc.astype(jnp.float32).reshape(f_blk, t_pad, c_out)
    idn = idn[:, 2 : 2 + t_out]

    out = jnp.maximum(h2 + idn, 0.0).astype(jnp.bfloat16)
    if pool:
        out = _maxpool_rows(out, f_blk, t_out, c_out)
    o_ref[0] = out


def _res_vmem_estimate(f_blk: int, t_pad: int, c_in: int, c_mid: int,
                       c_out: int) -> int:
    """Approximate peak VMEM bytes of _res_block_kernel (dominant fp32/bf16
    intermediates, x0.7 for compiler buffer reuse — calibrated against the
    compiler's 18.05 MB report at f_blk=4, C 64->128, t_pad=944)."""
    f2 = f_blk + 2
    b = 0
    b += f2 * t_pad * 3 * c_in * 4        # xc1 fp32
    b += f2 * t_pad * 3 * c_in * 2        # per-dt bf16 matrix
    b += 2 * f2 * t_pad * c_mid * 4       # acc1 + h1 fp32
    b += f_blk * t_pad * 3 * c_mid * 4    # xc2 fp32
    b += f_blk * t_pad * 3 * c_mid * 2    # m2 bf16
    b += 2 * f_blk * t_pad * c_out * 4    # acc2/h2 + skip fp32
    return int(b * 0.7)


def fused_res_block(x, p, *, pool: bool = False, f_blk: int | None = None,
                    interpret: bool = False):
    """Fused ResidualBlock(train=False) [+ maxpool(2,1)] on NHWC bf16 input.

    ``p`` is the block's variables: {"params": {conv1, bn1, conv2, bn2
    [, skip_conv, skip_bn]}, "batch_stats": {bn1, bn2[, skip_bn]}} with the
    exact tree models/cnn_rnn.py ResidualBlock owns. Math matches the XLA
    inference path (same bf16 rounding points).
    """
    b, f, t, c_in = x.shape
    params, stats = p["params"], p["batch_stats"]
    w1 = params["conv1"]["kernel"]
    c_mid = w1.shape[-1]
    w2 = params["conv2"]["kernel"]
    c_out = w2.shape[-1]
    has_skip = "skip_conv" in params
    assert has_skip or c_in == c_out
    t_pad = _tpad(t, 3)

    if f % 2 or (pool and f % 4):
        raise ValueError(
            f"F={f} must be divisible by 2 (by 4 with pool) for the blocked "
            f"frequency grid"
        )
    if f_blk is None:  # largest block fitting the ~16 MB VMEM scope
        f_blk = 8
        while f_blk > 2 and _res_vmem_estimate(f_blk, t_pad, c_in, c_mid,
                                               c_out) > 14 * 2**20:
            f_blk //= 2
    while f % f_blk or (pool and f_blk % 2):
        f_blk //= 2
    assert f_blk >= 2, (f, f_blk)

    # local col j = global t - 2: two leading zero columns for the nested
    # (conv1 then conv2) SAME halo.
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((0, 0), (2, 2), (2, t_pad - t - 2), (0, 0))
    )

    def affine(bn_name):
        return _affine_params(
            params[bn_name]["scale"], params[bn_name]["bias"],
            stats[bn_name]["mean"], stats[bn_name]["var"],
        )

    s1, o1 = affine("bn1")
    s2, o2 = affine("bn2")
    vec = lambda v, c: v.astype(jnp.float32).reshape(1, c)
    w1c = _stack_taps(w1)
    w2c = _stack_taps(w2)
    if has_skip:
        ws = params["skip_conv"]["kernel"].reshape(c_in, c_out).astype(jnp.bfloat16)
        bsv = vec(params["skip_conv"]["bias"], c_out)
        ssv, osv = affine("skip_bn")
        ssv, osv = vec(ssv, c_out), vec(osv, c_out)
    else:  # dummies (still passed; kernel ignores them)
        ws = jnp.zeros((c_in, c_out), jnp.bfloat16)
        bsv = ssv = osv = jnp.zeros((1, c_out), jnp.float32)

    f_out_blk = f_blk // 2 if pool else f_blk
    grid = (b, f // f_blk)
    const = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(
            _res_block_kernel, f_blk=f_blk, f_total=f, t_out=t, t_pad=t_pad,
            c_in=c_in, c_mid=c_mid, c_out=c_out, pool=pool, has_skip=has_skip,
        ),
        grid=grid,
        in_specs=[
            _halo_spec(f_blk + 4, t_pad, c_in, f_blk),
            const((3, 3 * c_in, c_mid)), const((1, c_mid)), const((1, c_mid)),
            const((1, c_mid)),
            const((3, 3 * c_mid, c_out)), const((1, c_out)), const((1, c_out)),
            const((1, c_out)),
            const((c_in, c_out)), const((1, c_out)), const((1, c_out)),
            const((1, c_out)),
        ],
        out_specs=pl.BlockSpec(
            (1, f_out_blk, t, c_out), lambda b, i: (b, i, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b, f // 2 if pool else f, t, c_out),
                                       jnp.bfloat16),
        interpret=interpret,
    )(
        xp,
        w1c, vec(params["conv1"]["bias"], c_mid), vec(s1, c_mid), vec(o1, c_mid),
        w2c, vec(params["conv2"]["bias"], c_out), vec(s2, c_out), vec(o2, c_out),
        ws, bsv, ssv, osv,
    )
    return out
