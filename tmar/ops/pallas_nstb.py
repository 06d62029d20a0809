"""Fused NSTB kernel: n-gram context add + cosine window attention +
post-norm residual FFN in ONE Pallas call.

Replaces three HBM round trips of the unfused pipeline (reference
models/generator/components/transformer_blocks.py:83-120): the XLA
context broadcast-add, the attention output, and the FFN kernel's re-read
of x.  Inputs are windows of the *rolled, context-free* feature map plus a
per-window stack of the 4 neighbouring windows' contexts:

  The reference adds the n-gram context per window BEFORE the cyclic
  shift (window_utils.py:132-143), so after rolling by s each shifted
  window covers a 2×2 neighbourhood of pre-shift windows and the context
  is constant per QUADRANT.  A static [N, 4] quadrant selector (token
  (r, c) -> quadrant (r >= ws-s, c >= ws-s)) recovers the per-token
  context as one tiny batched matmul:  ctx_tok = sel @ ctx_quads[t].

Then (identical math to the unfused path, tests assert equivalence):

  x_attn = x + ctx_tok
  a      = window_attention(x_attn)          # per-window batched, no [TN,TN]
  y      = x + LN1(a)                        # residual uses x WITHOUT ctx
  z      = y + LN2(fc2(gelu(fc1(y))))

Differentiation: the custom VJP's op_fwd — which only runs when the op is
being differentiated — computes the primal via the pure-XLA math, and the
backward is jax.vjp of the same math.  So training automatically stays on
the XLA path (measured faster than any pallas-forward combination,
PERF.md) while inference keeps the fused kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmar.ops.attention import window_attention_math
from tmar.ops.pallas_ffn import _gelu_exact, ffn_math


def quadrant_selector(window_size: int, shift_size: int) -> np.ndarray:
    """[N, 4] one-hot: token (r, c) -> which of the 4 pre-shift windows
    (own / right / down / down-right) its context comes from after a roll
    by ``shift_size``.  shift 0 -> everything quadrant 0."""
    ws = window_size
    sel = np.zeros((ws * ws, 4), np.float32)
    for r in range(ws):
        for c in range(ws):
            qr = 1 if (shift_size > 0 and r >= ws - shift_size) else 0
            qc = 1 if (shift_size > 0 and c >= ws - shift_size) else 0
            sel[r * ws + c, 2 * qr + qc] = 1.0
    return sel


def context_quads(ctx: jnp.ndarray, shift_size: int) -> jnp.ndarray:
    """ctx [B, wh, ww, D] -> [B, wh, ww, 4, D]: each window's own context
    and its right / down / down-right neighbours (cyclic, matching
    torch.roll(-shift) wraparound).  For shift 0 the selector only ever
    reads slot 0, the other slots are don't-care."""
    if shift_size == 0:
        return jnp.broadcast_to(ctx[:, :, :, None, :], ctx.shape[:3] + (4,) + ctx.shape[-1:])
    right = jnp.roll(ctx, -1, axis=2)
    down = jnp.roll(ctx, -1, axis=1)
    downright = jnp.roll(down, -1, axis=2)
    return jnp.stack([ctx, right, down, downright], axis=3)


def nstb_math(
    x, ctx_quads, sel,
    wqkv, bqkv, logit_scale, bias, wproj, bproj,
    g1, b1, w1, bw1, w2, bw2, g2, b2,
    num_heads, mask_components=None, eps=1e-5,
):
    """Pure-XLA reference of the fused kernel (used by the custom VJP)."""
    B_, N, D = x.shape
    ctx_tok = jnp.einsum("nq,bqd->bnd", sel, ctx_quads.astype(jnp.float32))
    x_attn = (x.astype(jnp.float32) + ctx_tok).astype(x.dtype)
    a = window_attention_math(
        x_attn, wqkv, bqkv, logit_scale, bias, wproj, bproj,
        num_heads=num_heads, mask_components=mask_components,
    )
    z = ffn_math(
        x.reshape(B_ * N, D), a.reshape(B_ * N, D).astype(x.dtype),
        g1, b1, w1, bw1, w2, bw2, g2, b2, eps=eps,
    )
    return z.reshape(B_, N, D)


def fused_nstb(
    x: jnp.ndarray,
    ctx_quads: jnp.ndarray,
    sel: np.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: Optional[jnp.ndarray],
    ln1: Tuple[jnp.ndarray, jnp.ndarray],
    ffn1: Tuple[jnp.ndarray, jnp.ndarray],
    ffn2: Tuple[jnp.ndarray, jnp.ndarray],
    ln2: Tuple[jnp.ndarray, jnp.ndarray],
    num_heads: int,
    mask_components: Optional[Tuple] = None,
    windows_per_step: Optional[int] = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B_, N, D] context-free rolled windows; ctx_quads: [B_, 4, D].

    Returns z [B_, N, D] (the full NSTB output, still in rolled window
    space — roll/partition commute with all per-token ops)."""
    N = x.shape[1]
    D = x.shape[2]
    if windows_per_step is None:
        windows_per_step = max(1, 2048 // N)
    T = windows_per_step
    g1, bb1 = ln1
    w1, bw1 = ffn1
    w2, bw2 = ffn2
    g2, bb2 = ln2
    has_bqkv = bqkv is not None
    has_bproj = bproj is not None
    zeros_b3 = jnp.zeros((wqkv.shape[1],), x.dtype)
    zeros_bp = jnp.zeros((wproj.shape[1],), x.dtype)

    @jax.custom_vjp
    def op(x, ctx_quads, wqkv, bqkv, logit_scale, bias, wproj, bproj,
           g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return _forward(
            x, ctx_quads, sel, wqkv, bqkv if has_bqkv else None, logit_scale,
            bias, wproj, bproj if has_bproj else None,
            g1, bb1, w1, bw1, w2, bw2, g2, bb2,
            num_heads=num_heads, mask_components=mask_components,
            T=T, eps=eps, interpret=interpret,
        )

    def math_fn(xx, cq, wq, bq, ls, bi, wp, bp, g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return nstb_math(
            xx, cq, jnp.asarray(sel), wq, bq, ls, bi, wp, bp,
            g1, bb1, w1, bw1, w2, bw2, g2, bb2,
            num_heads=num_heads, mask_components=mask_components, eps=eps,
        )

    def op_fwd(*a):
        # op_fwd only runs UNDER DIFFERENTIATION: use the pure-XLA math as
        # the primal there, so training gets XLA forward+backward (measured
        # faster than pallas-fwd + recompute-bwd, PERF.md) while inference
        # (no grad) keeps the fused kernel.
        return math_fn(*a), a

    def op_bwd(res, g):
        x = res[0]
        _, vjp = jax.vjp(math_fn, *res)
        return vjp(g.astype(x.dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(
        x, ctx_quads, wqkv, bqkv if has_bqkv else zeros_b3, logit_scale, bias,
        wproj, bproj if has_bproj else zeros_bp,
        g1, bb1, w1, bw1, w2, bw2, g2, bb2,
    )


def _forward(
    x, ctx_quads, sel, wqkv, bqkv, logit_scale, bias, wproj, bproj,
    g1, bb1, w1, bw1, w2, bw2, g2, bb2,
    *, num_heads, mask_components, T, eps, interpret,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tmar.ops.pallas_attention import _pack_params, _round_up

    B_, N, D = x.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    hd = A // nh
    hd_p = max(_round_up(hd, 8), 8)
    H = w1.shape[1]
    TN = T * N

    out_dtype = x.dtype
    w_packed, bq, wp, scale_vec = _pack_params(
        wqkv, bqkv, logit_scale, wproj, nh, hd, hd_p, out_dtype
    )

    bias_f = bias.astype(jnp.float32)                # [nh, N, N]
    if mask_components is not None:
        m_row, m_col, wh, ww = mask_components
        mrow = jnp.asarray(m_row, jnp.float32)
        mcol = jnp.asarray(m_col, jnp.float32)
    else:
        wh = ww = 0
        mrow = jnp.zeros((N, N), jnp.float32)
        mcol = jnp.zeros((N, N), jnp.float32)

    from tmar.ops.pallas_attention import _ones_block

    A2 = 2 * nh * hd_p
    ones_np = _ones_block(nh, hd_p)

    pad_windows = (-B_) % T
    if pad_windows:
        x = jnp.concatenate([x, jnp.zeros((pad_windows, N, D), x.dtype)])
        ctx_quads = jnp.concatenate(
            [ctx_quads, jnp.zeros((pad_windows, 4, D), ctx_quads.dtype)]
        )
    Bp = x.shape[0]
    x2 = x.reshape(Bp * N, D)
    cq2 = ctx_quads.reshape(Bp * 4, D)

    kernel = functools.partial(
        _nstb_kernel, T=T, N=N, D=D, nh=nh, hd_p=hd_p, hd=hd, wh=wh, ww=ww, H=H, eps=eps,
    )
    c0 = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T * 4, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 4), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * nh * hd_p), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * nh * hd_p), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh * hd_p, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((A2, 2 * nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * N, D), out_dtype),
        interpret=interpret,
    )(
        x2,
        cq2.astype(out_dtype),
        jnp.asarray(sel),
        w_packed.astype(out_dtype),
        bq.reshape(1, -1).astype(jnp.float32),
        scale_vec.reshape(1, nh),
        bias_f,
        wp.astype(out_dtype),
        (bproj if bproj is not None else jnp.zeros((D,))).reshape(1, D).astype(jnp.float32),
        mrow,
        mcol,
        jnp.asarray(ones_np),
        g1.reshape(1, D).astype(jnp.float32),
        bb1.reshape(1, D).astype(jnp.float32),
        w1.astype(out_dtype),
        bw1.reshape(1, H).astype(jnp.float32),
        w2.astype(out_dtype),
        bw2.reshape(1, D).astype(jnp.float32),
        g2.reshape(1, D).astype(jnp.float32),
        bb2.reshape(1, D).astype(jnp.float32),
    )
    out = out.reshape(Bp, N, D)
    return out[:B_] if pad_windows else out


def _nstb_body(
    x, cq, shift_mask, sel_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref,
    wproj_ref, bproj_ref, ones_ref,
    g1_ref, b1_ref, w1_ref, bw1_ref, w2_ref, bw2_ref, g2_ref, b2_ref,
    *, T, N, D, nh, hd_p, eps, hd=None,
):
    """Shared NSTB compute: x [TN, D] context-free window tokens,
    cq [T, Q, D] context quads (Q=1: own context only; Q=4: 2x2 pre-shift
    neighbourhood), shift_mask [T, N, N] or None -> z [TN, D]."""
    TN = T * N
    Qs = sel_ref.shape[1]
    if Qs == 1:
        # unshifted: every token gets its own window's context (cq arrives
        # [Tp, D]).  Mosaic rejects both the [Tp, 1, D] reshape and the
        # sublane broadcast, so the per-window expansion runs as one tiny
        # MXU dot against a block one-hot: ctx_tok[t*N+n] = cq[t].
        Tp_ = cq.shape[0]
        row_w = jax.lax.broadcasted_iota(jnp.int32, (TN, Tp_), 0) // N
        col_w = jax.lax.broadcasted_iota(jnp.int32, (TN, Tp_), 1)
        expand = (row_w == col_w).astype(jnp.float32)
        ctx_tok = jnp.dot(
            expand, cq.astype(jnp.float32), preferred_element_type=jnp.float32
        )                                           # [TN, D] f32
    else:
        # per-token context from the quadrant stack: sel [N,4] @ cq [T,4,D]
        sel3 = jnp.broadcast_to(sel_ref[:][None], (T, N, Qs))
        ctx_tok = jax.lax.dot_general(
            sel3, cq, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(TN, D)                            # [TN, D] f32
    x_attn = (x.astype(jnp.float32) + ctx_tok).astype(x.dtype)

    qkv = jnp.dot(x_attn, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    from tmar.ops.pallas_attention import batched_attention_core

    acc = batched_attention_core(
        qkv, shift_mask, scale_ref, bias_ref, ones_ref, T=T, N=N, nh=nh, hd_p=hd_p,
        hd=hd, compute_dtype=x.dtype,
    )
    a = jnp.dot(
        acc.astype(wproj_ref.dtype), wproj_ref[:], preferred_element_type=jnp.float32
    ) + bproj_ref[0, :]                             # [TN, D] f32 attn out

    # post-norm residual FFN (identical math to tmar.ops.pallas_ffn)
    def ln(v32, g_ref, b_ref):
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mu), axis=-1, keepdims=True)
        return (v32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[0, :] + b_ref[0, :]

    y = x.astype(jnp.float32) + ln(a, g1_ref, b1_ref)
    h1 = jnp.dot(y.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
    h1 = _gelu_exact(h1 + bw1_ref[0, :])
    o2 = jnp.dot(h1.astype(w2_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32)
    return y + ln(o2 + bw2_ref[0, :], g2_ref, b2_ref)


def _nstb_kernel(
    x_ref, cq_ref, sel_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref,
    wproj_ref, bproj_ref, mrow_ref, mcol_ref, ones_ref,
    g1_ref, b1_ref, w1_ref, bw1_ref, w2_ref, bw2_ref, g2_ref, b2_ref,
    out_ref, *, T, N, D, nh, hd_p, wh, ww, H, eps, hd=None,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    x = x_ref[:]                                    # [TN, D] context-free
    cq = cq_ref[:].reshape(T, 4, D)

    shift_mask = None
    if wh and ww:
        from tmar.ops.pallas_attention import batched_window_gates

        shift_mask = batched_window_gates(
            i * T, mrow_ref, mcol_ref, T=T, wh=wh, ww=ww, wrap=True
        )

    z = _nstb_body(
        x, cq, shift_mask, sel_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref,
        wproj_ref, bproj_ref, ones_ref,
        g1_ref, b1_ref, w1_ref, bw1_ref, w2_ref, bw2_ref, g2_ref, b2_ref,
        T=T, N=N, D=D, nh=nh, hd_p=hd_p, eps=eps, hd=hd,
    )
    out_ref[:] = z.astype(out_ref.dtype)


def fused_nstb_map(
    xmap: jnp.ndarray,
    ctx_quads: jnp.ndarray,
    sel: np.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: Optional[jnp.ndarray],
    ln1: Tuple[jnp.ndarray, jnp.ndarray],
    ffn1: Tuple[jnp.ndarray, jnp.ndarray],
    ffn2: Tuple[jnp.ndarray, jnp.ndarray],
    ln2: Tuple[jnp.ndarray, jnp.ndarray],
    num_heads: int,
    window_size: int,
    mask_components: Optional[Tuple] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    shift: int = 0,
) -> jnp.ndarray:
    """Map-level fused NSTB: xmap is the *UNROLLED, context-free* feature
    map [B, ph, pw, D]; the SW-MSA cyclic roll (``shift``), window
    partition and unpartition all happen IN-KERNEL — the rolled stripe is
    assembled from the own/right/below/corner halo blocks via cyclic
    index maps, so the XLA full-map roll copy disappears along with the
    layout copies of the token-level path.  ctx_quads:
    [B*wh*ww, Q, D] in window row-major order, where Q is 1 for
    unshifted blocks (every token reads its own window's context) and 4
    for shifted ones (the 2x2 pre-shift neighbourhood).
    Returns the block output as a map [B, ph, pw, D] (still in ROLLED
    space — roll/partition commute with all per-token ops and the
    caller's reverse shift restores it)."""
    B, ph, pw, D = xmap.shape
    ws = window_size
    wh, ww = ph // ws, pw // ws
    # stripes: split each window-row so one grid step holds <= t_max
    # windows.  Default 64 (a whole window-row at 512²): measured 20.24 vs
    # 19.99 slices/s at TMAX 32 — bigger dots beat the smaller footprint;
    # > 32 windows gets a vmem grant in _forward_map.  TMAR_NSTB_TMAX is
    # the measurement knob.
    t_max = int(os.environ.get("TMAR_NSTB_TMAX", "64") or "64")
    S = 1
    while ww // S > t_max or ww % S:
        S += 1
        if S > ww:
            S = ww
            break
    N = ws * ws

    g1, bb1 = ln1
    w1, bw1 = ffn1
    w2, bw2 = ffn2
    g2, bb2 = ln2
    has_bqkv = bqkv is not None
    has_bproj = bproj is not None
    zeros_b3 = jnp.zeros((wqkv.shape[1],), xmap.dtype)
    zeros_bp = jnp.zeros((wproj.shape[1],), xmap.dtype)

    @jax.custom_vjp
    def op(xmap, ctx_quads, wqkv, bqkv, logit_scale, bias, wproj, bproj,
           g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return _forward_map(
            xmap, ctx_quads, sel, wqkv, bqkv if has_bqkv else None,
            logit_scale, bias, wproj, bproj if has_bproj else None,
            g1, bb1, w1, bw1, w2, bw2, g2, bb2,
            num_heads=num_heads, mask_components=mask_components,
            ws=ws, S=S, eps=eps, interpret=interpret, shift=shift,
        )

    def math_fn(xm, cq, wq, bq, ls, bi, wp, bp, g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        from tmar.ops.window import cyclic_shift, window_partition, window_unpartition

        wins, _ = window_partition(cyclic_shift(xm, shift), ws)
        toks = wins.reshape(-1, N, D)
        z = nstb_math(
            toks, cq, jnp.asarray(sel), wq, bq, ls, bi, wp, bp,
            g1, bb1, w1, bw1, w2, bw2, g2, bb2,
            num_heads=num_heads, mask_components=mask_components, eps=eps,
        )
        return window_unpartition(z.reshape(-1, ws, ws, D), (wh, ww))

    def op_fwd(*a):
        # under differentiation the primal is the pure-XLA math — training
        # stays on the XLA path (faster fwd+bwd than pallas+recompute,
        # PERF.md); inference keeps the fused kernel
        return math_fn(*a), a

    def op_bwd(res, g):
        xm = res[0]
        _, vjp = jax.vjp(math_fn, *res)
        return vjp(g.astype(xm.dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(
        xmap, ctx_quads, wqkv, bqkv if has_bqkv else zeros_b3, logit_scale,
        bias, wproj, bproj if has_bproj else zeros_bp,
        g1, bb1, w1, bw1, w2, bw2, g2, bb2,
    )


def _forward_map(
    xmap, ctx_quads, sel, wqkv, bqkv, logit_scale, bias, wproj, bproj,
    g1, bb1, w1, bw1, w2, bw2, g2, bb2,
    *, num_heads, mask_components, ws, S, eps, interpret, shift=0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tmar.ops.pallas_attention import _pack_params, _round_up

    B, ph, pw, D = xmap.shape
    wh, ww = ph // ws, pw // ws
    Tw = ww // S
    N = ws * ws
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    hd = A // nh
    hd_p = max(_round_up(hd, 8), 8)
    H = w1.shape[1]

    out_dtype = xmap.dtype
    w_packed, bq, wp, scale_vec = _pack_params(
        wqkv, bqkv, logit_scale, wproj, nh, hd, hd_p, out_dtype
    )

    bias_f = bias.astype(jnp.float32)
    if mask_components is not None:
        m_row, m_col, _, _ = mask_components
        mrow = jnp.asarray(m_row, jnp.float32)
        mcol = jnp.asarray(m_col, jnp.float32)
        masked = 1
    else:
        masked = 0
        mrow = jnp.zeros((N, N), jnp.float32)
        mcol = jnp.zeros((N, N), jnp.float32)

    from tmar.ops.pallas_attention import _ones_block

    A2 = 2 * nh * hd_p
    ones_np = _ones_block(nh, hd_p)

    # cq slot count: unshifted blocks read only their own window's context
    # (Q=1, no host-side 4x broadcast); shifted blocks carry the 2x2
    # pre-shift neighbourhood (Q=4)
    Q = ctx_quads.shape[1]
    # Mosaic requires the cq block's sublane dim (Tw_p*Q) divisible by 8:
    # pad the per-stripe window count up (e.g. stage 3 of a 416^2 slice:
    # ww=13, S=1) and slice back in-kernel.
    unit = 8 // np.gcd(Q, 8)
    Tw_p = ((Tw + unit - 1) // unit) * unit
    if Tw_p != Tw:
        cq_s = ctx_quads.reshape(B * wh * S, Tw, Q, D)
        cq_s = jnp.pad(cq_s, ((0, 0), (0, Tw_p - Tw), (0, 0), (0, 0)))
        cq2 = cq_s.reshape(B * wh * S * Tw_p * Q, D)
    else:
        cq2 = ctx_quads.reshape(B * wh * ww * Q, D)

    kernel = functools.partial(
        _nstb_map_kernel, T=Tw, N=N, D=D, nh=nh, hd_p=hd_p, hd=hd,
        wh=wh, ww=ww, ws=ws, H=H, eps=eps, masked=masked, T_pad=Tw_p,
        Q=Q, shift=shift, S=S,
    )
    c0 = lambda *i: (0, 0)  # noqa: E731
    Tws8 = Tw * ws // 8
    in_specs = [
        pl.BlockSpec(
            (1, ws, Tw * ws, D), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    # (the pallas_call below consumes in_specs assembled here)
    halo_operands = []
    if shift:
        # in-kernel SW-MSA roll: the rolled stripe is assembled from the
        # own block + an 8-col right halo + the below row-block + its
        # 8-col corner (all cyclic — jnp.roll wraparound semantics)
        in_specs += [
            pl.BlockSpec(
                (1, ws, 8, D),
                lambda b, i, j, _S=S, _T8=Tws8: (b, i, ((j + 1) % _S) * _T8, 0),
                memory_space=pltpu.VMEM,
            ),
            # below/corner: only the first ``shift`` rows are needed —
            # a finer row-block unit halves the halo read when shift
            # divides ws
            pl.BlockSpec(
                (1, shift, Tw * ws, D),
                lambda b, i, j, _wh=wh, _r=ws // shift: (
                    b, ((i + 1) % _wh) * _r, j, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, shift, 8, D),
                lambda b, i, j, _wh=wh, _S=S, _T8=Tws8, _r=ws // shift: (
                    b, ((i + 1) % _wh) * _r, ((j + 1) % _S) * _T8, 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ]
        halo_operands = [xmap, xmap, xmap]
    in_specs += [
            pl.BlockSpec(
                (Tw_p * Q, D),
                lambda b, i, j: ((b * wh + i) * S + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((N, Q), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * nh * hd_p), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * nh * hd_p), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, N), lambda b, i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh * hd_p, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((A2, 2 * nh), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B, wh, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, ws, Tw * ws, D), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, ph, pw, D), out_dtype),
        # stacked-head attention (TMAR_ATTN_STACK groups, pallas_attention.
        # batched_attention_core) holds [g·T, N, N] f32 scores live: the
        # default 16 MB scoped-vmem cap is ~100 KB short at g=2 and ~13 MB
        # at g=6 (v5e VMEM is 128 MiB).  Granted only when that ablation
        # path is on — the grant alone measured a ~2% slowdown (514 vs
        # 502 ms/batch at 512²) on the default per-head path.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
            if Tw > 32
            or int(os.environ.get("TMAR_ATTN_STACK", "0") or "0") > 1
            else None
        ),
        interpret=interpret,
    )(
        xmap,
        *halo_operands,
        cq2.astype(out_dtype),
        jnp.asarray(sel),
        w_packed.astype(out_dtype),
        bq.reshape(1, -1).astype(jnp.float32),
        scale_vec.reshape(1, nh),
        bias_f,
        wp.astype(out_dtype),
        (bproj if bproj is not None else jnp.zeros((D,))).reshape(1, D).astype(jnp.float32),
        mrow,
        mcol,
        jnp.asarray(ones_np),
        g1.reshape(1, D).astype(jnp.float32),
        bb1.reshape(1, D).astype(jnp.float32),
        w1.astype(out_dtype),
        bw1.reshape(1, H).astype(jnp.float32),
        w2.astype(out_dtype),
        bw2.reshape(1, D).astype(jnp.float32),
        g2.reshape(1, D).astype(jnp.float32),
        bb2.reshape(1, D).astype(jnp.float32),
    )
    return out


def _nstb_map_kernel(
    *refs, T, N, D, nh, hd_p, wh, ww, ws, H, eps, masked, hd=None,
    T_pad=None, Q=4, shift=0, S=1,
):
    from jax.experimental import pallas as pl

    if shift:
        (x_ref, right_ref, below_ref, corner_ref, cq_ref, sel_ref,
         wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
         mrow_ref, mcol_ref, ones_ref, g1_ref, b1_ref, w1_ref, bw1_ref,
         w2_ref, bw2_ref, g2_ref, b2_ref, out_ref) = refs
    else:
        (x_ref, cq_ref, sel_ref,
         wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
         mrow_ref, mcol_ref, ones_ref, g1_ref, b1_ref, w1_ref, bw1_ref,
         w2_ref, bw2_ref, g2_ref, b2_ref, out_ref) = refs

    i = pl.program_id(1)              # window row
    j = pl.program_id(2)              # stripe within the row
    TN = T * N

    if shift:
        # assemble the (-shift, -shift)-rolled stripe from the unrolled
        # map's own/right/below/corner halo blocks (compile-probed exact
        # vs jnp.roll; the XLA full-map roll copy disappears)
        own = x_ref[0]                                 # [ws, T*ws, D]
        top = jnp.concatenate([own, right_ref[0]], axis=1)
        bot = jnp.concatenate([below_ref[0], corner_ref[0]], axis=1)
        tall = jnp.concatenate([top[shift:], bot], axis=0)  # below refs carry
        stripe = tall[:, shift : shift + T * ws, :]    # exactly shift rows
    else:
        stripe = x_ref[0]                              # [ws, T*ws, D]

    # in-kernel window partition: [ws, T*ws, D] -> [T windows, ws*ws, D]
    tw = stripe.reshape(ws, T, ws, D)
    tokens = jnp.transpose(tw, (1, 0, 2, 3)).reshape(TN, D)
    Tp = T if T_pad is None else T_pad
    if Q == 1:
        cq = cq_ref[:]                                 # [Tp, D] (2-D: a
        # [Tp, 1, D] reshape is an unsupported Mosaic shape cast)
    else:
        cq = cq_ref[:].reshape(Tp, Q, D)[:T]

    shift_mask = None
    if masked:
        from tmar.ops.pallas_attention import batched_window_gates

        # window (i, j*T + t) of the (wh, ww) grid — no wraparound, the
        # grid covers exactly the window grid
        shift_mask = batched_window_gates(
            i * ww + j * T, mrow_ref, mcol_ref, T=T, wh=wh, ww=ww, wrap=False
        )

    z = _nstb_body(
        tokens, cq, shift_mask, sel_ref, wqkv_ref, bqkv_ref, scale_ref,
        bias_ref, wproj_ref, bproj_ref, ones_ref,
        g1_ref, b1_ref, w1_ref, bw1_ref, w2_ref, bw2_ref, g2_ref, b2_ref,
        T=T, N=N, D=D, nh=nh, hd_p=hd_p, eps=eps, hd=hd,
    )
    # inverse: [TN, D] -> [ws, T*ws, D]
    zz = z.reshape(T, ws, ws, D)
    out_ref[0] = jnp.transpose(zz, (1, 0, 2, 3)).reshape(ws, T * ws, D).astype(out_ref.dtype)
