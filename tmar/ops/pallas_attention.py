"""Fused cosine window-attention Pallas TPU kernel.

Fuses the whole per-window attention pipeline of WindowAttention (reference
models/generator/components/attention.py:70-101) into one VMEM-resident
kernel: qkv projection -> L2 normalisation -> scaled-cosine scores ->
relative-position bias (+ decomposed SW-MSA mask) -> softmax -> value matmul
-> output projection.  The XLA path materialises the [B_, nh, N, N] score
tensor in HBM between ops (the dominant HBM traffic of the model); here
scores live and die in VMEM.

MXU-shaping: instead of one tiny [N, N] score matmul per window, each grid
step stacks T windows and computes ONE [T·N, T·N] score matrix per head with
off-diagonal blocks masked to -1e9 before the softmax — T× redundant FLOPs,
but large MXU-friendly dots and zero scatter/gather.  The relative-position
bias and the decomposed SW-MSA masks are pre-tiled to [T·N, T·N] on the host
(tiny constants); the per-window edge gates are computed in-kernel from the
grid index.

Head dim is zero-padded to a lane-friendly multiple — padding q/k with zeros
leaves q·kᵀ unchanged, and the padded rows of the output projection are
zero, so numerics are identical to the XLA path
(tests/test_pallas_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmar.ops.attention import LOGIT_SCALE_MAX

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_block(mat: np.ndarray, T: int) -> np.ndarray:
    """[N, N] -> [T*N, T*N] with mat[a % N, b % N] everywhere."""
    N = mat.shape[0]
    return np.tile(mat, (T, T))


def fused_window_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    mask_components: Optional[Tuple] = None,
    windows_per_step: Optional[int] = None,
    interpret: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Differentiable fused window attention: Pallas forward, XLA recompute
    backward (jax.vjp of the equivalent pure function) — usable under
    jax.grad so training can run the fused forward too."""
    if windows_per_step is None:
        # target ~512 token rows per grid step
        windows_per_step = max(1, 512 // x.shape[1])
    has_bqkv = bqkv is not None
    has_bproj = bproj is not None

    @jax.custom_vjp
    def op(x, wqkv, bqkv, logit_scale, bias, wproj, bproj):
        return _fused_forward(
            x, wqkv, bqkv if has_bqkv else None, logit_scale, bias, wproj,
            bproj if has_bproj else None, num_heads,
            mask_components=mask_components,
            windows_per_step=windows_per_step,
            interpret=interpret,
            impl=impl,
        )

    def op_fwd(x, wqkv, bqkv, logit_scale, bias, wproj, bproj):
        out = op(x, wqkv, bqkv, logit_scale, bias, wproj, bproj)
        return out, (x, wqkv, bqkv, logit_scale, bias, wproj, bproj)

    def op_bwd(res, g):
        from tmar.ops.attention import window_attention_math

        x, wqkv, bqkv, logit_scale, bias, wproj, bproj = res
        _, vjp = jax.vjp(
            lambda *a: window_attention_math(
                *a, num_heads=num_heads, mask_components=mask_components
            ),
            x, wqkv, bqkv, logit_scale, bias, wproj, bproj,
        )
        return vjp(g.astype(x.dtype))

    op.defvjp(op_fwd, op_bwd)
    zeros_b3 = jnp.zeros((wqkv.shape[1],), x.dtype)
    zeros_bp = jnp.zeros((wproj.shape[1],), x.dtype)
    return op(
        x, wqkv, bqkv if has_bqkv else zeros_b3, logit_scale, bias, wproj,
        bproj if has_bproj else zeros_bp,
    )


def _fused_forward(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    bias: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    num_heads: int,
    mask_components: Optional[Tuple] = None,
    windows_per_step: int = 8,
    interpret: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Fused window attention (forward only).

    Args:
        x: [B_, N, D] window tokens (B_ = batch·wh·ww).
        wqkv: [D, 3·A] fused qkv weight (A = nh·hd), bqkv: [3·A] or None.
        logit_scale: [nh, 1, 1] log-domain scale.
        bias: [nh, N, N] relative-position bias (pre-gathered, f32).
        wproj: [A, D], bproj: [D].
        num_heads: nh.
        mask_components: optional (m_row [N,N], m_col [N,N], wh, ww).
        windows_per_step: T, windows per grid step.

    Returns: [B_, N, D] attention output, x.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B_, N, D = x.shape
    A3 = wqkv.shape[1]
    A = A3 // 3
    nh = num_heads
    hd = A // nh
    hd_p = max(_round_up(hd, 8), 8)
    T = windows_per_step
    TN = T * N

    # --- repack weights head-major with padded head dim (zero pad) ----------
    wq = wqkv.reshape(D, 3, nh, hd).transpose(1, 2, 0, 3)  # [3, nh, D, hd]
    wq = jnp.pad(wq, ((0, 0), (0, 0), (0, 0), (0, hd_p - hd)))
    w_packed = wq.transpose(2, 0, 1, 3).reshape(D, 3 * nh * hd_p)
    if bqkv is not None:
        bq = bqkv.reshape(3, nh, hd)
        bq = jnp.pad(bq, ((0, 0), (0, 0), (0, hd_p - hd))).reshape(3 * nh * hd_p)
    else:
        bq = jnp.zeros((3 * nh * hd_p,), jnp.float32)
    wp = wproj.reshape(nh, hd, D)
    wp = jnp.pad(wp, ((0, 0), (0, hd_p - hd), (0, 0))).reshape(nh * hd_p, D)

    scale_vec = jnp.exp(
        jnp.clip(logit_scale.reshape(nh).astype(jnp.float32), max=LOGIT_SCALE_MAX)
    )

    # --- pre-tiled [TN, TN] additive terms ----------------------------------
    # off-block-diagonal -> NEG (token only attends inside its own window)
    blk = np.kron(np.eye(T, dtype=np.float32), np.ones((N, N), np.float32))
    offdiag = (1.0 - blk) * NEG
    bias_big = jnp.asarray(offdiag)[None] + jnp.tile(
        bias.astype(jnp.float32), (1, T, T)
    )  # [nh, TN, TN]

    if mask_components is not None:
        m_row, m_col, wh, ww = mask_components
        mrow_big = jnp.asarray(_tile_block(np.asarray(m_row, np.float32), T))
        mcol_big = jnp.asarray(_tile_block(np.asarray(m_col, np.float32), T))
    else:
        wh = ww = 0
        mrow_big = jnp.zeros((TN, TN), jnp.float32)
        mcol_big = jnp.zeros((TN, TN), jnp.float32)

    pad_windows = (-B_) % T
    if pad_windows:
        x = jnp.concatenate([x, jnp.zeros((pad_windows, N, D), x.dtype)])
    Bp = x.shape[0]
    x2 = x.reshape(Bp * N, D)
    out_dtype = x.dtype

    import os

    impl = impl or os.environ.get("TMAR_ATTN_IMPL", "blockdiag")
    kernel_fn = _attn_kernel_packed if impl == "packed" else _attn_kernel
    kernel = functools.partial(
        kernel_fn, T=T, N=N, D=D, nh=nh, hd_p=hd_p, wh=wh, ww=ww,
    )

    out = pl.pallas_call(
        kernel,
        grid=(Bp // T,),
        in_specs=[
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * nh * hd_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * nh * hd_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, TN, TN), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh * hd_p, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * N, D), out_dtype),
        interpret=interpret,
    )(
        x2,
        w_packed.astype(out_dtype),
        bq.reshape(1, -1).astype(jnp.float32),
        scale_vec.reshape(1, nh),
        bias_big,
        wp.astype(out_dtype),
        (bproj if bproj is not None else jnp.zeros((D,))).reshape(1, D).astype(jnp.float32),
        mrow_big,
        mcol_big,
    )
    out = out.reshape(Bp, N, D)
    return out[:B_] if pad_windows else out


def _attn_kernel_packed(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, out_ref, *, T, N, D, nh, hd_p, wh, ww,
):
    """EXPERIMENTAL head-packed variant (interpret-verified; currently fails
    Mosaic layout inference on hardware — "unsupported shape cast" — see
    PERF.md): both attention dots run at full MXU width by
    block-diagonalising K and V over heads —
        S_all [TN, nh·TN] = Qn_all [TN, nh·hd_p] @ K_bd [nh·hd_p, nh·TN]
        out   [TN, nh·hd_p] = P_all [TN, nh·TN] @ V_bd [nh·TN, nh·hd_p]
    where K_bd/V_bd zero the cross-head blocks.  ~nh× more MACs than the
    per-head loop but ~8× better MXU utilisation at hd_p=16."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    A_p = nh * hd_p
    x = x_ref[:]                                    # [TN, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    q = qkv[:, :A_p]                                # [TN, nh·hd_p], head-major
    k = qkv[:, A_p : 2 * A_p]
    v = qkv[:, 2 * A_p :]

    # per-head L2 normalisation via segment sums over the head blocks
    d_head = jax.lax.broadcasted_iota(jnp.int32, (1, A_p), 1) // hd_p  # [1, A_p]

    def seg_norm(m):
        sq = m * m
        # sum within each head block: [TN, nh]
        sums = jnp.sum(sq.reshape(TN, nh, hd_p), axis=-1)
        inv = jax.lax.rsqrt(sums + 1e-24)            # [TN, nh]
        return m * jnp.repeat(inv, hd_p, axis=1)

    qn = seg_norm(q) * jnp.repeat(scale_ref[:], hd_p, axis=1)
    kn = seg_norm(k)

    # block-diagonal K over heads: [A_p, nh·TN]
    col_head = jax.lax.broadcasted_iota(jnp.int32, (A_p, nh * TN), 1) // TN
    row_head = jax.lax.broadcasted_iota(jnp.int32, (A_p, nh * TN), 0) // hd_p
    k_tile = jnp.broadcast_to(kn.T[:, None, :], (A_p, nh, TN)).reshape(A_p, nh * TN)
    k_bd = jnp.where(col_head == row_head, k_tile, 0.0)

    s_all = jnp.dot(qn.astype(x.dtype), k_bd.astype(x.dtype),
                    preferred_element_type=jnp.float32)      # [TN, nh·TN]
    s3 = s_all.reshape(TN, nh, TN) + bias_ref[:].transpose(1, 0, 2)  # bias [nh,TN,TN] -> [TN,nh,TN]

    if wh and ww:
        tok = jax.lax.broadcasted_iota(jnp.int32, (TN, 1, 1), 0)
        widx = (i * T + tok // N) % (wh * ww)
        row_gate = (widx // ww == wh - 1).astype(jnp.float32)
        col_gate = (widx % ww == ww - 1).astype(jnp.float32)
        shift = row_gate * mrow_ref[:][:, None, :] + col_gate * mcol_ref[:][:, None, :]
        s3 = s3 + shift

    s3 = s3 - jnp.max(s3, axis=-1, keepdims=True)
    e = jnp.exp(s3)
    p3 = e / jnp.sum(e, axis=-1, keepdims=True)
    p_all = p3.reshape(TN, nh * TN)

    # block-diagonal V: [nh·TN, A_p]
    row_head_v = jax.lax.broadcasted_iota(jnp.int32, (nh * TN, A_p), 0) // TN
    col_head_v = jax.lax.broadcasted_iota(jnp.int32, (nh * TN, A_p), 1) // hd_p
    v_tile = jnp.broadcast_to(v[None, :, :], (nh, TN, A_p)).reshape(nh * TN, A_p)
    v_bd = jnp.where(row_head_v == col_head_v, v_tile, 0.0)

    acc = jnp.dot(p_all.astype(x.dtype), v_bd.astype(x.dtype),
                  preferred_element_type=jnp.float32)        # [TN, A_p]
    proj = jnp.dot(acc.astype(wproj_ref.dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32)
    out_ref[:] = (proj + bproj_ref[0, :]).astype(out_ref.dtype)


def _attn_kernel(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, out_ref, *, T, N, D, nh, hd_p, wh, ww,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    TN = T * N
    x = x_ref[:]                                    # [TN, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :]

    if wh and ww:
        # per-row window gates: does the query's window sit in the last
        # grid row / column of its image?
        tok = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
        widx = (i * T + tok // N) % (wh * ww)
        row_gate = (widx // ww == wh - 1).astype(jnp.float32)   # [TN, 1]
        col_gate = (widx % ww == ww - 1).astype(jnp.float32)
        shift_mask = row_gate * mrow_ref[:] + col_gate * mcol_ref[:]
    else:
        shift_mask = None

    head_outs = []
    for h in range(nh):
        q = qkv[:, (0 * nh + h) * hd_p : (0 * nh + h) * hd_p + hd_p]
        k = qkv[:, (1 * nh + h) * hd_p : (1 * nh + h) * hd_p + hd_p]
        v = qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        s = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)  # [TN, TN]
        s = s * scale_ref[0, h] + bias_ref[h]
        if shift_mask is not None:
            s = s + shift_mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        head_outs.append(
            jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        )

    acc = jnp.concatenate(head_outs, axis=-1)       # [TN, nh·hd_p]
    proj = jnp.dot(
        acc.astype(wproj_ref.dtype), wproj_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = (proj + bproj_ref[0, :]).astype(out_ref.dtype)
