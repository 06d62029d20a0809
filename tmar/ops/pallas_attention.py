"""Fused cosine window-attention Pallas TPU kernel.

Fuses the whole per-window attention pipeline of WindowAttention (reference
models/generator/components/attention.py:70-101) into one VMEM-resident
kernel: qkv projection -> L2 normalisation -> scaled-cosine scores ->
relative-position bias (+ decomposed SW-MSA mask) -> softmax -> value matmul
-> output projection.  The XLA path materialises the [B_, nh, N, N] score
tensor in HBM between ops; here scores live and die in VMEM, so HBM traffic
drops to the x/out tensors plus the (small) parameters.

Head dim is zero-padded to a lane-friendly multiple inside the caller —
padding q/k with zeros leaves q·kᵀ unchanged, and the padded rows of the
output projection are zero, so numerics are identical to the XLA path
(tested in tests/test_pallas_attention.py).

Grid: one step per tile of T windows; each step processes all heads.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmar.ops.attention import LOGIT_SCALE_MAX


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


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
    windows_per_step: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused window attention.

    Args:
        x: [B_, N, D] window tokens (B_ = batch·wh·ww).
        wqkv: [D, 3·A] fused qkv weight (A = nh·hd), bqkv: [3·A] or None.
        logit_scale: [nh, 1, 1] log-domain scale.
        bias: [nh, N, N] relative-position bias (pre-gathered, f32).
        wproj: [A, D], bproj: [D].
        num_heads: nh.
        mask_components: optional (m_row [N,N], m_col [N,N], wh, ww).
        windows_per_step: grid tile size (must divide B_ after padding).

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

    # --- repack weights head-major with padded head dim (zero pad) ----------
    # wqkv columns ordered (3, nh, hd) -> [3, nh, D, hd] -> pad hd -> fold to
    # [D, 3*nh*hd_p] so in-kernel slices are static.
    wq = wqkv.reshape(D, 3, nh, hd).transpose(1, 2, 0, 3)  # [3, nh, D, hd]
    wq = jnp.pad(wq, ((0, 0), (0, 0), (0, 0), (0, hd_p - hd)))
    w_packed = wq.transpose(2, 0, 1, 3).reshape(D, 3 * nh * hd_p)
    if bqkv is not None:
        bq = bqkv.reshape(3, nh, hd)
        bq = jnp.pad(bq, ((0, 0), (0, 0), (0, hd_p - hd))).reshape(3 * nh * hd_p)
    else:
        bq = jnp.zeros((3 * nh * hd_p,), x.dtype)
    # wproj rows ordered (nh, hd) -> pad to (nh, hd_p)
    wp = wproj.reshape(nh, hd, D)
    wp = jnp.pad(wp, ((0, 0), (0, hd_p - hd), (0, 0))).reshape(nh * hd_p, D)

    scale_vec = jnp.exp(
        jnp.clip(logit_scale.reshape(nh).astype(jnp.float32), max=LOGIT_SCALE_MAX)
    )

    if mask_components is not None:
        m_row, m_col, wh, ww = mask_components
        m_row = jnp.asarray(m_row, jnp.float32)
        m_col = jnp.asarray(m_col, jnp.float32)
    else:
        m_row = jnp.zeros((N, N), jnp.float32)
        m_col = jnp.zeros((N, N), jnp.float32)
        wh = ww = 0  # no masking

    T = windows_per_step
    pad_windows = (-B_) % T
    if pad_windows:
        x = jnp.concatenate([x, jnp.zeros((pad_windows, N, D), x.dtype)])
    Bp = x.shape[0]
    x2 = x.reshape(Bp * N, D)

    grid = (Bp // T,)
    out_dtype = x.dtype

    kernel = functools.partial(
        _attn_kernel, T=T, N=N, D=D, nh=nh, hd=hd, hd_p=hd_p, wh=wh, ww=ww,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T * N, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * nh * hd_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * nh * hd_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh * hd_p, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T * N, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * N, D), out_dtype),
        interpret=interpret,
    )(
        x2,
        w_packed.astype(out_dtype),
        bq.reshape(1, -1).astype(out_dtype),
        scale_vec.reshape(1, nh),
        bias.astype(jnp.float32),
        wp.astype(out_dtype),
        bproj.reshape(1, D).astype(out_dtype),
        m_row,
        m_col,
    )
    out = out.reshape(Bp, N, D)
    return out[:B_] if pad_windows else out


def _attn_kernel(
    x_ref, wqkv_ref, bqkv_ref, scale_ref, bias_ref, wproj_ref, bproj_ref,
    mrow_ref, mcol_ref, out_ref, *, T, N, D, nh, hd, hd_p, wh, ww,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    x = x_ref[:]                                   # [T·N, D]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0, :].astype(jnp.float32)  # [T·N, 3·nh·hd_p]

    acc = jnp.zeros((T * N, nh * hd_p), dtype=jnp.float32)
    for h in range(nh):
        q = qkv[:, (0 * nh + h) * hd_p : (0 * nh + h) * hd_p + hd_p]
        k = qkv[:, (1 * nh + h) * hd_p : (1 * nh + h) * hd_p + hd_p]
        v = qkv[:, (2 * nh + h) * hd_p : (2 * nh + h) * hd_p + hd_p]
        qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
        kn = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-24)
        scale = scale_ref[0, h]
        bias_h = bias_ref[h]                        # [N, N] f32
        outs = []
        for t in range(T):
            qt = qn[t * N : (t + 1) * N, :]
            kt = kn[t * N : (t + 1) * N, :]
            vt = v[t * N : (t + 1) * N, :]
            s = jnp.dot(qt, kt.T, preferred_element_type=jnp.float32) * scale
            s = s + bias_h
            if wh and ww:
                widx = i * T + t
                # window grid position (row, col) within its image
                wpos = widx % (wh * ww)
                r = wpos // ww
                c = wpos % ww
                s = s + jnp.where(r == wh - 1, 1.0, 0.0) * mrow_ref[:]
                s = s + jnp.where(c == ww - 1, 1.0, 0.0) * mcol_ref[:]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jnp.dot(p.astype(vt.dtype), vt, preferred_element_type=jnp.float32))
        head_out = jnp.concatenate(outs, axis=0)    # [T·N, hd_p]
        acc = acc.at[:, h * hd_p : (h + 1) * hd_p].set(head_out)

    proj = jnp.dot(acc.astype(wproj_ref.dtype), wproj_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (proj + bproj_ref[0, :].astype(jnp.float32)).astype(out_ref.dtype)
