"""Scaled-cosine window attention (SwinV2-style), functional XLA path.

Semantics follow the reference WindowAttention (reference
models/generator/components/attention.py:70-101): L2-normalised q·kᵀ, a
learnable per-head logit scale clamped at ln(100) then exponentiated, a
learnable relative-position bias, an optional additive 0/-100 shift mask,
softmax, then attn·v.

This module is the *math*; parameter handling lives in
``tmar.nn.window_attention``.  A fused Pallas kernel for the hot path lives in
``tmar.ops.pallas_attention`` and is numerically interchangeable.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

LOGIT_SCALE_MAX = math.log(1.0 / 0.01)  # ln(100)


@lru_cache(maxsize=None)
def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """Pairwise relative-position index for an (win_h, win_w) window.

    Returns int32 [win_h*win_w, win_h*win_w] indexing a bias table of size
    (2*win_h-1)*(2*win_w-1).  Matches reference
    models/generator/components/attention.py:9-18.
    """
    coords = np.stack(np.meshgrid(np.arange(win_h), np.arange(win_w), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1).astype(np.int32)


def gather_rel_pos_bias(
    table: jnp.ndarray, index: np.ndarray, num_heads: int
) -> jnp.ndarray:
    """table [(2h-1)(2w-1), nh], index [N, N] -> bias [nh, N, N]."""
    n = index.shape[0]
    bias = table[index.reshape(-1)].reshape(n, n, num_heads)
    return bias.transpose(2, 0, 1)


def cosine_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    logit_scale: jnp.ndarray,
    rel_pos_bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    mask_components: Optional[tuple] = None,
) -> jnp.ndarray:
    """Scaled-cosine attention over windows.

    Args:
        q, k, v: [B_, nh, N, hd] where B_ = batch * num_windows, N = tokens
            per window.
        logit_scale: [nh, 1, 1] raw (log-domain) learnable scale.
        rel_pos_bias: [nh, N, N] additive bias (already gathered from table).
        mask: optional [nW, N, N] additive 0/-100 mask; B_ must be a multiple
            of nW, window j of image i uses mask[j].
        mask_components: optional (m_edge_row [N,N], m_edge_col [N,N], wh, ww)
            decomposed SW-MSA mask (tmar.ops.window.shift_mask_components) —
            memory-free alternative to ``mask`` (adds -200 where both differ,
            identical post-softmax).

    Returns:
        [B_, nh, N, hd] attention output (same dtype as v).
    """
    compute_dtype = q.dtype
    eps = 1e-12
    qn = q * (jnp.sqrt(jnp.sum(jnp.square(q).astype(jnp.float32), axis=-1, keepdims=True)) + eps).astype(compute_dtype) ** -1
    kn = k * (jnp.sqrt(jnp.sum(jnp.square(k).astype(jnp.float32), axis=-1, keepdims=True)) + eps).astype(compute_dtype) ** -1
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn, preferred_element_type=jnp.float32)
    scale = jnp.exp(jnp.clip(logit_scale.astype(jnp.float32), max=LOGIT_SCALE_MAX))
    attn = attn * scale[None]
    attn = attn + rel_pos_bias.astype(jnp.float32)[None]
    if mask_components is not None:
        m_row, m_col, wh, ww = mask_components
        B_, nh, N, _ = attn.shape
        attn = attn.reshape(B_ // (wh * ww), wh, ww, nh, N, N)
        row_gate = (jnp.arange(wh) == wh - 1).astype(jnp.float32)
        col_gate = (jnp.arange(ww) == ww - 1).astype(jnp.float32)
        attn = attn + row_gate[:, None, None, None, None] * jnp.asarray(m_row)
        attn = attn + col_gate[:, None, None, None] * jnp.asarray(m_col)
        attn = attn.reshape(B_, nh, N, N)
    elif mask is not None:
        B_, nh, N, _ = attn.shape
        nw = mask.shape[0]
        attn = attn.reshape(B_ // nw, nw, nh, N, N) + mask.astype(jnp.float32)[None, :, None]
        attn = attn.reshape(B_, nh, N, N)
    attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(compute_dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(compute_dtype)


def window_attention_math(
    x, wqkv, bqkv, logit_scale, bias, wproj, bproj, num_heads, mask_components=None
):
    """Complete window-attention block as a pure function (qkv proj ->
    cosine attention -> output proj).  Shared by the flax module's XLA path
    and the Pallas kernel's recompute-backward."""
    qkv = x @ wqkv
    if bqkv is not None:
        qkv = qkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = cosine_window_attention(
        split_heads(q, num_heads),
        split_heads(k, num_heads),
        split_heads(v, num_heads),
        logit_scale,
        bias,
        mask_components=mask_components,
    )
    out = merge_heads(out) @ wproj
    if bproj is not None:
        out = out + bproj
    return out


def merged_window_attention_math(
    x, wqkv, bqkv, logit_scale, bias, wproj, bproj, num_heads,
    merge_windows: int = 2, mask_components=None,
):
    """Window attention with ``merge_windows`` windows stacked per attention
    call and off-diagonal blocks masked to -1e9.

    Pure-XLA, fully differentiable.  Purpose: the per-window score tensors
    [.., N, N] with N = 64 pad their minor dim to 128 lanes on TPU — a 2x
    memory/bandwidth tax on every attention tensor in the backward pass
    (observed in XLA's OOM allocation dumps).  Merging m=2 windows makes the
    minor dim 128: no padding, at the cost of 2x redundant (masked) MACs.
    Numerically identical to the unmerged path (masked logits are -1e9, so
    the extra columns carry exp(<-900) ~ 0 weight).
    """
    B_, N, D = x.shape
    m = merge_windows
    nh = num_heads
    pad = (-B_) % m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, N, D), x.dtype)])
    Bp = x.shape[0]
    B2 = Bp // m
    mN = m * N
    compute_dtype = x.dtype

    xm = x.reshape(B2, mN, D)
    qkv = xm @ wqkv
    if bqkv is not None:
        qkv = qkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = split_heads(q, nh)
    k = split_heads(k, nh)
    v = split_heads(v, nh)

    eps = 1e-12
    qn = q * (jnp.sqrt(jnp.sum(jnp.square(q).astype(jnp.float32), axis=-1, keepdims=True)) + eps).astype(compute_dtype) ** -1
    kn = k * (jnp.sqrt(jnp.sum(jnp.square(k).astype(jnp.float32), axis=-1, keepdims=True)) + eps).astype(compute_dtype) ** -1
    attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn, preferred_element_type=jnp.float32)
    scale = jnp.exp(jnp.clip(logit_scale.astype(jnp.float32), max=LOGIT_SCALE_MAX))
    attn = attn * scale[None]

    # block-diagonal bias + off-diagonal -1e9 (mask is a trace-time constant;
    # the bias itself stays a traced parameter)
    blk = np.kron(np.eye(m, dtype=np.float32), np.ones((N, N), np.float32))
    offdiag = jnp.asarray((1.0 - blk) * -1e9)
    bias_m = jnp.tile(bias.astype(jnp.float32), (1, m, m)) + offdiag[None]
    attn = attn + bias_m[None]

    if mask_components is not None:
        m_row, m_col, wh, ww = mask_components
        nW = wh * ww
        g = np.arange(Bp) % nW
        rowgate = np.repeat((g // ww == wh - 1).astype(np.float32), N).reshape(B2, 1, mN, 1)
        colgate = np.repeat((g % ww == ww - 1).astype(np.float32), N).reshape(B2, 1, mN, 1)
        m_row_t = np.tile(np.asarray(m_row, np.float32), (m, m))
        m_col_t = np.tile(np.asarray(m_col, np.float32), (m, m))
        attn = attn + jnp.asarray(rowgate) * jnp.asarray(m_row_t)
        attn = attn + jnp.asarray(colgate) * jnp.asarray(m_col_t)

    attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(compute_dtype), v, preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    out = merge_heads(out) @ wproj
    if bproj is not None:
        out = out + bproj
    out = out.reshape(Bp, N, -1)
    return out[:B_] if pad else out


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B_, N, nh*hd] -> [B_, nh, N, hd]."""
    B_, N, C = x.shape
    return x.reshape(B_, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B_, nh, N, hd] -> [B_, N, nh*hd]."""
    B_, nh, N, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B_, N, nh * hd)
