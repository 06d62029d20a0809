"""Window partitioning utilities for shifted-window attention.

Pure layout ops (reshape/transpose/roll) — free under XLA fusion.  Semantics
mirror the reference's window helpers (reference
models/generator/components/window_utils.py:155-181) and the shifted-window
mask construction (reference
models/generator/components/transformer_blocks.py:63-81), but operate on NHWC
arrays with static Python-int shapes so everything stays traceable under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] -> ([B*wh*ww, ws, ws, C], (wh, ww)).

    H and W must be multiples of ``window_size`` (static shapes under jit).
    """
    B, H, W, C = x.shape
    wh, ww = H // window_size, W // window_size
    x = x.reshape(B, wh, window_size, ww, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (wh, ww)


def window_unpartition(windows: jnp.ndarray, num_windows: Tuple[int, int]) -> jnp.ndarray:
    """[B*wh*ww, ws, ws, C] -> [B, H, W, C]."""
    wh, ww = num_windows
    ws = windows.shape[1]
    C = windows.shape[-1]
    B = windows.shape[0] // (wh * ww)
    x = windows.reshape(B, wh, ww, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, wh * ws, ww * ws, C)


def cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Roll spatial dims of [B, H, W, C] by ``-shift`` (SW-MSA cyclic shift)."""
    if shift == 0:
        return x
    return jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))


def reverse_cyclic_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    if shift == 0:
        return x
    return jnp.roll(x, shift=(shift, shift), axis=(1, 2))


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad H, W (bottom/right) of [B, H, W, C] to a multiple.

    Mirrors the reference's ``forward_size_norm`` (reference
    models/generator/ngswin.py:158-164): pad bottom/right, crop back after.
    """
    B, H, W, C = x.shape
    pad_h = (-H) % multiple
    pad_w = (-W) % multiple
    if pad_h == 0 and pad_w == 0:
        return x, (H, W)
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return x, (H, W)


def shift_mask_components(window_size: int, shift: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decomposed SW-MSA mask: (m_edge_row, m_edge_col), each [N, N].

    The full per-window mask factorises: window (r, c) of a (wh, ww) grid has
    mask ≈ [r == wh-1]·m_edge_row + [c == ww-1]·m_edge_col (the only
    difference from the reference's single -100 is -200 where both regions
    differ — identical after softmax).  Region label = 3·row_band + col_band
    (see reference transformer_blocks.py:63-81); only the last window
    row/column straddles a band boundary, so interior windows are all-zero.
    This avoids materialising the [wh·ww, N, N] mask (64 MB at 512² eval).
    """
    ws = window_size
    n = ws * ws
    # token i belongs to row band 1 if its in-window row < ws - shift else 2
    row_band = (np.arange(ws) >= ws - shift).astype(np.int32)
    col_band = row_band
    tok_row = np.repeat(row_band, ws)          # [N] by in-window row
    tok_col = np.tile(col_band, ws)            # [N] by in-window col
    m_row = np.where(tok_row[:, None] != tok_row[None, :], -100.0, 0.0)
    m_col = np.where(tok_col[:, None] != tok_col[None, :], -100.0, 0.0)
    return m_row.astype(np.float32), m_col.astype(np.float32)


def shift_attn_mask(num_patches: Tuple[int, int], window_size: int, shift: int) -> np.ndarray:
    """Build the SW-MSA additive mask: [wh*ww, ws*ws, ws*ws] float32 (0 / -100).

    Computed in numpy at trace time (shapes are static), so it folds into the
    compiled program as a constant.  Matches the reference mask construction
    (reference models/generator/components/transformer_blocks.py:63-81).
    """
    ph, pw = num_patches
    img_mask = np.zeros((ph, pw), dtype=np.float32)
    cnt = 0
    for h in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
        for w in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
            img_mask[h, w] = cnt
            cnt += 1
    wh, ww = ph // window_size, pw // window_size
    mask_windows = (
        img_mask.reshape(wh, window_size, ww, window_size)
        .transpose(0, 2, 1, 3)
        .reshape(wh * ww, window_size * window_size)
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
