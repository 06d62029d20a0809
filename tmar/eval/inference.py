"""Inference paths: full-slice and overlapping tiled evaluation.

Mirrors reference testing/test_finetuned_model.py:
* full-slice (run_full_slice_eval :102-147): the generator pads H,W to
  multiples of 32 internally and crops back, so a 416² slice runs as one
  448²-padded forward — one jit bucket per eval shape.
* tiled (run_tiled_eval :150-235): overlapping tiles (default 64 px, stride
  32) batched through one jit'd forward, accumulated and averaged by
  coverage weight.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_inference_fn(generator, params) -> Callable[[np.ndarray], np.ndarray]:
    """Return a jit'd NHWC forward closure (one compile per input shape)."""

    @jax.jit
    def forward(x):
        return generator.apply({"params": params}, x)

    return lambda x: np.asarray(forward(jnp.asarray(x)))


def full_slice_eval(
    forward: Callable[[np.ndarray], np.ndarray],
    ct: np.ndarray,
) -> np.ndarray:
    """ct: [B, H, W, 1] in [-1,1] -> restored [B, H, W, 1]."""
    return forward(ct)


def _tile_positions(size: int, tile: int, stride: int) -> List[int]:
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile + 1, stride))
    if pos[-1] != size - tile:
        pos.append(size - tile)
    return pos


def tiled_eval(
    forward: Callable[[np.ndarray], np.ndarray],
    ct: np.ndarray,
    tile: int = 64,
    stride: int = 32,
    tile_batch: int = 64,
) -> np.ndarray:
    """Overlapping tiled inference with accumulation-weight averaging.

    ct: [B, H, W, 1].  All tiles share one (tile, tile) jit bucket; they are
    batched ``tile_batch`` at a time through ``forward``.
    """
    B, H, W, C = ct.shape
    rows = _tile_positions(H, tile, stride)
    cols = _tile_positions(W, tile, stride)

    out = np.zeros_like(ct, dtype=np.float64)
    weight = np.zeros((1, H, W, 1), dtype=np.float64)

    coords = [(r, c) for r in rows for c in cols]
    tiles = np.stack(
        [ct[b, r : r + tile, c : c + tile, :] for b in range(B) for (r, c) in coords]
    )
    results = []
    n = tiles.shape[0]
    pad = (-n) % tile_batch
    if pad:
        tiles = np.concatenate([tiles, np.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
    for i in range(0, tiles.shape[0], tile_batch):
        results.append(forward(tiles[i : i + tile_batch]))
    results = np.concatenate(results)[:n]

    k = 0
    for b in range(B):
        for r, c in coords:
            out[b, r : r + tile, c : c + tile, :] += results[k]
            k += 1
    for r, c in coords:
        weight[0, r : r + tile, c : c + tile, :] += 1.0
    return (out / weight).astype(np.float32)
