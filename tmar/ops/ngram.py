"""N-Gram context primitives.

The reference's novelty (reference
models/generator/components/window_utils.py:43-90) needs two non-standard
pieces, re-expressed here as static slice/concat so XLA fuses them:

1. ``seq_refl_win_pad`` — "sequence-reflective" asymmetric padding of the
   per-window unigram grid.  Forward pads bottom/right with the block of
   interior rows/cols [L-n : L-1] (in original order); backward pads top/left
   with rows/cols [1 : n].  For the canonical ngram=2 this is exactly
   single-element reflect padding.  Derived from the in-place slice
   assignments at reference window_utils.py:43-61.

2. ``sliding_patches`` — all n×n sliding blocks of the padded grid, the
   XLA-native equivalent of the reference's double ``unfold``
   (window_utils.py:63-67).  Returns [B, wh, ww, n, n, C] where patch (i, j)
   covers rows i..i+n-1, cols j..j+n-1 of the padded input.
"""

from __future__ import annotations

import jax.numpy as jnp


def seq_refl_win_pad(x: jnp.ndarray, ngram: int, back: bool = False) -> jnp.ndarray:
    """Pad [B, H, W, C] by (ngram-1) on bottom/right (forward) or top/left (back)."""
    n = ngram
    if n == 1:
        return x
    if not back:
        x = jnp.concatenate([x, x[:, -n:-1, :, :]], axis=1)
        x = jnp.concatenate([x, x[:, :, -n:-1, :]], axis=2)
    else:
        x = jnp.concatenate([x[:, 1:n, :, :], x], axis=1)
        x = jnp.concatenate([x[:, :, 1:n, :], x], axis=2)
    return x


def sliding_patches(x: jnp.ndarray, ngram: int) -> jnp.ndarray:
    """[B, H+n-1, W+n-1, C] -> [B, H, W, n, n, C] of n×n sliding blocks."""
    n = ngram
    B, Hp, Wp, C = x.shape
    H, W = Hp - n + 1, Wp - n + 1
    rows = []
    for di in range(n):
        cols = []
        for dj in range(n):
            cols.append(x[:, di : di + H, dj : dj + W, :])
        rows.append(jnp.stack(cols, axis=3))
    return jnp.stack(rows, axis=3)  # [B, H, W, n(di), n(dj), C]
