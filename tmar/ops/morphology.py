"""Morphological dilation via max-reduce-window.

Equivalent of the reference's max-pool dilation (reference
losses/gan_losses.py:67-84): dilation of a binary mask with a square
structuring element of radius r == max_pool2d(kernel 2r+1, stride 1, pad r).
On TPU this lowers to a single fused ``lax.reduce_window``.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def dilate_mask(mask: jnp.ndarray, radius: int = 5) -> jnp.ndarray:
    """Dilate a [B, H, W, C] (or [B, H, W]) mask with a (2r+1)² max window."""
    if radius == 0:
        return mask
    k = 2 * radius + 1
    squeeze = mask.ndim == 3
    if squeeze:
        mask = mask[..., None]
    out = lax.reduce_window(
        mask,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius), (0, 0)),
    )
    # -inf padding never wins for masks in {0,1}; clamp for safety with floats.
    out = jnp.maximum(out, 0.0)
    return out[..., 0] if squeeze else out
