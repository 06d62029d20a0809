"""Finite-difference image gradients with replicate padding.

Matches the reference's forward differences (reference
losses/gan_losses.py:149-168): dx = x[..., 1:] - x[..., :-1] padded back to the
original size by replicating the last column/row of the *difference* — i.e.
the final column of grad_x equals its second-to-last column (torch
``F.pad(mode='replicate')`` on the diff tensor).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def image_gradients(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, C] -> (grad_x, grad_y), both [B, H, W, C].

    grad_x is the horizontal (W-axis) difference, grad_y the vertical (H-axis),
    matching the reference's (dx over W, dy over H) convention.
    """
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    grad_x = jnp.concatenate([dx, dx[:, :, -1:, :]], axis=2)
    grad_y = jnp.concatenate([dy, dy[:, -1:, :, :]], axis=1)
    return grad_x, grad_y
