"""Shared flax building blocks: MLP, DropPath, initialisers.

Initialisation follows the reference: trunc-normal(0.02) for transformer
linears, zero bias, LayerNorm (1, 0) (reference models/generator/ngswin.py:
140-148); convs use the DCGAN-style normal(0, 0.02) the trainers apply on top
(reference training/train_combined.py:207-217).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
conv_normal_init = nn.initializers.normal(stddev=0.02)


class Mlp(nn.Module):
    """Linear -> GELU -> (drop) -> Linear -> (drop), timm-style."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            name="fc2",
        )(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def layer_norm(dtype: Dtype = jnp.float32, name: Optional[str] = None) -> nn.LayerNorm:
    # torch LayerNorm eps=1e-5 (flax default 1e-6) — match torch for parity.
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)
