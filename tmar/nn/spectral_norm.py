"""Spectral normalisation as functional state under jit.

Torch's ``spectral_norm`` hook (used on every discriminator conv, reference
models/discriminator/ms_patchgan.py:42-58) keeps persistent ``u``/``v``
power-iteration vectors updated on each training forward.  Here the vectors
live in a flax variable collection ``"sn"`` threaded through the jit'd train
step (mutable during training, frozen at eval) — replicated across the data
mesh like parameters, so no cross-replica syncing is needed (SURVEY.md §5.8).

Semantics match torch: W is reshaped to [out, fan_in]; one power iteration
v ← normalize(Wᵀu), u ← normalize(Wv) per training forward; σ = uᵀWv; the
conv uses W/σ.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tmar.nn.layers import conv_normal_init


def _l2_normalize(x, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x)) + eps)


class SNConv(nn.Module):
    """Conv2d with spectral normalisation (NHWC)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            conv_normal_init,
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        # Flatten in torch's [out, in, kh, kw] -> [out, in*kh*kw] order so
        # power-iteration vectors imported from torch checkpoints align
        # column-for-column (tmar.checkpoint.torch_import).
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
        fan_in = w_mat.shape[1]

        u_var = self.variable(
            "sn", "u", lambda: _l2_normalize(jax.random.normal(jax.random.PRNGKey(0), (self.features,)))
        )
        v_var = self.variable(
            "sn", "v", lambda: _l2_normalize(jax.random.normal(jax.random.PRNGKey(1), (fan_in,)))
        )

        u, v = u_var.value, v_var.value
        if update_sn:
            v = _l2_normalize(jax.lax.stop_gradient(w_mat).T @ u)
            u = _l2_normalize(jax.lax.stop_gradient(w_mat) @ v)
            u_var.value = u
            v_var.value = v
        sigma = jnp.einsum("i,ij,j->", u, w_mat, v)
        kernel_sn = (kernel / sigma).astype(self.dtype)

        strides = (
            (self.strides, self.strides) if isinstance(self.strides, int) else self.strides
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel_sn,
            window_strides=strides,
            padding=self.padding if not isinstance(self.padding, str) else self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
