"""Fused post-norm residual FFN Pallas kernel.

Fuses the NSTB tail (reference transformer_blocks.py:114-120):
    y = x + LayerNorm1(attn_out)
    z = y + LayerNorm2(fc2(gelu(fc1(y))))
into one VMEM-resident kernel over token tiles.  The XLA path walks the
[B·N, D] activations through ~8 separate HBM round trips (2 norms in f32,
2 matmuls, gelu, 2 residual adds); here each token tile is read once
(x, attn_out) and written once (z).

LayerNorm statistics and the GELU run in f32 inside the kernel; matmuls hit
the MXU with f32 accumulation.  Differentiable via a custom VJP that
recomputes through the equivalent XLA function (same pattern as
tmar.ops.pallas_attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def ffn_math(x, attn_out, g1, b1, w1, bb1, w2, bb2, g2, b2, eps=1e-5):
    """Pure-XLA equivalent: post-norm residual FFN."""

    def ln(v, g, b):
        v32 = v.astype(jnp.float32)
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mu), axis=-1, keepdims=True)
        return ((v32 - mu) * jax.lax.rsqrt(var + eps)) * g + b

    y = x.astype(jnp.float32) + ln(attn_out, g1, b1)
    h = jax.nn.gelu(y @ w1.astype(jnp.float32) + bb1, approximate=False)
    z = y + ln(h @ w2.astype(jnp.float32) + bb2, g2, b2)
    return z.astype(x.dtype)


def fused_residual_ffn(
    x: jnp.ndarray,
    attn_out: jnp.ndarray,
    ln1_scale: jnp.ndarray,
    ln1_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    eps: float = 1e-5,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x, attn_out: [M, D] token tiles -> z [M, D].

    Computes x + LN1(attn_out) then the post-norm FFN residual, fused.
    """
    args = (x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale, ln2_bias)

    @jax.custom_vjp
    def op(x, attn_out, g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return _forward(
            x, attn_out, g1, bb1, w1, bw1, w2, bw2, g2, bb2,
            eps=eps, block_rows=block_rows, interpret=interpret,
        )

    def math_fn(xx, ao, g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return ffn_math(xx, ao, g1, bb1, w1, bw1, w2, bw2, g2, bb2, eps=eps)

    def op_fwd(*a):
        # op_fwd only runs under differentiation: use the XLA math as the
        # primal there (training stays pure-XLA, no pallas+recompute tax)
        return math_fn(*a), a

    def op_bwd(res, g):
        x = res[0]
        _, vjp = jax.vjp(math_fn, *res)
        return vjp(g.astype(x.dtype))

    op.defvjp(op_fwd, op_bwd)
    return op(*args)


def _forward(
    x, attn_out, g1, bb1, w1, bw1, w2, bw2, g2, bb2,
    *, eps, block_rows, interpret,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, D = x.shape
    H = w1.shape[1]
    R = min(block_rows, M)
    pad = (-M) % R
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)])
        attn_out = jnp.concatenate([attn_out, jnp.zeros((pad, D), attn_out.dtype)])
    Mp = x.shape[0]

    kernel = functools.partial(_ffn_kernel, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // R,),
        in_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        interpret=interpret,
    )(
        x, attn_out,
        g1.reshape(1, D).astype(jnp.float32), bb1.reshape(1, D).astype(jnp.float32),
        w1, bw1.reshape(1, H).astype(jnp.float32),
        w2, bw2.reshape(1, D).astype(jnp.float32),
        g2.reshape(1, D).astype(jnp.float32), bb2.reshape(1, D).astype(jnp.float32),
    )
    return out[:M] if pad else out


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7)
    — Mosaic has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_approx(x * 0.7071067811865476))


def _ffn_kernel(x_ref, ao_ref, g1_ref, b1_ref, w1_ref, bw1_ref, w2_ref, bw2_ref,
                g2_ref, b2_ref, out_ref, *, eps):
    def ln(v32, g_ref, b_ref):
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mu), axis=-1, keepdims=True)
        return (v32 - mu) * jax.lax.rsqrt(var + eps) * g_ref[0, :] + b_ref[0, :]

    y = x_ref[:].astype(jnp.float32) + ln(ao_ref[:].astype(jnp.float32), g1_ref, b1_ref)
    h = jnp.dot(y.astype(w1_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_exact(h + bw1_ref[0, :])
    o = jnp.dot(h.astype(w2_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32)
    z = y + ln(o + bw2_ref[0, :], g2_ref, b2_ref)
    out_ref[:] = z.astype(out_ref.dtype)
