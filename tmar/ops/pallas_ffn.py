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
    backward: Optional[str] = None,
) -> jnp.ndarray:
    """x, attn_out: [M, D] token tiles -> z [M, D].

    Computes x + LN1(attn_out) then the post-norm FFN residual, fused.

    ``backward``: None/"auto" = under differentiation BOTH primal and
    backward run as the pure-XLA math (the r2-measured default for
    training); "pallas" = the Pallas forward stays the primal and the
    backward runs the fused recompute kernel (_ffn_bwd_kernel) — one
    kernel emits all ten cotangents instead of the ~10-XLA-kernel chain
    per block, for the kernel-count-bound train step (PERF.md)."""
    args = (x, attn_out, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale, ln2_bias)

    @jax.custom_vjp
    def op(x, attn_out, g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return _forward(
            x, attn_out, g1, bb1, w1, bw1, w2, bw2, g2, bb2,
            eps=eps, block_rows=block_rows, interpret=interpret,
        )

    def math_fn(xx, ao, g1, bb1, w1, bw1, w2, bw2, g2, bb2):
        return ffn_math(xx, ao, g1, bb1, w1, bw1, w2, bw2, g2, bb2, eps=eps)

    if backward == "pallas":
        def op_fwd(*a):
            return (
                _forward(
                    *a, eps=eps, block_rows=block_rows, interpret=interpret
                ),
                a,
            )

        def op_bwd(res, g):
            return _backward(
                *res, g, eps=eps, block_rows=block_rows, interpret=interpret
            )
    else:
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


def _backward(
    x, attn_out, g1, bb1, w1, bw1, w2, bw2, g2, bb2, g,
    *, eps, block_rows, interpret,
):
    """Fused recompute backward: ONE kernel emits all ten cotangents.

    Recomputes the forward intermediates per row tile (y, u, h, o, both LN
    stats) exactly as the forward kernel does, then runs the standard
    post-norm chain rule: LN2 backward -> fc2 grads -> exact-GELU
    derivative -> fc1 grads -> LN1 backward.  Parameter cotangents
    accumulate across grid steps (pl.when zero-init, f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, D = x.shape
    H = w1.shape[1]
    R = min(block_rows, M)
    pad = (-M) % R
    g = g.astype(x.dtype)
    if pad:
        zrow = jnp.zeros((pad, D), x.dtype)
        x = jnp.concatenate([x, zrow])
        attn_out = jnp.concatenate([attn_out, zrow.astype(attn_out.dtype)])
        g = jnp.concatenate([g, zrow])
    Mp = x.shape[0]

    c0 = lambda i: (0, 0)  # noqa: E731
    kernel = functools.partial(_ffn_bwd_kernel, eps=eps)
    outs = pl.pallas_call(
        kernel,
        grid=(Mp // R,),
        in_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), c0, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, D), x.dtype),
            jax.ShapeDtypeStruct((Mp, D), attn_out.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
    )(
        x, attn_out, g,
        jnp.asarray(g1).reshape(1, D).astype(jnp.float32),
        jnp.asarray(bb1).reshape(1, D).astype(jnp.float32),
        w1,
        jnp.asarray(bw1).reshape(1, H).astype(jnp.float32),
        w2,
        jnp.asarray(bw2).reshape(1, D).astype(jnp.float32),
        jnp.asarray(g2).reshape(1, D).astype(jnp.float32),
        jnp.asarray(bb2).reshape(1, D).astype(jnp.float32),
    )
    dx, dao, dg1, dbb1, dw1, dbw1, dw2, dbw2, dg2, dbb2 = outs
    if pad:
        dx, dao = dx[:M], dao[:M]
    return (
        dx,
        dao,
        dg1.reshape(jnp.shape(g1)).astype(jnp.asarray(g1).dtype),
        dbb1.reshape(jnp.shape(bb1)).astype(jnp.asarray(bb1).dtype),
        dw1.astype(w1.dtype),
        dbw1.reshape(jnp.shape(bw1)).astype(jnp.asarray(bw1).dtype),
        dw2.astype(w2.dtype),
        dbw2.reshape(jnp.shape(bw2)).astype(jnp.asarray(bw2).dtype),
        dg2.reshape(jnp.shape(g2)).astype(jnp.asarray(g2).dtype),
        dbb2.reshape(jnp.shape(bb2)).astype(jnp.asarray(bb2).dtype),
    )


def _ffn_bwd_kernel(
    x_ref, ao_ref, g_ref, g1_ref, b1_ref, w1_ref, bw1_ref, w2_ref, bw2_ref,
    g2_ref, b2_ref,
    dx_ref, dao_ref, dg1_ref, dbb1_ref, dw1_ref, dbw1_ref, dw2_ref, dbw2_ref,
    dg2_ref, dbb2_ref, *, eps,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        dbb1_ref[:] = jnp.zeros_like(dbb1_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dbw1_ref[:] = jnp.zeros_like(dbw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dbw2_ref[:] = jnp.zeros_like(dbw2_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        dbb2_ref[:] = jnp.zeros_like(dbb2_ref)

    cd = x_ref.dtype

    def ln_stats(v32):
        mu = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v32 - mu), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
        n = (v32 - mu) * r
        return n, r

    # ---- recompute the forward (identical op sequence to _ffn_kernel) ----
    ao32 = ao_ref[:].astype(jnp.float32)
    n1, r1 = ln_stats(ao32)
    y = x_ref[:].astype(jnp.float32) + (n1 * g1_ref[0, :] + b1_ref[0, :])
    yc = y.astype(cd)
    u = jnp.dot(yc, w1_ref[:], preferred_element_type=jnp.float32) + bw1_ref[0, :]
    h = _gelu_exact(u)
    hc = h.astype(cd)
    o = jnp.dot(hc, w2_ref[:], preferred_element_type=jnp.float32) + bw2_ref[0, :]
    n2, r2 = ln_stats(o)

    # ---- backward chain ------------------------------------------------
    dz = g_ref[:].astype(jnp.float32)

    def ln_bwd(dout, n, r, g_row, dg_ref, db_ref):
        dn = dout * g_row
        dg_ref[:] += jnp.sum(dout * n, axis=0, keepdims=True)
        db_ref[:] += jnp.sum(dout, axis=0, keepdims=True)
        return r * (
            dn
            - jnp.mean(dn, axis=-1, keepdims=True)
            - n * jnp.mean(dn * n, axis=-1, keepdims=True)
        )

    do = ln_bwd(dz, n2, r2, g2_ref[0, :], dg2_ref, dbb2_ref)
    dbw2_ref[:] += jnp.sum(do, axis=0, keepdims=True)
    doc = do.astype(cd)
    dh = jax.lax.dot_general(           # do @ w2ᵀ : contract over D
        doc, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_ref[:] += jax.lax.dot_general(  # hᵀ @ do : contract over rows
        hc, doc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # exact-GELU derivative: Φ(u) + u·φ(u)
    phi = jnp.exp(-0.5 * u * u) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf_approx(u * 0.7071067811865476))
    du = dh * (cdf + u * phi)
    dbw1_ref[:] += jnp.sum(du, axis=0, keepdims=True)
    duc = du.astype(cd)
    dy_ffn = jax.lax.dot_general(       # du @ w1ᵀ : contract over H
        duc, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1_ref[:] += jax.lax.dot_general(  # yᵀ @ du : contract over rows
        yc, duc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dy = dz + dy_ffn
    dx_ref[:] = dy.astype(dx_ref.dtype)
    dao = ln_bwd(dy, n1, r1, g1_ref[0, :], dg1_ref, dbb1_ref)
    dao_ref[:] = dao.astype(dao_ref.dtype)


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
