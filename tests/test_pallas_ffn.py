"""Fused residual-FFN kernel vs XLA math, values and gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from tmar.ops.pallas_ffn import ffn_math, fused_residual_ffn
import pytest


def _args(rng, M=96, D=32, H=64):
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2)
    return dict(
        x=f(M, D), attn_out=f(M, D),
        ln1_scale=1 + 0.1 * f(D), ln1_bias=0.1 * f(D),
        w1=f(D, H), b1=0.1 * f(H), w2=f(H, D), b2=0.1 * f(D),
        ln2_scale=1 + 0.1 * f(D), ln2_bias=0.1 * f(D),
    )


def test_ffn_kernel_matches_math(rng):
    a = _args(rng)
    got = fused_residual_ffn(**a, block_rows=32, interpret=True)
    ref = ffn_math(a["x"], a["attn_out"], a["ln1_scale"], a["ln1_bias"],
                   a["w1"], a["b1"], a["w2"], a["b2"], a["ln2_scale"], a["ln2_bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ffn_kernel_ragged_rows(rng):
    a = _args(rng, M=70)  # not divisible by block_rows
    got = fused_residual_ffn(**a, block_rows=32, interpret=True)
    ref = ffn_math(a["x"], a["attn_out"], a["ln1_scale"], a["ln1_bias"],
                   a["w1"], a["b1"], a["w2"], a["b2"], a["ln2_scale"], a["ln2_bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_ffn_kernel_gradients(rng):
    a = _args(rng, M=64)

    def loss_fused(x, w1, g2):
        return jnp.sum(
            fused_residual_ffn(
                x, a["attn_out"], a["ln1_scale"], a["ln1_bias"], w1, a["b1"],
                a["w2"], a["b2"], g2, a["ln2_bias"], block_rows=32, interpret=True,
            ) ** 2
        )

    def loss_ref(x, w1, g2):
        return jnp.sum(
            ffn_math(x, a["attn_out"], a["ln1_scale"], a["ln1_bias"], w1, a["b1"],
                     a["w2"], a["b2"], g2, a["ln2_bias"]) ** 2
        )

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(a["x"], a["w1"], a["ln2_scale"])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(a["x"], a["w1"], a["ln2_scale"])
    for u, v in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-4, rtol=1e-3)


def test_fused_ffn_pallas_backward_matches_xla():
    """backward="pallas" (fused recompute backward kernel) must match the
    XLA jax.vjp of the math path for all ten cotangents."""
    import jax

    from tmar.ops.pallas_ffn import ffn_math, fused_residual_ffn

    rng = np.random.default_rng(3)
    M, D, H = 300, 32, 64   # non-multiple-of-block row count (pad path)
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    ao = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1 + 1)
    b1 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32) * 0.1)
    bb1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32) * 0.1)
    bb2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1 + 1)
    b2 = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    args = (x, ao, g1, b1, w1, bb1, w2, bb2, g2, b2)

    def loss_pallas(*a):
        out = fused_residual_ffn(
            *a, block_rows=128, backward="pallas", interpret=True
        )
        return jnp.sum(out * jnp.sin(out))

    def loss_math(*a):
        out = ffn_math(*a)
        return jnp.sum(out * jnp.sin(out))

    g_pallas = jax.grad(loss_pallas, argnums=tuple(range(10)))(*args)
    g_math = jax.grad(loss_math, argnums=tuple(range(10)))(*args)
    for i, (a, b) in enumerate(zip(g_pallas, g_math)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"cotangent {i}",
        )
