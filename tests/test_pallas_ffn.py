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
