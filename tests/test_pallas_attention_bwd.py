"""Gradient parity: the hand-written Pallas backward kernel vs jax.vjp of
the pure XLA window-attention math, for every cotangent (x, wqkv, bqkv,
logit_scale, bias table gather input, wproj, bproj)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmar.ops.attention import window_attention_math
from tmar.ops.pallas_attention import fused_window_attention
from tmar.ops.window import shift_mask_components


def _make_inputs(B_, N, D, nh, hd, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = nh * hd
    x = jnp.asarray(rng.normal(size=(B_, N, D)).astype(np.float32), dtype)
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * A)).astype(np.float32) * 0.1, dtype)
    bqkv = jnp.asarray(rng.normal(size=(3 * A,)).astype(np.float32) * 0.1, dtype)
    ls = jnp.asarray(rng.uniform(0.5, 2.3, size=(nh, 1, 1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nh, N, N)).astype(np.float32) * 0.2)
    wproj = jnp.asarray(rng.normal(size=(A, D)).astype(np.float32) * 0.1, dtype)
    bproj = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1, dtype)
    return x, wqkv, bqkv, ls, bias, wproj, bproj


def _grads(fn, args, g):
    out, vjp = jax.vjp(fn, *args)
    return out, vjp(g)


@pytest.mark.parametrize("mask", [False, True])
@pytest.mark.parametrize("nh,hd", [(6, 10), (4, 16)])
def test_fused_backward_matches_xla_vjp(mask, nh, hd):
    N, D = 64, 64
    wh = ww = 4
    B_ = 2 * wh * ww  # batch 2 images of 4x4 windows
    args = _make_inputs(B_, N, D, nh, hd)
    mc = (*shift_mask_components(8, 4), wh, ww) if mask else None

    g = jnp.asarray(np.random.default_rng(1).normal(size=(B_, N, D)).astype(np.float32))

    ref_out, ref_grads = _grads(
        lambda *a: window_attention_math(*a, num_heads=nh, mask_components=mc),
        args, g,
    )
    pal_out, pal_grads = _grads(
        lambda *a: fused_window_attention(
            *a, num_heads=nh, mask_components=mc,
            interpret=True, backward="pallas",
        ),
        args, g,
    )
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out), atol=2e-4)
    names = ["dx", "dwqkv", "dbqkv", "dlogit_scale", "dbias", "dwproj", "dbproj"]
    for name, pg, rg in zip(names, pal_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(rg), atol=5e-4, rtol=5e-3,
            err_msg=f"cotangent {name} mismatch",
        )


def test_fused_backward_padded_windows():
    """B_ not a multiple of the kernel's windows-per-step: zero-padded
    windows must contribute nothing to any gradient."""
    N, D, nh, hd = 64, 64, 6, 10
    B_ = 3  # backward T = 256//64 = 4 > 3 -> padding path
    args = _make_inputs(B_, N, D, nh, hd, seed=2)
    g = jnp.asarray(np.random.default_rng(3).normal(size=(B_, N, D)).astype(np.float32))
    _, ref_grads = _grads(
        lambda *a: window_attention_math(*a, num_heads=nh), args, g
    )
    _, pal_grads = _grads(
        lambda *a: fused_window_attention(
            *a, num_heads=nh, interpret=True, backward="pallas"
        ),
        args, g,
    )
    for pg, rg in zip(pal_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(rg), atol=5e-4, rtol=5e-3)


def test_fused_backward_under_jit_and_grad_scalar_loss():
    """End-to-end: scalar loss through the fused op under jit(grad(...))."""
    N, D, nh, hd = 64, 64, 4, 16
    B_ = 8
    args = _make_inputs(B_, N, D, nh, hd, seed=4)

    def loss_pal(x, wqkv):
        y = fused_window_attention(
            x, wqkv, args[2], args[3], args[4], args[5], args[6],
            num_heads=nh, interpret=True, backward="pallas",
        )
        return jnp.mean(y * y)

    def loss_ref(x, wqkv):
        y = window_attention_math(
            x, wqkv, args[2], args[3], args[4], args[5], args[6], num_heads=nh
        )
        return jnp.mean(y * y)

    gp = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))(args[0], args[1])
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(args[0], args[1])
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-3)


def test_fused_backward_small_windows_blockdiag():
    """N=4 (n-gram-sized windows) routes to the blockdiag backward kernel;
    gradients must still match the XLA vjp."""
    N, D, nh, hd = 4, 16, 2, 8
    B_ = 96
    args = _make_inputs(B_, N, D, nh, hd, seed=5)
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(B_, N, D)).astype(np.float32)
    )
    ref_out, ref_grads = _grads(
        lambda *a: window_attention_math(*a, num_heads=nh), args, g
    )
    pal_out, pal_grads = _grads(
        lambda *a: fused_window_attention(
            *a, num_heads=nh, interpret=True, backward="pallas"
        ),
        args, g,
    )
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out), atol=2e-4)
    for pg, rg in zip(pal_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(pg), np.asarray(rg), atol=5e-4, rtol=5e-3
        )


def test_fused_backward_env_T_override(monkeypatch):
    """TMAR_ATTN_BWD_T lifts the backward's windows-per-step past the
    default 512//N (with a conditional vmem grant on hardware); the env
    plumbing + padding math must leave every cotangent unchanged."""
    monkeypatch.setenv("TMAR_ATTN_BWD_T", "16")
    N, D, nh, hd = 64, 64, 6, 10
    B_ = 20  # not a multiple of T=16 -> exercises the padding path too
    args = _make_inputs(B_, N, D, nh, hd, seed=4)
    g = jnp.asarray(np.random.default_rng(5).normal(size=(B_, N, D)).astype(np.float32))
    _, ref_grads = _grads(
        lambda *a: window_attention_math(*a, num_heads=nh), args, g
    )
    _, pal_grads = _grads(
        lambda *a: fused_window_attention(
            *a, num_heads=nh, interpret=True, backward="pallas"
        ),
        args, g,
    )
    for pg, rg in zip(pal_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(rg), atol=5e-4, rtol=5e-3)


def test_fused_backward_cot_bf16_mode(monkeypatch):
    """TMAR_ATTN_BWD_COT=bf16 runs the cotangent dots' operands in bf16
    (f32 accumulation kept) — the numerics class of the XLA bf16 backward.
    Parity vs jax.vjp of the math at bf16-appropriate tolerances."""
    monkeypatch.setenv("TMAR_ATTN_BWD_COT", "bf16")
    N, D, nh, hd = 64, 64, 4, 16
    wh = ww = 4
    B_ = wh * ww
    args = _make_inputs(B_, N, D, nh, hd, seed=5)
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(B_, N, D)).astype(np.float32)
    )
    ref_out, ref_grads = _grads(
        lambda *a: window_attention_math(*a, num_heads=nh), args, g
    )
    pal_out, pal_grads = _grads(
        lambda *a: fused_window_attention(
            *a, num_heads=nh, interpret=True, backward="pallas"
        ),
        args, g,
    )
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out), atol=2e-4)
    names = ["dx", "dwqkv", "dbqkv", "dlogit_scale", "dbias", "dwproj", "dbproj"]
    for name, pg, rg in zip(names, pal_grads, ref_grads):
        scale = max(1.0, float(np.abs(np.asarray(rg)).max()))
        np.testing.assert_allclose(
            np.asarray(pg) / scale, np.asarray(rg) / scale, atol=3e-2,
            err_msg=f"cotangent {name} mismatch (bf16 cot mode)",
        )
