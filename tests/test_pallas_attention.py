"""Pallas fused window attention vs the XLA reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmar.ops.attention import (
    cosine_window_attention,
    gather_rel_pos_bias,
    merge_heads,
    relative_position_index,
    split_heads,
)
from tmar.ops.pallas_attention import fused_window_attention
from tmar.ops.window import shift_mask_components


def _reference(x, wqkv, bqkv, logit_scale, bias, wproj, bproj, nh, mask_components):
    qkv = x @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = cosine_window_attention(
        split_heads(q, nh), split_heads(k, nh), split_heads(v, nh),
        logit_scale, bias, mask_components=mask_components,
    )
    return merge_heads(out) @ wproj + bproj


@pytest.mark.parametrize("shift", [0, 4])
def test_fused_matches_xla(rng, shift):
    ws, nh, hd, D = 8, 3, 10, 32
    N = ws * ws
    wh = ww = 2
    B = 2
    B_ = B * wh * ww
    A = nh * hd

    x = jnp.asarray(rng.standard_normal((B_, N, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * A)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    logit_scale = jnp.asarray(rng.standard_normal((nh, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, nh)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(ws, ws), nh)
    wproj = jnp.asarray(rng.standard_normal((A, D)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)

    mask_components = None
    if shift:
        m_row, m_col = shift_mask_components(ws, shift)
        mask_components = (m_row, m_col, wh, ww)

    ref = _reference(x, wqkv, bqkv, logit_scale, bias, wproj, bproj, nh, mask_components)
    fused = fused_window_attention(
        x, wqkv, bqkv, logit_scale, bias, wproj, bproj, nh,
        mask_components=mask_components, windows_per_step=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_ragged_window_count(rng):
    """B_ not divisible by windows_per_step exercises the pad path."""
    ws, nh, hd, D = 8, 2, 8, 16
    N = ws * ws
    B_ = 3  # prime vs windows_per_step=2
    A = nh * hd
    x = jnp.asarray(rng.standard_normal((B_, N, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * A)).astype(np.float32) * 0.1)
    logit_scale = jnp.zeros((nh, 1, 1))
    bias = jnp.zeros((nh, N, N))
    wproj = jnp.asarray(rng.standard_normal((A, D)).astype(np.float32) * 0.1)
    bproj = jnp.zeros((D,))
    ref = _reference(x, wqkv, jnp.zeros((3 * A,)), logit_scale, bias, wproj, bproj, nh, None)
    fused = fused_window_attention(
        x, wqkv, None, logit_scale, bias, wproj, bproj, nh,
        windows_per_step=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_gradients_match_xla(rng):
    """Custom VJP (pallas fwd, XLA recompute bwd) == pure XLA gradients."""
    ws, nh, hd, D = 8, 2, 8, 16
    N = ws * ws
    B_ = 4
    A = nh * hd
    x = jnp.asarray(rng.standard_normal((B_, N, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * A)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.zeros((nh, 1, 1))
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, nh)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(ws, ws), nh)
    wproj = jnp.asarray(rng.standard_normal((A, D)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)

    from tmar.ops.attention import window_attention_math

    def loss_ref(x, wqkv, wproj):
        return jnp.sum(
            window_attention_math(x, wqkv, bqkv, ls, bias, wproj, bproj, nh) ** 2
        )

    def loss_fused(x, wqkv, wproj):
        return jnp.sum(
            fused_window_attention(
                x, wqkv, bqkv, ls, bias, wproj, bproj, nh,
                windows_per_step=2, interpret=True,
            ) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wqkv, wproj)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wqkv, wproj)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("shift", [0, 4])
def test_packed_impl_matches_blockdiag(rng, shift):
    ws, nh, hd, D = 8, 3, 10, 32
    N = ws * ws
    wh = ww = 2
    B_ = 2 * wh * ww
    A = nh * hd
    x = jnp.asarray(rng.standard_normal((B_, N, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * A)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal((nh, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, nh)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(ws, ws), nh)
    wproj = jnp.asarray(rng.standard_normal((A, D)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    mc = None
    if shift:
        m_row, m_col = shift_mask_components(ws, shift)
        mc = (m_row, m_col, wh, ww)
    ref = _reference(x, wqkv, bqkv, ls, bias, wproj, bproj, nh, mc)
    got = fused_window_attention(
        x, wqkv, bqkv, ls, bias, wproj, bproj, nh, mask_components=mc,
        windows_per_step=4, interpret=True, impl="packed",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
