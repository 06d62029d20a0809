"""Decomposed shift-mask equivalence: components reproduce the full mask
(up to the post-softmax-identical -200 corner) and identical attention."""

import numpy as np
import jax.numpy as jnp

from tmar.ops import cosine_window_attention, shift_attn_mask
from tmar.ops.window import shift_mask_components


def test_components_reconstruct_full_mask():
    ws, shift = 8, 4
    for (ph, pw) in ((16, 16), (24, 32)):
        wh, ww = ph // ws, pw // ws
        full = shift_attn_mask((ph, pw), ws, shift)  # [wh*ww, N, N]
        m_row, m_col = shift_mask_components(ws, shift)
        for r in range(wh):
            for c in range(ww):
                rec = (r == wh - 1) * m_row + (c == ww - 1) * m_col
                rec = np.maximum(rec, -100.0)  # -200 corner -> -100
                np.testing.assert_array_equal(rec, full[r * ww + c])


def test_attention_identical_under_both_masks(rng):
    ws, shift = 8, 4
    ph = pw = 16
    wh, ww = ph // ws, pw // ws
    nW = wh * ww
    B, nh, N, hd = 2 * nW, 3, ws * ws, 8
    q = jnp.asarray(rng.standard_normal((B, nh, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, nh, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, nh, N, hd)).astype(np.float32))
    scale = jnp.zeros((nh, 1, 1))
    bias = jnp.asarray(rng.standard_normal((nh, N, N)).astype(np.float32) * 0.1)

    full = jnp.asarray(shift_attn_mask((ph, pw), ws, shift))
    m_row, m_col = shift_mask_components(ws, shift)

    out_full = cosine_window_attention(q, k, v, scale, bias, mask=full)
    out_comp = cosine_window_attention(
        q, k, v, scale, bias, mask_components=(m_row, m_col, wh, ww)
    )
    np.testing.assert_allclose(
        np.asarray(out_comp), np.asarray(out_full), atol=1e-6
    )
