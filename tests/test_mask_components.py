"""Decomposed shift-mask equivalence: components reproduce the full mask
(up to the post-softmax-identical -200 corner) and identical attention."""

import numpy as np
import jax.numpy as jnp

from tmar.ops import cosine_window_attention, shift_attn_mask
from tmar.ops.window import shift_mask_components
import pytest


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


def test_merged_window_attention_matches(rng):
    from tmar.ops.attention import (
        gather_rel_pos_bias, merged_window_attention_math,
        relative_position_index, window_attention_math,
    )

    ws, nh, hd, D = 8, 3, 10, 32
    N = ws * ws
    wh, ww = 2, 3
    B_ = 2 * wh * ww  # even: exercises pairing across image boundaries
    A = nh * hd
    x = jnp.asarray(rng.standard_normal((B_, N, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * A)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal((3 * A,)).astype(np.float32) * 0.1)
    ls = jnp.asarray(rng.standard_normal((nh, 1, 1)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, nh)).astype(np.float32) * 0.02)
    bias = gather_rel_pos_bias(table, relative_position_index(ws, ws), nh)
    wproj = jnp.asarray(rng.standard_normal((A, D)).astype(np.float32) * 0.1)
    bproj = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    for mc in (None, (*shift_mask_components(ws, 4), wh, ww)):
        ref = window_attention_math(x, wqkv, bqkv, ls, bias, wproj, bproj, nh, mask_components=mc)
        got = merged_window_attention_math(
            x, wqkv, bqkv, ls, bias, wproj, bproj, nh, merge_windows=2, mask_components=mc
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
    # odd window count exercises the pad path (no masks)
    got = merged_window_attention_math(
        x[:5], wqkv, bqkv, ls, bias, wproj, bproj, nh, merge_windows=2
    )
    ref = window_attention_math(x[:5], wqkv, bqkv, ls, bias, wproj, bproj, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_ngswin_merge_flag_matches(rng):
    from tmar.nn import NGswin
    import jax

    TINY = dict(ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2), num_heads=(2, 2, 2),
                dec_dim=32, dec_depths=2, dec_num_heads=2, window_size=8)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 1)).astype(np.float32))
    m0 = NGswin(**TINY)
    m1 = NGswin(**TINY, xla_window_merge=True)
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x)["params"]
    )
    o0 = np.asarray(m0.apply({"params": p}, x))
    o1 = np.asarray(m1.apply({"params": p}, x))
    np.testing.assert_allclose(o1, o0, atol=5e-5, rtol=1e-4)
