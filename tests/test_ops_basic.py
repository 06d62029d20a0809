"""Golden tests for dilation, image gradients, and n-gram primitives."""

import numpy as np
import jax.numpy as jnp

from tmar.ops import dilate_mask, image_gradients, seq_refl_win_pad, sliding_patches


def _dilate_np(mask, radius):
    # brute-force max filter
    B, H, W, C = mask.shape
    out = np.zeros_like(mask)
    for i in range(H):
        for j in range(W):
            i0, i1 = max(0, i - radius), min(H, i + radius + 1)
            j0, j1 = max(0, j - radius), min(W, j + radius + 1)
            out[:, i, j, :] = mask[:, i0:i1, j0:j1, :].max(axis=(1, 2))
    return out


def test_dilate_matches_bruteforce(rng):
    mask = (rng.random((2, 20, 20, 1)) > 0.9).astype(np.float32)
    for radius in (0, 1, 3, 5):
        out = np.asarray(dilate_mask(jnp.asarray(mask), radius))
        np.testing.assert_array_equal(out, _dilate_np(mask, radius))


def test_image_gradients_replicate_pad(rng):
    x = rng.standard_normal((2, 6, 7, 1)).astype(np.float32)
    gx, gy = image_gradients(jnp.asarray(x))
    gx, gy = np.asarray(gx), np.asarray(gy)
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    np.testing.assert_allclose(gx[:, :, :-1, :], dx, rtol=1e-6)
    np.testing.assert_allclose(gy[:, :-1, :, :], dy, rtol=1e-6)
    # replicate-padded last col/row equals the previous one
    np.testing.assert_array_equal(gx[:, :, -1, :], gx[:, :, -2, :])
    np.testing.assert_array_equal(gy[:, -1, :, :], gy[:, -2, :, :])


def test_seq_refl_pad_ngram2(rng):
    # For ngram=2 the reference semantics equal 1-px reflect padding
    # (reference window_utils.py:43-61, see tmar.ops.ngram docstring).
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    fwd = np.asarray(seq_refl_win_pad(jnp.asarray(x), 2, back=False))
    assert fwd.shape == (1, 5, 5, 2)
    np.testing.assert_array_equal(fwd[:, :4, :4], x)
    np.testing.assert_array_equal(fwd[0, 4, :4], x[0, 2, :])   # appended row = row H-2
    np.testing.assert_array_equal(fwd[0, :4, 4], x[0, :, 2])   # appended col = col W-2
    np.testing.assert_array_equal(fwd[0, 4, 4], x[0, 2, 2])    # corner

    bwd = np.asarray(seq_refl_win_pad(jnp.asarray(x), 2, back=True))
    assert bwd.shape == (1, 5, 5, 2)
    np.testing.assert_array_equal(bwd[:, 1:, 1:], x)
    np.testing.assert_array_equal(bwd[0, 0, 1:], x[0, 1, :])   # prepended row = row 1
    np.testing.assert_array_equal(bwd[0, 1:, 0], x[0, :, 1])   # prepended col = col 1


def test_seq_refl_pad_ngram1_identity(rng):
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(seq_refl_win_pad(jnp.asarray(x), 1)), x)


def test_sliding_patches(rng):
    n = 2
    x = rng.standard_normal((1, 5, 5, 3)).astype(np.float32)
    patches = np.asarray(sliding_patches(jnp.asarray(x), n))
    assert patches.shape == (1, 4, 4, 2, 2, 3)
    for i in range(4):
        for j in range(4):
            np.testing.assert_array_equal(
                patches[0, i, j], x[0, i : i + n, j : j + n]
            )
