"""Window partition / shift-mask golden tests (numpy references)."""

import numpy as np
import jax.numpy as jnp

from tmar.ops import (
    window_partition,
    window_unpartition,
    cyclic_shift,
    pad_to_multiple,
    shift_attn_mask,
)
from tmar.ops.window import reverse_cyclic_shift


def test_partition_roundtrip(rng):
    x = rng.standard_normal((2, 16, 24, 5)).astype(np.float32)
    wins, (wh, ww) = window_partition(jnp.asarray(x), 8)
    assert wins.shape == (2 * 2 * 3, 8, 8, 5)
    assert (wh, ww) == (2, 3)
    back = window_unpartition(wins, (wh, ww))
    np.testing.assert_array_equal(np.asarray(back), x)


def test_partition_layout(rng):
    # window (bi, wi, wj) holds rows wi*ws..wi*ws+ws of image bi.
    x = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    wins, _ = window_partition(jnp.asarray(x), 8)
    np.testing.assert_array_equal(np.asarray(wins[0]), x[0, :8, :8])
    np.testing.assert_array_equal(np.asarray(wins[1]), x[0, :8, 8:])
    np.testing.assert_array_equal(np.asarray(wins[2]), x[0, 8:, :8])


def test_cyclic_shift_matches_roll(rng):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(cyclic_shift(jnp.asarray(x), 4))
    ref = np.roll(x, (-4, -4), axis=(1, 2))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(
        np.asarray(reverse_cyclic_shift(jnp.asarray(out), 4)), x
    )


def test_pad_to_multiple():
    x = jnp.ones((1, 30, 45, 1))
    padded, (h, w) = pad_to_multiple(x, 32)
    assert padded.shape == (1, 32, 64, 1)
    assert (h, w) == (30, 45)
    assert float(padded[0, 31, 0, 0]) == 0.0
    assert float(padded[0, 0, 44, 0]) == 1.0


def test_shift_mask_properties():
    mask = shift_attn_mask((16, 16), window_size=8, shift=4)
    assert mask.shape == (4, 64, 64)
    # Only values 0 or -100.
    assert set(np.unique(mask)).issubset({0.0, -100.0})
    # The first (interior) window has no mask at all.
    assert np.all(mask[0] == 0.0)
    # Boundary windows do have masked pairs.
    assert np.any(mask[-1] == -100.0)
    # Mask is symmetric (pairwise same-region indicator).
    np.testing.assert_array_equal(mask, np.transpose(mask, (0, 2, 1)))
