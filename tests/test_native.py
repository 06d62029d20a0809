"""Native host-library tests: build, and C++ vs numpy equivalence."""

import numpy as np
import pytest

from tmar.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library(build=True)
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_normalize(lib, rng):
    x = rng.uniform(-0.5, 1.5, (64, 64)).astype(np.float32)
    out = native.normalize01_pm1(x)
    np.testing.assert_allclose(out, np.clip(x, 0, 1) * 2 - 1, rtol=1e-6)


def test_hu_window(lib, rng):
    x = rng.uniform(-2000, 4000, (64, 64)).astype(np.float32)
    out = native.hu_window(x)
    v = np.clip(x, -1000, 2000)
    ref = ((v + 1000) / 3000 * 2 - 1).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_assemble_batch(lib, rng):
    B, K, H, W, P = 4, 3, 32, 40, 16
    x = rng.standard_normal((B, K, H, W)).astype(np.float32)
    rows = rng.integers(0, H - P + 1, B)
    cols = rng.integers(0, W - P + 1, B)
    hf = rng.random(B) < 0.5
    vf = rng.random(B) < 0.5
    out = native.assemble_batch(x, P, rows, cols, hf, vf)
    for b in range(B):
        ref = x[b, :, rows[b] : rows[b] + P, cols[b] : cols[b] + P]
        if hf[b]:
            ref = ref[:, :, ::-1]
        if vf[b]:
            ref = ref[:, ::-1, :]
        np.testing.assert_array_equal(out[b], ref)


def test_metal_mask_dilate(lib, rng):
    from scipy.ndimage import maximum_filter

    img = rng.uniform(-1, 1, (48, 48)).astype(np.float32)
    for radius in (0, 2, 5):
        out = native.metal_mask_dilate(img, 0.6, radius)
        m = (img > 0.6).astype(np.float32)
        ref = maximum_filter(m, size=2 * radius + 1, mode="constant") if radius else m
        np.testing.assert_array_equal(out, ref)


def test_li_interpolate(lib):
    # simple ramp with a masked band: interpolation must restore the ramp
    H = W = 16
    img = np.tile(np.linspace(0, 1, W, dtype=np.float32), (H, 1))
    corrupted = img.copy()
    mask = np.zeros((H, W), np.uint8)
    mask[:, 6:10] = 1
    corrupted[:, 6:10] = 5.0
    out = native.li_interpolate(corrupted, mask)
    np.testing.assert_allclose(out, img, atol=1e-6)

    # fully-masked row falls back to the column pass
    corrupted2 = img.copy()
    mask2 = np.zeros((H, W), np.uint8)
    mask2[4, :] = 1
    corrupted2[4, :] = 9.0
    out2 = native.li_interpolate(corrupted2, mask2)
    np.testing.assert_allclose(out2[4], img[4], atol=1e-6)


def test_python_fallbacks(monkeypatch, rng):
    """All wrappers must work without the native library."""
    monkeypatch.setattr(native, "load_library", lambda build=True: None)
    x = rng.uniform(-0.5, 1.5, (16, 16)).astype(np.float32)
    np.testing.assert_allclose(
        native.normalize01_pm1(x), np.clip(x, 0, 1) * 2 - 1, rtol=1e-6
    )
    out = native.assemble_batch(
        rng.standard_normal((2, 1, 16, 16)).astype(np.float32), 8,
        [0, 1], [2, 3], [True, False], [False, True],
    )
    assert out.shape == (2, 1, 8, 8)
    assert native.metal_mask_dilate(x, 0.6, 2).shape == x.shape
