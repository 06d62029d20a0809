"""Tests for NMAR prior and sinogram utilities."""

import numpy as np
import jax.numpy as jnp

from tmar.ops.nmar import _kmeans_1d, nmar_prior, sinogram_loss, sparse_view_subsample


def test_kmeans_1d_three_clusters():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.normal(0, 0.5, 200), rng.normal(50, 0.5, 200), rng.normal(100, 0.5, 200)
    ])
    centers, labels = _kmeans_1d(x, np.array([0.0, 49.0, 101.0]))
    assert np.allclose(sorted(centers), [0, 50, 100], atol=1.0)
    assert len(np.unique(labels)) == 3


def test_nmar_prior_flattens_tissue():
    miu_water = 0.192 * 255
    rng = np.random.default_rng(1)
    # image of air (0), water-ish (~49), bone (~120)
    img = np.zeros((32, 32), np.float32)
    img[6:26, 6:26] = miu_water + rng.normal(0, 1, (20, 20))
    img[11:21, 11:21] = 120.0
    mask = np.ones_like(img)
    prior = nmar_prior(img[None], mask[None])[0]
    # water region flattened to exactly miu_water
    assert np.allclose(prior[8, 8], miu_water)
    # air stays air
    assert prior[0, 0] == 0.0
    # bone-interior pixels (smoothing-neutral) stay above water
    assert prior[15:17, 15:17].mean() > miu_water


def test_sinogram_loss():
    a = jnp.ones((2, 8, 8))
    b = jnp.zeros((2, 8, 8))
    assert float(sinogram_loss(a, b)) == 1.0
    mask = jnp.zeros((2, 8, 8))
    assert float(sinogram_loss(a, b, mask)) == 0.0


def test_sparse_view():
    s = np.arange(2 * 12 * 4).reshape(2, 12, 4)
    out = sparse_view_subsample(s, 3)
    assert out.shape == (2, 4, 4)
    np.testing.assert_array_equal(out[:, 1], s[:, 3])
