"""NMAR prior computation and sinogram-domain fine-tune utilities.

TPU-native equivalents of the dual-domain helpers in reference
scripts/finetune_all_benchmarks.py:
* ``nmar_prior`` (:1351-1408): tissue-classified prior image — gaussian
  smooth, k-means (3 clusters seeded at air/water/2·water) thresholds, then
  air/water flattening.  k-means on a 1-D intensity vector is implemented
  directly (no sklearn dependency): Lloyd's algorithm on sorted intensities.
* ``sinogram_loss`` (:293-305): trace-masked sinogram L1.
* ``sparse_view_subsample``: sparse-view angle subsampling of a sinogram
  (reference benchmark_comparison_syndeeplesion.py:813-831 for MEPNet).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter


def _kmeans_1d(x: np.ndarray, init_centers: np.ndarray, max_iter: int = 300) -> Tuple[np.ndarray, np.ndarray]:
    """Lloyd's k-means on 1-D data with fixed init (k_means(..., n_init=1))."""
    centers = init_centers.astype(np.float64).copy()
    labels = np.zeros(x.shape[0], np.int64)
    for _ in range(max_iter):
        d = np.abs(x[:, None] - centers[None, :])
        new_labels = d.argmin(axis=1)
        if (new_labels == labels).all() and _ > 0:
            break
        labels = new_labels
        for k in range(len(centers)):
            sel = x[labels == k]
            if sel.size:
                centers[k] = sel.mean()
    return centers, labels


def nmar_prior(
    xli: np.ndarray,
    metal_mask: np.ndarray,
    miu_air: float = 0.0,
    miu_water: float = 0.192 * 255.0,
    smooth_sigma: float = 1.0,
) -> np.ndarray:
    """Tissue-classified NMAR prior for a batch of [B, H, W] LI images.

    metal_mask: 1 = non-metal (the reference fills where m < 0.5 — its mask
    is 1 on valid pixels).  Output [B, H, W] float32.
    """
    out = []
    for i in range(xli.shape[0]):
        im = xli[i].astype(np.float64).copy()
        im[metal_mask[i] < 0.5] = miu_water

        x1d = im.ravel()
        start = np.array([miu_air, miu_water, 2 * miu_water])
        try:
            centers, labels = _kmeans_1d(x1d, start)
            bone_vals = x1d[labels == 2]
            thresh_bone = max(bone_vals.min() if bone_vals.size else np.inf, 1.2 * miu_water)
            water_vals = x1d[labels == 1]
            thresh_water = water_vals.min() if water_vals.size else 0.5 * miu_water
        except Exception:
            thresh_bone = 1.5 * miu_water
            thresh_water = 0.5 * miu_water

        im_sm = gaussian_filter(im, smooth_sigma, mode="nearest")
        prior = im_sm.copy()
        prior[im_sm <= thresh_water] = miu_air
        sel = (prior > thresh_water) & (im_sm < thresh_bone)
        prior[sel] = miu_water
        out.append(prior)
    return np.stack(out).astype(np.float32)


def sinogram_loss(pred_sino, gt_sino, trace_mask=None):
    """Trace-masked sinogram L1 (jnp or numpy arrays)."""
    import jax.numpy as jnp

    diff = jnp.abs(pred_sino - gt_sino)
    if trace_mask is not None:
        return jnp.mean(diff * trace_mask)
    return jnp.mean(diff)


def sparse_view_subsample(sino: np.ndarray, factor: int) -> np.ndarray:
    """Keep every ``factor``-th projection angle: [B, A, det] -> [B, A//f, det]."""
    return sino[:, ::factor, :]
