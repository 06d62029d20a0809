"""Golden-value verification of the measuring sticks (PSNR / SSIM).

The reference computes PSNR/SSIM through skimage
(benchmark_comparison_syndeeplesion.py:205-214; SSIM win_size=7 at
run_ablation_studies.py:431-436).  skimage is not installable in this
environment, so agreement is pinned three independent ways:

1. analytic closed-form cases (exact values derivable by hand);
2. an INDEPENDENT implementation in this file that computes the per-window
   statistics explicitly from sliding windows (no scipy.ndimage code path
   shared with tmar.eval.metrics).  On the cropped interior that skimage
   averages over, every window is fully inside the image, so valid-window
   statistics are *mathematically identical* to skimage's
   filter-then-crop pipeline — making this an equality check against
   skimage semantics, not just self-consistency;
3. stored regression goldens on fixed seeded inputs.
"""

import numpy as np
import pytest

from tmar.eval.metrics import psnr, ssim


def _ssim_reference(pred, target, data_range=1.0, win_size=7, k1=0.01, k2=0.03):
    """Independent SSIM: explicit sliding-window statistics (valid mode).

    skimage filters with reflect-mode windows then crops (win_size-1)//2 from
    each border before averaging; on that cropped region each window lies
    fully inside the image, so computing plain windowed statistics over all
    valid positions gives the identical mean SSIM.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    pred = pred.astype(np.float64)
    target = target.astype(np.float64)
    wp = sliding_window_view(pred, (win_size, win_size))      # [H',W',w,w]
    wt = sliding_window_view(target, (win_size, win_size))
    n = win_size * win_size
    ux = wp.mean(axis=(-1, -2))
    uy = wt.mean(axis=(-1, -2))
    # sample (N-1) covariance, as skimage's cov_norm = N/(N-1) applies
    vx = ((wp - ux[..., None, None]) ** 2).sum(axis=(-1, -2)) / (n - 1)
    vy = ((wt - uy[..., None, None]) ** 2).sum(axis=(-1, -2)) / (n - 1)
    vxy = ((wp - ux[..., None, None]) * (wt - uy[..., None, None])).sum(
        axis=(-1, -2)
    ) / (n - 1)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    return float(s.mean())


# ----------------------------------------------------------- analytic PSNR

def test_psnr_analytic_constant_offset():
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.5)  # MSE = 0.01 exactly
    assert psnr(a, b, data_range=1.0) == pytest.approx(20.0, abs=1e-12)
    # data_range 2 (the [-1,1] convention): +20*log10(2)
    assert psnr(a, b, data_range=2.0) == pytest.approx(
        20.0 + 20.0 * np.log10(2.0), abs=1e-12
    )


def test_psnr_identical_is_inf():
    a = np.random.default_rng(0).random((16, 16))
    assert psnr(a, a) == float("inf")


# ----------------------------------------------------------- analytic SSIM

def test_ssim_identical_is_one():
    a = np.random.default_rng(1).random((64, 64))
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-12)


def test_ssim_constant_images_closed_form():
    # zero variance everywhere -> structure/contrast term = c2/c2 = 1,
    # luminance term = (2ab+c1)/(a^2+b^2+c1)
    a, b = 0.2, 0.3
    c1 = 0.01**2
    expected = (2 * a * b + c1) / (a**2 + b**2 + c1)
    x = np.full((32, 32), a)
    y = np.full((32, 32), b)
    assert ssim(x, y, data_range=1.0) == pytest.approx(expected, abs=1e-12)


# ---------------------------------------- independent-implementation parity

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ssim_matches_independent_valid_window_impl(seed):
    rng = np.random.default_rng(seed)
    target = rng.random((48, 48))
    pred = np.clip(target + 0.08 * rng.standard_normal((48, 48)), 0, 1)
    ours = ssim(pred, target, data_range=1.0, win_size=7)
    ref = _ssim_reference(pred, target, data_range=1.0, win_size=7)
    assert ours == pytest.approx(ref, abs=1e-10)


def test_ssim_matches_independent_impl_data_range_2():
    rng = np.random.default_rng(3)
    target = rng.uniform(-1, 1, (40, 40))
    pred = np.clip(target + 0.1 * rng.standard_normal((40, 40)), -1, 1)
    assert ssim(pred, target, data_range=2.0) == pytest.approx(
        _ssim_reference(pred, target, data_range=2.0), abs=1e-10
    )


# -------------------------------------------------------- stored regression
# Golden numbers computed from _ssim_reference / analytic PSNR on fixed
# seeded inputs (frozen 2026-08-16).  Catch silent regressions in either
# implementation.

def _golden_pair(seed, shape=(48, 48)):
    rng = np.random.default_rng(seed)
    target = rng.random(shape)
    pred = np.clip(target + 0.08 * rng.standard_normal(shape), 0, 1)
    return pred, target


GOLDEN = {
    # seed: (ssim, psnr)
    0: (0.964701598724509, 22.366072480940936),
    1: (0.9650213051995652, 22.381080966348176),
    2: (0.9658150975782722, 22.384268185797723),
}


@pytest.mark.parametrize("seed", sorted(GOLDEN))
def test_stored_goldens(seed):
    pred, target = _golden_pair(seed)
    g_ssim, g_psnr = GOLDEN[seed]
    assert ssim(pred, target) == pytest.approx(g_ssim, abs=1e-9)
    assert psnr(pred, target) == pytest.approx(g_psnr, abs=1e-9)
