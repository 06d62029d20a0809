"""Tests for the ablation evaluation engine (tmar/eval/ablation.py)."""

import os

import numpy as np

from tmar.eval.ablation import (
    cross_ablation_summary,
    evaluate_run,
    fixed_vis_indices,
)


class _DS:
    def __init__(self, n=6, size=32):
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(n):
            gt = rng.uniform(-1, 0, (size, size)).astype(np.float32)
            ct = gt.copy()
            ct[10:14, 10:14] = 0.9
            self.items.append({"ct": ct, "gt": gt})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_fixed_vis_indices_deterministic():
    a = fixed_vis_indices(100, k=8, seed=42)
    b = fixed_vis_indices(100, k=8, seed=42)
    assert a == b and len(a) == 8 and a == sorted(a)
    assert fixed_vis_indices(5, k=8) == sorted(fixed_vis_indices(5, k=8))
    assert len(fixed_vis_indices(5, k=8)) == 5  # clamped to dataset size


def test_evaluate_run_artifacts(tmp_path):
    ds = _DS()
    summary = evaluate_run(
        lambda x: x,  # identity forward
        ds,
        str(tmp_path / "eval"),
        vis_indices=[0, 3],
        history=[{"loss_g": 1.0}, {"loss_g": 0.5}],
        val_history=[{"epoch": 0, "val_psnr": 10.0}],
        name="identity",
    )
    # full metric families present
    for k in ("psnr", "ssim", "mae", "rmse", "metal_PSNR", "band_PSNR",
              "non_metal_PSNR", "overall_HU_MAE", "within_10HU"):
        assert k in summary, k
    assert summary["n_samples"] == len(ds)
    assert (tmp_path / "eval" / "metrics.csv").exists()
    assert (tmp_path / "eval" / "metrics.json").exists()
    plots = os.listdir(tmp_path / "eval" / "plots")
    # plot families for each fixed vis sample + curves
    for fam in ("error_heatmap", "histogram", "profiles", "segmentation",
                "artifact_waves", "triplet"):
        assert sum(p.startswith(fam) for p in plots) == 2, (fam, plots)
    assert "loss_curves.png" in plots and "metric_curves.png" in plots
    # identity on a metal-corrupted input: metal region error is the metal
    assert summary["psnr"] > 0


def test_cross_ablation_summary(tmp_path):
    results = {
        "A1": {"status": "ok", "summary": {"psnr": 20.0, "ssim": 0.8, "mae": 0.01,
                                           "rmse": 0.02, "metal_PSNR": 18.0,
                                           "band_PSNR": 19.0, "non_metal_PSNR": 21.0,
                                           "overall_HU_MAE": 30.0, "within_10HU": 0.5}},
        "B2": {"status": "FAILED", "error": "boom"},
    }
    path = cross_ablation_summary(results, str(tmp_path))
    text = open(path).read()
    assert "A1,ok,20.0" in text
    assert "B2,FAILED" in text
    assert (tmp_path / "ablation_summary.json").exists()
    assert (tmp_path / "ablation_psnr_bars.png").exists()
