"""Tests for the benchmark harness, figure generation and utils."""

import json
import os

import numpy as np
import pytest

from tmar.data import SyntheticMARDataset
from tmar.eval.harness import ModelEntry, find_metal_center, run_comparison
from tmar.eval import figures as F
from tmar.utils import MetricLogger, StepTimer


def test_find_metal_center():
    ct = np.zeros((64, 64), np.float32)
    ct[10:14, 40:44] = 1.0
    cy, cx = find_metal_center(ct)
    assert 10 <= cy <= 13 and 40 <= cx <= 43
    # no metal -> image centre
    assert find_metal_center(np.zeros((64, 64))) == (32, 32)


def test_run_comparison(tmp_path):
    ds = SyntheticMARDataset(size=64, length=12)
    entries = [
        ModelEntry("identity", lambda x: x),
        ModelEntry("broken", lambda x: (_ for _ in ()).throw(RuntimeError("boom"))),
    ]
    results = run_comparison(entries, ds, str(tmp_path), num_samples=4)
    assert results["identity"]["status"] == "ok"
    assert results["broken"]["status"] == "FAILED"
    assert os.path.exists(tmp_path / "summary.csv")
    assert os.path.exists(tmp_path / "identity" / "metrics.json")
    s = results["identity"]["summary"]
    assert 0 < s["psnr"]["mean"] < 60  # identity on corrupted input ≠ gt
    # per-sample npys saved
    assert len([f for f in os.listdir(tmp_path / "identity") if f.endswith(".npy")]) == 4


def test_slice_ranking(tmp_path):
    ds = SyntheticMARDataset(size=64, length=10)
    cache = str(tmp_path / "top.npy")
    top = F.select_best_slices(ds, k=3, cache_path=cache)
    assert len(top) == 3
    assert F.select_best_slices(ds, k=3, cache_path=cache) == top  # cached


def test_figures_render(tmp_path):
    ds = SyntheticMARDataset(size=64, length=4)
    s = ds[0]
    ct, gt = s["ct"], s["gt"]
    pred = np.clip(gt + np.random.default_rng(0).normal(0, 0.05, gt.shape), -1, 1).astype(np.float32)

    F.figure_metal_aware_masks(ct, str(tmp_path / "masks.png"), radii=(0, 3))
    F.figure_physics_consistency(pred, gt, ct, str(tmp_path / "phys.png"), num_angles=30)
    F.figure_multiscale_receptive_fields(ct, str(tmp_path / "rf.png"))
    F.figure_error_heatmaps({"m": (pred + 1) / 2}, (gt + 1) / 2, str(tmp_path / "err.png"))
    F.figure_mse_limitation((gt + 1) / 2 * 0.9, (gt + 1) / 2, (gt + 1) / 2, str(tmp_path / "mse.png"))
    F.intensity_profiles({"m": (pred + 1) / 2}, (gt + 1) / 2, (ct + 1) / 2, str(tmp_path / "prof.png"))
    F.plot_loss_curves([{"loss_g": 1.0, "loss_d": 2.0}, {"loss_g": 0.5, "loss_d": 1.5}],
                       str(tmp_path / "curves.png"))
    for f in ("masks", "phys", "rf", "err", "mse", "prof", "curves"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000


def test_metric_logger(tmp_path):
    ml = MetricLogger(str(tmp_path))
    ml.log(1, {"loss": 1.0})
    ml.log(2, {"loss": 0.5})
    ml.flush()
    assert (tmp_path / "metrics.csv").exists()
    rows = json.load(open(tmp_path / "metrics.json"))
    assert rows[1]["loss"] == 0.5


def test_step_timer():
    import jax.numpy as jnp

    t = StepTimer()
    f = lambda x: x * 2
    mean = t.time_fn(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert mean > 0 and t.summary()["n"] == 3


def test_additional_plot_families(tmp_path):
    ds = SyntheticMARDataset(size=64, length=2)
    s = ds[0]
    gt01, ct01 = (s["gt"] + 1) / 2, (s["ct"] + 1) / 2
    pred01 = np.clip(gt01 + np.random.default_rng(1).normal(0, 0.03, gt01.shape), 0, 1)

    F.plot_histograms({"m": pred01}, gt01, str(tmp_path / "hist.png"))
    F.plot_regional_comparison(
        {"m": {"metal_PSNR": 30, "band_PSNR": 32, "non_metal_PSNR": 35}},
        str(tmp_path / "regional.png"),
    )
    F.plot_intensity_segmentation(pred01, gt01, str(tmp_path / "seg.png"))
    F.plot_artifact_waves(pred01, gt01, ct01, str(tmp_path / "waves.png"))
    F.plot_metric_curves(
        [{"epoch": 0, "val_psnr": 30.0}, {"epoch": 1, "val_psnr": 31.0}],
        str(tmp_path / "vcurves.png"),
    )
    F.contrast_sweep(gt01, str(tmp_path / "contrast.png"))
    for f in ("hist", "regional", "seg", "waves", "vcurves", "contrast"):
        assert (tmp_path / f"{f}.png").stat().st_size > 1000


def test_summary_table_and_distribution_figures(tmp_path):
    ds = SyntheticMARDataset(size=64, length=12)
    entries = [
        ModelEntry("identity", lambda x: x),
        ModelEntry("zeros", lambda x: x * 0),
    ]
    results = run_comparison(entries, ds, str(tmp_path), num_samples=4)
    table = (tmp_path / "summary_table.txt").read_text()
    assert "identity" in table and "zeros" in table
    assert "PSNR" in table and "ms/sample" in table
    assert len(table.splitlines()) == 4  # header + rule + 2 model rows
    assert os.path.exists(tmp_path / "figures" / "metric_boxplots.png")
    assert os.path.exists(tmp_path / "figures" / "per_image_psnr.png")
    assert results["identity"]["status"] == "ok"


def test_selected_slices_cache_mode(tmp_path):
    ds = SyntheticMARDataset(size=64, length=20)
    cache = str(tmp_path / "cache" / "selected.npy")
    e = [ModelEntry("identity", lambda x: x)]
    r1 = run_comparison(e, ds, str(tmp_path / "a"), num_samples=5,
                        indices_cache=cache, save_outputs=False, seed=42)
    # second run with a DIFFERENT seed must reuse the cached indices
    r2 = run_comparison(e, ds, str(tmp_path / "b"), num_samples=5,
                        indices_cache=cache, save_outputs=False, seed=7)
    s1 = [row["sample"] for row in r1["identity"]["per_sample"]]
    s2 = [row["sample"] for row in r2["identity"]["per_sample"]]
    assert s1 == s2
    assert os.path.exists(cache)
