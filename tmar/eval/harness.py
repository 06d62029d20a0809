"""Multi-model benchmark comparison harness.

TPU-native re-design of reference
evaluation/benchmark_comparison_syndeeplesion.py (1.7k lines): run N model
entries over a seeded sample set, collect PSNR/SSIM/MAE/RMSE + synchronized
per-sample latency, write per-model and combined CSV/JSON, save per-sample
outputs (npy) and composite figures.  Entries are (name, forward_fn) pairs —
in-process JAX models (our NGswin, the baselines, any imported torch
checkpoint) plug in directly; third-party torch models can be wrapped as
out-of-process adapters producing the same interface.

Failure isolation per model (the reference's try/except sweep behaviour,
benchmark_comparison_syndeeplesion.py:1436-1458): one model failing records a
FAILED row instead of killing the run.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from tmar.eval.metrics import mae, psnr, rmse, ssim


class ModelEntry:
    def __init__(self, name: str, forward: Callable[[np.ndarray], np.ndarray]):
        """forward: [B, H, W, 1] in [-1,1] -> [B, H, W, 1] in [-1,1]."""
        self.name = name
        self.forward = forward


def find_metal_center(ct01: np.ndarray, threshold: float = 0.8) -> Tuple[int, int]:
    """Centroid of the brightest (metal) region, for zoomed crops
    (reference benchmark_comparison_syndeeplesion.py:216-224)."""
    mask = ct01 > threshold
    if not mask.any():
        return ct01.shape[0] // 2, ct01.shape[1] // 2
    ys, xs = np.nonzero(mask)
    return int(ys.mean()), int(xs.mean())


def run_comparison(
    entries: Sequence[ModelEntry],
    dataset,
    out_dir: str,
    num_samples: int = 25,
    seed: int = 42,
    save_outputs: bool = True,
) -> Dict[str, Dict]:
    """Evaluate every entry on the same seeded sample subset."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    indices = rng.choice(len(dataset), size=min(num_samples, len(dataset)), replace=False)
    samples = [dataset[int(i)] for i in indices]

    results: Dict[str, Dict] = {}
    for entry in entries:
        model_dir = os.path.join(out_dir, entry.name)
        os.makedirs(model_dir, exist_ok=True)
        rows: List[Dict] = []
        try:
            # warmup/compile on the first sample's shape
            warm = samples[0]["ct"][None, ..., None]
            entry.forward(warm)
            for j, s in enumerate(samples):
                ct = s["ct"][None, ..., None]
                gt01 = (s["gt"] + 1) / 2
                t0 = time.perf_counter()
                pred = entry.forward(ct)
                latency = time.perf_counter() - t0
                pred01 = np.clip((pred[0, ..., 0] + 1) / 2, 0, 1)
                rows.append(
                    {
                        "sample": int(indices[j]),
                        "psnr": psnr(pred01, gt01),
                        "ssim": ssim(pred01, gt01),
                        "mae": mae(pred01, gt01),
                        "rmse": rmse(pred01, gt01),
                        "latency_s": latency,
                    }
                )
                if save_outputs:
                    np.save(os.path.join(model_dir, f"sample_{indices[j]:05d}.npy"), pred01)
            summary = {
                k: {
                    "mean": float(np.mean([r[k] for r in rows])),
                    "std": float(np.std([r[k] for r in rows])),
                }
                for k in ("psnr", "ssim", "mae", "rmse", "latency_s")
            }
            results[entry.name] = {"status": "ok", "summary": summary, "per_sample": rows}
        except Exception as e:
            results[entry.name] = {"status": "FAILED", "error": repr(e)}

        with open(os.path.join(model_dir, "metrics.json"), "w") as f:
            json.dump(results[entry.name], f, indent=2)

    _write_combined(results, out_dir)
    return results


def _write_combined(results: Dict[str, Dict], out_dir: str):
    import csv

    with open(os.path.join(out_dir, "summary.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "status", "psnr_mean", "psnr_std", "ssim_mean",
                    "ssim_std", "mae_mean", "rmse_mean", "latency_mean_s"])
        for name, res in results.items():
            if res["status"] != "ok":
                w.writerow([name, res["status"], *[""] * 7])
                continue
            s = res["summary"]
            w.writerow(
                [
                    name, "ok",
                    f"{s['psnr']['mean']:.4f}", f"{s['psnr']['std']:.4f}",
                    f"{s['ssim']['mean']:.6f}", f"{s['ssim']['std']:.6f}",
                    f"{s['mae']['mean']:.6f}", f"{s['rmse']['mean']:.6f}",
                    f"{s['latency_s']['mean']:.5f}",
                ]
            )
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(
            {name: res.get("summary", {"status": res["status"]}) for name, res in results.items()},
            f,
            indent=2,
        )
