"""A/B: fused_pairs D batching (2 SN power iterations/step) vs the
reference-exact 4-per-step semantics (torch updates u/v on every D forward,
reference models/discriminator/ms_patchgan.py:42-58; 4 forwards/iteration).

Trains the SAME seed + data order twice — identical except disc.fused_pairs —
for N steps of the full promoted recipe (b8·128², all losses incl. Radon),
then reports:

* the val-PSNR trajectories (every 2 epochs) and their max gap,
* the per-conv spectral-norm estimate error |sigma_est − sigma_true|/sigma_true
  (sigma_true from an exact SVD of each discriminator conv) for both runs —
  the quantity the halved power-iteration count could actually degrade.

Usage:  python tools/ab_sn_pairs.py [steps] [out_dir]
Writes <out_dir>/sn_ab.json and prints a one-line summary per variant.

``--noise`` mode (VERDICT r3 #6): instead of the fused-pairs A/B, run the
SAME promoted config twice with different *training seeds* (identical data
order) — the val-PSNR gap between them is the adversarial run-to-run noise
floor the A/B gap must be read against.  Writes <out_dir>/sn_noise.json.
"""

import _path  # noqa: F401  (repo root on sys.path + jax compile cache)

import json
import os
import sys

import numpy as np


def sigma_errors(d_params, d_sn):
    """Per-conv relative error of the power-iteration sigma estimate."""
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path

    params_flat = {keystr(p): np.asarray(v, np.float32)
                   for p, v in tree_flatten_with_path(jax.device_get(d_params))[0]}
    mods = {}
    for path, val in tree_flatten_with_path(jax.device_get(d_sn))[0]:
        key = keystr(path)
        base, leaf = key[: key.rfind("[")], key[key.rfind("[") + 2 : -2]
        mods.setdefault(base, {})[leaf] = np.asarray(val, np.float32)
    errs = {}
    for base, uv in sorted(mods.items()):
        kern = params_flat.get(base + "['kernel']")
        if kern is None or not {"u", "v"} <= set(uv):
            continue
        # torch [out, in*kh*kw] flattening (tmar.nn.spectral_norm)
        w = kern.transpose(3, 2, 0, 1).reshape(kern.shape[3], -1)
        sigma_est = float(uv["u"] @ w @ uv["v"])
        sigma_true = float(np.linalg.svd(w, compute_uv=False)[0])
        errs[base] = abs(sigma_est - sigma_true) / max(sigma_true, 1e-12)
    return errs


def run_variant(fused_pairs: bool, steps: int, seed: int = 7, tag: str = None):
    from tmar.data import SyntheticMARDataset
    from tmar.train.config import TrainConfig
    from tmar.train.trainer import Trainer

    cfg = TrainConfig()
    cfg.data.dataset = "synthetic"
    cfg.data.patch_size = 128
    cfg.data.batch_size = 8
    steps_per_epoch = 100
    cfg.data.samples_per_epoch = steps_per_epoch * 8
    cfg.num_epochs = max(1, steps // steps_per_epoch)
    cfg.val_every_n_epochs = 2
    cfg.checkpoint_every_n_epochs = 10_000  # no checkpoints needed
    cfg.bf16 = True
    cfg.model.use_pallas_attention = True
    cfg.model.attn_backward = "pallas"
    cfg.disc.fused_pairs = fused_pairs
    cfg.log_every = 100
    cfg.run_dir = "/tmp/sn_ab_runs"
    cfg.run_name = tag or ("pairs" if fused_pairs else "nopairs")
    cfg.seed = seed
    cfg.data.seed = 999

    val = SyntheticMARDataset(size=128, length=16, base_seed=4242)
    tr = Trainer(cfg, val_dataset=val)
    tr.fit(progress=False)
    val_rows = [r for r in tr.val_history if "val_psnr" in r]
    errs = sigma_errors(tr.state.d_params, tr.state.d_sn)
    return {
        "fused_pairs": fused_pairs,
        "val_psnr": [float(r["val_psnr"]) for r in val_rows],
        "val_epochs": [int(r["epoch"]) for r in val_rows],
        "final_loss_d": float(tr.history[-1]["loss_d"]),
        "final_loss_g": float(tr.history[-1]["loss_g"]),
        "sigma_rel_err": errs,
        "sigma_rel_err_mean": float(np.mean(list(errs.values()))),
        "sigma_rel_err_max": float(np.max(list(errs.values()))),
    }


def main():
    args = [a for a in sys.argv[1:] if a != "--noise"]
    noise_mode = "--noise" in sys.argv[1:]
    steps = int(args[0]) if len(args) > 0 else 1000
    out_dir = args[1] if len(args) > 1 else "reports/sn_ab"

    if noise_mode:
        results = {}
        for seed in (7, 8):
            r = run_variant(True, steps, seed=seed, tag=f"noise_seed{seed}")
            results[f"seed{seed}"] = r
            print(
                f"[noise seed={seed}] steps={steps} "
                f"val_psnr={['%.2f' % p for p in r['val_psnr']]}"
            )
        a, b = results["seed7"], results["seed8"]
        k = min(len(a["val_psnr"]), len(b["val_psnr"]))
        gaps = [abs(x - y) for x, y in zip(a["val_psnr"][:k], b["val_psnr"][:k])]
        summary = {
            "steps": steps,
            "config": "promoted recipe, fused_pairs=true, seeds 7 vs 8, same data order",
            "max_val_psnr_gap_db": max(gaps) if gaps else None,
            "final_val_psnr_gap_db": gaps[-1] if gaps else None,
        }
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "sn_noise.json"), "w") as f:
            json.dump({"summary": summary, **results}, f, indent=2)
        print(json.dumps(summary))
        return

    results = {}
    for fused in (True, False):
        r = run_variant(fused, steps)
        results["pairs" if fused else "nopairs"] = r
        print(
            f"[{'pairs' if fused else 'nopairs'}] steps={steps} "
            f"val_psnr={['%.2f' % p for p in r['val_psnr']]} "
            f"sigma_err mean={r['sigma_rel_err_mean']:.2e} "
            f"max={r['sigma_rel_err_max']:.2e}"
        )
    p, n = results["pairs"], results["nopairs"]
    k = min(len(p["val_psnr"]), len(n["val_psnr"]))
    gaps = [abs(a - b) for a, b in zip(p["val_psnr"][:k], n["val_psnr"][:k])]
    summary = {
        "steps": steps,
        "max_val_psnr_gap_db": max(gaps) if gaps else None,
        "final_val_psnr_gap_db": gaps[-1] if gaps else None,
        "sigma_err_mean_pairs": p["sigma_rel_err_mean"],
        "sigma_err_mean_nopairs": n["sigma_rel_err_mean"],
        "sigma_err_max_pairs": p["sigma_rel_err_max"],
        "sigma_err_max_nopairs": n["sigma_rel_err_max"],
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "sn_ab.json"), "w") as f:
        json.dump({"summary": summary, **results}, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
