"""Long-horizon convergence evidence (VERDICT r1 item 6).

Trains the FULL recipe — all 11 losses incl. the 180-angle Radon physics
term, TTUR dual-Adam, spectral-norm D — for ~3k steps at b8·128² on
synthetic MAR data (the reference's only training QA was exactly this run,
reference training/train_combined.py:586-650), then writes the loss curves
and the val-PSNR trajectory to ``reports/convergence_r2/``.

Usage:  python examples/convergence_run.py [--steps 3000] [--out reports/convergence_r2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="reports/convergence_r2")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--fused", action="store_true",
                    help="train on the fused Pallas kernel path "
                    "(attn_backward=pallas; pair with TMAR_NGRAM_FUSED=1 "
                    "for the ngram megakernel fwd+bwd)")
    args = ap.parse_args()

    from tmar.data import SyntheticMARDataset
    from tmar.train.config import TrainConfig
    from tmar.train.trainer import Trainer

    cfg = TrainConfig()
    cfg.data.dataset = "synthetic"
    cfg.data.patch_size = args.patch
    cfg.data.batch_size = args.batch
    steps_per_epoch = 100
    cfg.data.samples_per_epoch = steps_per_epoch * args.batch
    cfg.num_epochs = max(1, args.steps // steps_per_epoch)
    cfg.val_every_n_epochs = 2
    cfg.checkpoint_every_n_epochs = 10
    cfg.bf16 = True
    if args.fused:
        # the promoted r2 default recipe (PERF.md A/B matrix winner):
        # fused pallas attention fwd+bwd, ngram megakernel (hardware
        # default), batched real/fake D passes
        cfg.model.use_pallas_attention = True
        cfg.model.attn_backward = "pallas"
        cfg.disc.fused_pairs = True
    else:
        cfg.model.xla_window_merge = True
    cfg.log_every = 50
    cfg.run_dir = "runs"
    cfg.run_name = "convergence_fused" if args.fused else "convergence_r2"
    cfg.seed = 7

    val = SyntheticMARDataset(size=args.patch, length=16, base_seed=4242)
    tr = Trainer(cfg, val_dataset=val)
    tr.fit(progress=True)

    os.makedirs(args.out, exist_ok=True)
    for name in ("training_history.csv", "validation_history.csv"):
        src = os.path.join(tr.run_dir, "logs", name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, name))

    # summary + plot (val_history rows are epoch summaries; val_* keys appear
    # on validation epochs)
    val_rows = [r for r in tr.val_history if "val_psnr" in r]
    psnrs = [float(r["val_psnr"]) for r in val_rows]
    summary = {
        "steps": args.steps,
        "config": "full recipe, b%d x %d^2, bf16, 180-angle radon" % (
            args.batch, args.patch),
        "val_psnr_first": psnrs[0] if psnrs else None,
        "val_psnr_last": psnrs[-1] if psnrs else None,
        "val_psnr_best": max(psnrs) if psnrs else None,
        "val_psnr_trajectory": psnrs,
        "final_losses": {k: v for k, v in tr.history[-1].items()} if tr.history else {},
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "val_psnr_trajectory"}, default=float))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        g = [float(r["loss_g"]) for r in tr.val_history]
        d = [float(r["loss_d"]) for r in tr.val_history]
        axes[0].plot(g, label="loss_G (epoch mean)")
        axes[0].plot(d, label="loss_D (epoch mean)")
        axes[0].set_xlabel("epoch")
        axes[0].legend()
        axes[0].set_title("losses (b%d x %d², full recipe)" % (args.batch, args.patch))
        epochs = [int(r["epoch"]) for r in val_rows]
        axes[1].plot(epochs, psnrs, marker="o")
        axes[1].set_xlabel("epoch")
        axes[1].set_ylabel("val PSNR (dB)")
        axes[1].set_title("validation PSNR trajectory")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "convergence.png"), dpi=130)
        print("wrote", os.path.join(args.out, "convergence.png"))
    except Exception as e:  # headless-safe: curves CSVs are the evidence
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
