"""Out-of-process comparison entry: tmar-finetuned RedCNN / DenoisingTransformer
running in PURE TORCH under the harness's protocol-core npz/npy contract.

Entered through ``tmar-compare --adapter name=x255:...`` (or ``sparse:``),
which wraps this subprocess with the in-repo protocol runner
(tmar.eval.adapters.make_x255_runner / make_sparse_view_runner): the
HARNESS does the reference's per-model normalization (×255 images,
sparse-view FBP, masks) and postprocessing (÷255 / clamp-to-0.5); THIS
process only consumes the protocol arrays and returns a ×255 prediction —
exactly the seam the reference's third-party models sit behind
(evaluation/benchmark_comparison_syndeeplesion.py:553-875).

Input npz keys by protocol (written by tmar.eval.adapters.SubprocessCore):
  x255:   Xma255, XLI255, non_mask                       -> out255
  sparse: Xma255, XLI255, Mask, Sma255, SLI255, TrDC     -> out255
  (raw SubprocessAdapter samples — Xma/XLI/... in [0,1] — also accepted)

The model is an image-domain restorer trained on [0,1] inputs
(tmar-finetune), so its native preprocessing is out = model(Xma255/255)·255.

Usage:
  python tools/adapter_torch_baseline.py --arch redcnn \
      --params finetune_results/redcnn_finetuned.pkl <input.npz> <output.npy>
"""

import argparse
import os
import pickle
import sys

import numpy as np

# jax-free on purpose (no tools/_path.py): a torch subprocess must not open
# a second TPU-tunnel connection under the harness that spawned it
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=["redcnn", "transformer"], required=True)
    ap.add_argument("--params", required=True,
                    help="tmar-finetune numpy param pickle (.pkl)")
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args()

    import torch

    from torch_baselines import load_baseline

    with open(args.params, "rb") as f:
        params = pickle.load(f)
    model = load_baseline(args.arch, params)

    data = np.load(args.input)
    if "Xma255" in data:            # protocol-core contract (×255 domain)
        x01 = np.clip(data["Xma255"].astype(np.float32) / 255.0, 0.0, 1.0)
        scale = 255.0
    else:                           # raw SubprocessAdapter sample ([0,1])
        x01 = np.clip(data["Xma"].astype(np.float32), 0.0, 1.0)
        scale = 1.0

    with torch.no_grad():
        out01 = model(torch.from_numpy(x01[None, None]))[0, 0].numpy()
    np.save(args.output, np.clip(out01, 0.0, 1.0) * scale)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
