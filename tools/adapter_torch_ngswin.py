"""Out-of-process comparison entry: the REFERENCE PyTorch NGswin.

Runs the reference's own torch model (loaded through the tests/torch_ref.py
shim — reference models/generator/ngswin.py) inside its own interpreter,
speaking the ``tmar.eval.adapters.SubprocessAdapter`` npz/npy protocol.
Weights come from a ``.pth`` exported from a TRAINED tmar checkpoint
(``tmar.checkpoint.save_pth`` / ``tools/export_pth.py``), so entering
this adapter next to the ``tmar`` entry puts the SAME weights through BOTH
frameworks end-to-end on the comparison protocol — the BASELINE.md
north-star (PSNR within 0.1 dB), measured at program scale instead of
element-wise (VERDICT r3 #4; reference per-model loaders:
evaluation/benchmark_comparison_syndeeplesion.py:317-547).

Pre/post matches the tmar entry exactly (adapters.make_neg11_runner):
clip(Xma, 0, 1) * 2 - 1 -> forward -> (out + 1) / 2.

Usage:
  python tools/adapter_torch_ngswin.py --pth ckpt.pth [model flags] \
      <input.npz> <output.npy>
"""

import argparse
import os
import sys

import numpy as np

# deliberately NOT tools/_path.py: that bootstrap imports jax (compile-cache
# config), and this adapter must stay a pure-torch process — no jax import,
# no TPU tunnel contention with the harness that spawned it
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="exported tmar checkpoint (.pth)")
    ap.add_argument("--embed-dim", type=int, default=64)
    ap.add_argument("--depths", type=int, nargs="+", default=[6, 4, 4])
    ap.add_argument("--num-heads", type=int, nargs="+", default=[6, 4, 4])
    ap.add_argument("--dec-dim", type=int, default=64)
    ap.add_argument("--dec-depths", type=int, default=6)
    ap.add_argument("--dec-num-heads", type=int, default=6)
    ap.add_argument("--window-size", type=int, default=8)
    ap.add_argument("--training-img-size", type=int, default=128)
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args()

    import torch

    from torch_ref import load_reference_generator_module

    ref = load_reference_generator_module()
    model = ref.NGswin(
        training_img_size=args.training_img_size,
        ngrams=(2, 2, 2, 2),
        in_chans=1,
        embed_dim=args.embed_dim,
        depths=tuple(args.depths),
        num_heads=tuple(args.num_heads),
        dec_dim=args.dec_dim,
        dec_depths=args.dec_depths,
        dec_num_heads=args.dec_num_heads,
        window_size=args.window_size,
        mlp_ratio=2.0,
        qkv_bias=True,
    ).eval()

    blob = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = blob.get("netG_state_dict", blob)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise SystemExit(f"unexpected keys in {args.pth}: {unexpected[:5]}")
    bad = [
        k for k in missing
        if not (k.endswith("relative_position_index") or k.endswith("attn_mask"))
    ]
    if bad:
        raise SystemExit(f"missing weights in {args.pth}: {bad[:5]}")

    with np.load(args.input) as data:
        xma = np.asarray(data["Xma"], np.float32)
    x = np.clip(xma, 0.0, 1.0) * 2.0 - 1.0
    with torch.no_grad():
        out = model(torch.from_numpy(x[None, None])).numpy()[0, 0]
    np.save(args.output, np.clip((out + 1.0) / 2.0, 0.0, 1.0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
