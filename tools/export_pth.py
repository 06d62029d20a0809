"""Export a trained tmar checkpoint to a reference-layout torch ``.pth``.

The reverse of the ``.pth`` importer (tmar/checkpoint/torch_import.py): loads
an orbax checkpoint dir (best/ preferred, EMA weights when the run tracked
them) and writes a state_dict the REFERENCE torch NGswin
(models/generator/ngswin.py) loads verbatim — unfused qkv, torch-order
flattening, ``main.``-style plain keys.  Feed the result to
``tools/adapter_torch_ngswin.py`` to run the reference model on the SAME
weights as the tmar entry in a ``tmar-compare`` table (BASELINE.md
north-star: end-to-end PSNR parity within 0.1 dB).

Usage (output path first — a trailing positional after ``--set k=v`` would
be consumed by the greedy nargs='*'):
  python tools/export_pth.py out.pth --checkpoint runs/<run>/checkpoints \
      [--config cfg.yaml] [--set k=v ...]
"""
import _path  # noqa: F401  (repo root on sys.path + jax compile cache)
import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (or .pth to re-export)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", nargs="*", action="append", default=[])
    ap.add_argument("output")
    args = ap.parse_args()

    from tmar.checkpoint import save_pth
    from tmar.cli import (_honor_env_platforms, _load_generator_params,
                          _parse_sets, jax_tree_to_numpy)

    # honour JAX_PLATFORMS=cpu (sitecustomize pins the remote backend):
    # exporting weights needs no accelerator and must not contend with a
    # live TPU run for the tunnel
    _honor_env_platforms()
    from tmar.train import load_config
    from tmar.train.trainer import build_generator

    cfg = load_config(args.config, _parse_sets(args.set))
    gen = build_generator(cfg)
    params = jax_tree_to_numpy(_load_generator_params(args.checkpoint, gen, cfg))
    # save_pth runs export_ngswin_state_dict itself (flax tree in, .pth out)
    save_pth(params, args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
