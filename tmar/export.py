"""Serving-artifact export: compiled graph + weights in ONE portable file.

``jax.export`` serializes the jitted generator forward (weights baked in as
constants) to a versioned StableHLO artifact that a serving host can
deserialize and run with jax alone — no tmar model code, no checkpoint
plumbing, no re-tracing.  This is the TPU-native replacement for the
reference's serve-time story, which re-instantiates the torch model class
and loads a ``.pth`` at every eval entry (reference
testing/test_finetuned_model.py:60-101, evaluation/benchmark_tests/*):
here the artifact IS the model.

Shapes are static per artifact (XLA compiles static shapes; the eval
pipeline itself serves fixed buckets — 128²/416→448²/64-tile), so export
one artifact per serving bucket via ``export_generator`` or the
``tmar export`` CLI.

Usage::

    blob = export_generator(gen, params, batch=8, size=512)
    save_artifact("ngswin_512b8.tmarx", blob)
    ...
    fn = load_artifact("ngswin_512b8.tmarx")     # serving host
    y = fn(x)                                    # [8, 512, 512, 1] -> same
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = [
    "export_generator",
    "save_artifact",
    "load_artifact",
    "main",
]


def export_generator(
    model,
    params,
    *,
    batch: int = 8,
    size: int = 512,
    in_chans: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``model.apply({'params': params}, x)`` for a fixed input
    bucket ``[batch, size, size, in_chans] f32`` to jax.export bytes.

    ``platforms``: lowering targets (default: the current backend).  Pass
    ``("tpu",)`` to build a TPU serving artifact from a CPU host when the
    model avoids interpret-mode-only paths.
    """
    x_spec = jax.ShapeDtypeStruct((batch, size, size, in_chans), jnp.float32)

    def fwd(x):
        return model.apply({"params": params}, x)

    exported = jax_export.export(
        jax.jit(fwd), platforms=tuple(platforms) if platforms else None
    )(x_spec)
    return exported.serialize()


def save_artifact(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_artifact(path: str) -> Callable[[np.ndarray], jax.Array]:
    """Deserialize an artifact into a jitted callable (no tmar model code
    involved; shape/dtype-checked by the artifact's calling convention)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return jax.jit(exported.call)


def main(argv=None) -> int:
    """``tmar export`` — build a serving artifact from a checkpoint."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="tmar export",
        description="Export a generator checkpoint to a serving artifact "
        "(jax.export StableHLO; weights baked in)",
    )
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir or torch .pth file")
    ap.add_argument("--set", nargs="*", default=[])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default=None,
                    help="output path (default ngswin_<size>b<batch>.tmarx)")
    ap.add_argument("--platform", default=None,
                    help="lowering target (default: current backend), "
                    "e.g. tpu or cpu")
    ap.add_argument("--torch", action="store_true",
                    help="write a reference-layout torch .pth instead of a "
                    "StableHLO artifact (tmar.checkpoint.torch_export; runs "
                    "in the reference torch NGswin via "
                    "tools/adapter_torch_ngswin.py)")
    args = ap.parse_args(argv)

    from tmar.cli import _load_generator_params, _parse_sets
    from tmar.train import load_config
    from tmar.train.trainer import build_generator

    cfg = load_config(args.config, _parse_sets(args.set))
    gen = build_generator(cfg)
    params = _load_generator_params(args.checkpoint, gen, cfg)
    if args.torch:
        from tmar.checkpoint import save_pth

        out = args.out or "ngswin_exported.pth"
        save_pth(params, out)
        print(f"[export] {out}: {os.path.getsize(out) / 1e6:.1f} MB "
              "(torch state_dict, reference NGswin layout)")
        return 0
    blob = export_generator(
        gen, params,
        batch=args.batch, size=args.size, in_chans=cfg.model.in_chans,
        platforms=(args.platform,) if args.platform else None,
    )
    out = args.out or f"ngswin_{args.size}b{args.batch}.tmarx"
    save_artifact(out, blob)
    print(f"[export] {out}: {os.path.getsize(out) / 1e6:.1f} MB "
          f"(batch {args.batch}, {args.size}², platform "
          f"{args.platform or jax.default_backend()})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
