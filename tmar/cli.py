"""Command-line entry points: tmar-train / tmar-test / tmar-ablate.

The reference promises console scripts (setup.py:49-54 ``transmargan-train``/
``transmargan-test``) that point at module-level scripts with interactive
``input()`` prompts; here they are real argparse CLIs over the config system.

Usage:
    tmar-train --config tmar/configs/train_syndeeplesion.yaml \
               --variant full --set data.batch_size=16
    tmar-test  --config ... --checkpoint runs/run_x/checkpoints --tiled
    tmar-ablate --config ... --ablations A1_no_physics B2_no_spectral_norm
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, List


def _honor_env_platforms() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env var authoritative.

    Some environments pin ``jax_platforms`` to a remote accelerator backend
    in a sitecustomize at interpreter start, which silently overrides the
    env var — so ``JAX_PLATFORMS=cpu tmar-train …`` would still dial the
    accelerator (and hang if it's unreachable).  Re-assert the user's
    explicit choice via jax.config before any backend initialises.
    """
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        try:
            import jax

            jax.config.update("jax_platforms", p)
        except Exception:
            pass
    _enable_persistent_cache()


def _enable_persistent_cache() -> None:
    """Point jax at the repo-local persistent compilation cache.

    Remote-TPU compiles through the tunnel take minutes; bench.py and the
    tools/ scripts already share ``.jax_cache/`` — without this the CLIs
    recompiled the full 416² model on every invocation (~20 min of the
    first tmar-compare run was tunnel compiles).
    """
    try:
        import jax

        cache = os.environ.get(
            "TMAR_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _parse_sets(pairs) -> Dict[str, Any]:
    import yaml

    # argparse action="append" + nargs="*" yields a list of lists (one per
    # --set occurrence) — flatten so both `--set a=1 b=2` and repeated
    # `--set a=1 --set b=2` work (repeats used to silently drop all but the
    # last occurrence)
    flat: List[str] = []
    for p in pairs or []:
        flat.extend(p) if isinstance(p, list) else flat.append(p)
    out = {}
    for p in flat:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = yaml.safe_load(v)
    return out


def train(argv=None) -> int:
    _honor_env_platforms()
    ap = argparse.ArgumentParser(prog="tmar-train", description="Train TransMAR on TPU")
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--variant", default=None, help="variant/ablation name (baseline, v1..v5, full, A*, B*)")
    ap.add_argument("--set", nargs="*", action="append", default=[], help="dotted config overrides key=value (repeatable)")
    ap.add_argument("--resume", action="store_true", help="resume from latest checkpoint in run dir")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--no-val", action="store_true", help="skip periodic validation")
    args = ap.parse_args(argv)

    from tmar.train import Trainer, load_config, resolve_variant
    from tmar.train.trainer import build_val_dataset

    cfg = load_config(args.config, _parse_sets(args.set))
    if args.variant:
        cfg = resolve_variant(cfg, args.variant)
        cfg.variant = args.variant
    trainer = Trainer(
        cfg, val_dataset=None if args.no_val else build_val_dataset(cfg)
    )
    if args.resume:
        ok = trainer.resume()
        print(f"[resume] {'restored from epoch ' + str(trainer.start_epoch) if ok else 'no checkpoint found, fresh start'}")
    trainer.fit(num_epochs=args.epochs)
    print(json.dumps({"run_dir": trainer.run_dir, "best_psnr": trainer.best_psnr}))
    return 0


def test(argv=None) -> int:
    _honor_env_platforms()
    ap = argparse.ArgumentParser(prog="tmar-test", description="Evaluate a checkpoint")
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", required=True, help="orbax checkpoint dir or torch .pth file")
    ap.add_argument("--set", nargs="*", action="append", default=[])
    ap.add_argument("--tiled", action="store_true", help="64/32 overlapping tiled inference")
    ap.add_argument("--out", default="test_results")
    ap.add_argument("--max-samples", type=int, default=200)
    args = ap.parse_args(argv)

    import numpy as np

    from tmar.train import load_config
    from tmar.train.trainer import build_generator
    from tmar.eval import full_slice_eval, make_inference_fn, psnr as _psnr, ssim as _ssim
    from tmar.eval.inference import make_tiled_eval_jit
    from tmar.eval.metrics import mae as _mae, rmse as _rmse

    cfg = load_config(args.config, _parse_sets(args.set))
    gen = build_generator(cfg)
    params = _load_generator_params(args.checkpoint, gen, cfg)
    # tiled mode: extraction + forward + coverage assembly in one jit (one
    # device dispatch per slice); full-slice keeps the plain jit forward
    forward = (
        make_tiled_eval_jit(gen, params) if args.tiled
        else make_inference_fn(gen, params)
    )

    ds = _build_test_dataset(cfg)
    os.makedirs(args.out, exist_ok=True)
    rows = []
    n = min(len(ds), args.max_samples)
    for i in range(n):
        sample = ds[i]
        ct = sample["ct"][None, ..., None]
        gt01 = (sample["gt"] + 1) / 2
        pred = (forward(ct) if args.tiled else full_slice_eval(forward, ct))[0, ..., 0]
        pred01 = np.clip((pred + 1) / 2, 0, 1)
        rows.append(
            {
                "index": i,
                "psnr": _psnr(pred01, gt01),
                "ssim": _ssim(pred01, gt01),
                "mae": _mae(pred01, gt01),
                "rmse": _rmse(pred01, gt01),
            }
        )
    summary = {
        k: float(np.mean([r[k] for r in rows])) for k in ("psnr", "ssim", "mae", "rmse")
    }
    summary["n"] = n
    summary["mode"] = "tiled" if args.tiled else "full_slice"
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump({"summary": summary, "per_sample": rows}, f, indent=2)
    print(json.dumps(summary))
    return 0


def ablate(argv=None) -> int:
    """Ablation sweep with the reference's artifact depth
    (run_ablation_studies.py): train each ablation, evaluate on the full
    test set with global/regional/HU metric + plot families at fixed
    vis-sample indices, then write the cross-ablation summary.
    --inference-only re-evaluates saved checkpoints without training
    (reference run_inference_only, :1884-2134)."""
    _honor_env_platforms()
    ap = argparse.ArgumentParser(prog="tmar-ablate", description="Run the ablation matrix")
    ap.add_argument("--config", default=None)
    ap.add_argument("--ablations", nargs="*", default=None, help="default: all")
    ap.add_argument("--set", nargs="*", action="append", default=[])
    ap.add_argument("--epochs", type=int, default=10, help="reference runs 10-epoch ablations")
    ap.add_argument("--inference-only", action="store_true",
                    help="skip training; restore each ablation's checkpoint "
                         "from its run dir and re-run the evaluation")
    ap.add_argument("--max-eval-samples", type=int, default=None,
                    help="cap the test-set evaluation (default: full set)")
    ap.add_argument("--vis-samples", type=int, default=8,
                    help="fixed seeded visualization samples shared across ablations")
    args = ap.parse_args(argv)

    import numpy as np

    from tmar.eval import make_inference_fn
    from tmar.eval.ablation import cross_ablation_summary, evaluate_run, fixed_vis_indices
    from tmar.train import ABLATIONS, Trainer, load_config, resolve_variant
    from tmar.train.trainer import build_generator, build_val_dataset

    names = args.ablations or sorted(ABLATIONS)
    base_cfg = load_config(args.config, _parse_sets(args.set))
    test_ds = _build_test_dataset(base_cfg)
    vis = fixed_vis_indices(
        min(len(test_ds), args.max_eval_samples or len(test_ds)),
        k=args.vis_samples,
    )
    results = {}
    for name in names:
        cfg = load_config(args.config, _parse_sets(args.set))
        cfg = resolve_variant(cfg, name)
        cfg.variant = name
        cfg.run_name = f"ablation_{name}"
        run_dir = os.path.join(cfg.run_dir, cfg.run_name)
        try:
            history = val_history = None
            if args.inference_only:
                import jax

                gen = build_generator(cfg)
                params = _load_generator_params(
                    os.path.join(run_dir, "checkpoints"), gen, cfg
                )
            else:
                trainer = Trainer(cfg, val_dataset=build_val_dataset(cfg))
                trainer.fit(num_epochs=args.epochs)
                gen, run_dir = trainer.generator, trainer.run_dir
                import jax

                params = jax.device_get(
                    trainer.state.g_ema if trainer.state.g_ema is not None
                    else trainer.state.g_params
                )
                history, val_history = trainer.history, trainer.val_history
            summary = evaluate_run(
                make_inference_fn(gen, params),
                test_ds,
                os.path.join(run_dir, "evaluation"),
                vis_indices=vis,
                max_samples=args.max_eval_samples,
                history=history,
                val_history=val_history,
                name=name,
            )
            results[name] = {"status": "ok", "summary": summary, "run_dir": run_dir}
        except Exception as e:  # record FAILED rows like the reference sweep
            results[name] = {"status": "FAILED", "error": str(e)}
    summary_csv = cross_ablation_summary(results, base_cfg.run_dir)
    print(json.dumps(
        {n: r["status"] for n, r in results.items()}
        | {"summary_csv": summary_csv},
        indent=2,
    ))
    return 0


def compare(argv=None) -> int:
    """Multi-model benchmark comparison (reference
    evaluation/benchmark_comparison_syndeeplesion.py as a CLI)."""
    _honor_env_platforms()
    ap = argparse.ArgumentParser(prog="tmar-compare")
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoints", nargs="*", default=[],
                    help="name=path pairs (orbax dir or .pth); 'identity' allowed")
    ap.add_argument("--adapter", nargs="*", default=[],
                    help="name=[protocol:]<shell command> out-of-process "
                         "adapters; the command gets <input.npz> <output.npy> "
                         "appended.  Without a protocol prefix the raw "
                         "enriched sample crosses the boundary "
                         "(SubprocessAdapter); with x255/x255half/sparse/nmar "
                         "the in-repo preprocessing protocol wraps the "
                         "subprocess as its model core "
                         "(make_protocol_subprocess_runner); sparse/nmar "
                         "need --sinograms")
    ap.add_argument("--dudo", nargs="*", default=[],
                    help="name=<params.pkl> entries for the in-tree "
                         "dual-domain net (tmar-finetune --arch dudo output); "
                         "implies --sinograms")
    ap.add_argument("--dudo-stages", type=int, default=4)
    ap.add_argument("--dudo-channels", type=int, default=32)
    ap.add_argument("--dudo-li", default="train", choices=["train", "sample"],
                    help="dudo entry preprocessing: 'train' rebuilds XLI/SLI "
                         "with the finetune engine's mean-fill construction "
                         "(evaluate on the training-time input distribution); "
                         "'sample' trusts the dataset's LI images")
    ap.add_argument("--sinograms", action="store_true",
                    help="synthesize Sma/SLI/Tr sinograms for dual-domain adapters")
    ap.add_argument("--composites", type=int, default=3,
                    help="composite+profile figures for the first N samples")
    ap.add_argument("--set", nargs="*", action="append", default=[])
    ap.add_argument("--out", default="comparison_results")
    ap.add_argument("--num-samples", type=int, default=25)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import shlex

    from tmar.eval.adapters import (PROTOCOL_CORE_KEYS, SubprocessAdapter,
                                    make_protocol_subprocess_runner)
    from tmar.eval.harness import ModelEntry, run_comparison
    from tmar.eval import make_inference_fn
    from tmar.train import load_config
    from tmar.train.trainer import build_generator

    cfg = load_config(args.config, _parse_sets(args.set))
    entries = []
    for spec in args.checkpoints:
        name, _, path = spec.partition("=")
        if path == "" and name == "identity":
            entries.append(ModelEntry("identity", lambda x: x))
            continue
        gen = build_generator(cfg)
        params = _load_generator_params(path, gen, cfg)
        entries.append(ModelEntry(name, make_inference_fn(gen, params)))
    # adapters parse in two steps: protocol prefixes (sparse/nmar) need the
    # radon operator, which is sized from the dataset below
    adapter_specs = []
    for spec in args.adapter:
        name, _, cmd = spec.partition("=")
        if not cmd:
            raise SystemExit(f"--adapter expects name=[protocol:]command, got {spec!r}")
        protocol = None
        head, sep, rest = cmd.partition(":")
        if sep and head in (*PROTOCOL_CORE_KEYS, "raw"):
            protocol, cmd = (None if head == "raw" else head), rest
        adapter_specs.append((name, protocol, cmd))

    ds = _build_test_dataset(cfg)
    radon = None
    needs_radon = any(p in ("sparse", "nmar") for _, p, _ in adapter_specs)
    if args.sinograms or args.dudo or needs_radon:
        import numpy as np

        from tmar.ops import Radon

        size = ds[0]["ct"].shape[0]
        radon = Radon(
            size, np.linspace(0, np.pi, cfg.radon.num_angles, endpoint=False)
        )

    for name, protocol, cmd in adapter_specs:
        if protocol is None:
            runner = SubprocessAdapter(shlex.split(cmd))
        else:
            runner = make_protocol_subprocess_runner(
                protocol, shlex.split(cmd), radon=radon
            )
        entries.append(ModelEntry(name, runner=runner))
    for spec in args.dudo:
        import pickle

        from tmar.eval.adapters import make_dudo_runner
        from tmar.nn import DuDoMARNet

        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--dudo expects name=params.pkl, got {spec!r}")
        with open(path, "rb") as f:
            dudo_params = pickle.load(f)
        net = DuDoMARNet(
            projector=radon, stages=args.dudo_stages, channels=args.dudo_channels
        )
        entries.append(ModelEntry(name, runner=make_dudo_runner(
            net, dudo_params, radon=radon, li_mode=args.dudo_li,
        )))
    if not entries:
        raise SystemExit("no entries: pass --checkpoints / --adapter / --dudo")
    results = run_comparison(
        entries, ds, args.out, num_samples=args.num_samples, seed=args.seed,
        radon=radon, composite_samples=args.composites,
    )
    print(json.dumps({k: v.get("status") for k, v in results.items()}))
    return 0


def finetune_cmd(argv=None) -> int:
    """Fine-tune a benchmark architecture on paired artifact/clean data,
    optionally with the dual-domain trace-masked sinogram loss (reference
    scripts/finetune_all_benchmarks.py as a CLI)."""
    _honor_env_platforms()
    ap = argparse.ArgumentParser(prog="tmar-finetune")
    ap.add_argument("--arch", default="redcnn",
                    choices=["redcnn", "transformer", "bafresnet", "dudo"],
                    help="benchmark architecture to fine-tune (dudo = the "
                         "in-tree dual-domain unrolled net, tmar.nn.dudo)")
    ap.add_argument("--stages", type=int, default=4,
                    help="dudo only: unrolled proximal iterations")
    ap.add_argument("--channels", type=int, default=32,
                    help="dudo only: cross-stage memory channels")
    ap.add_argument("--freeze-stages", type=int, default=0,
                    help="dudo only: freeze the first N stages + prior "
                         "(reference --mepnet_freeze_stages semantics)")
    ap.add_argument("--artifact-dir", default=None)
    ap.add_argument("--clean-dir", default=None)
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="generate N synthetic pairs instead of reading npy dirs")
    ap.add_argument("--mode", default="patch", choices=["patch", "resize"])
    ap.add_argument("--patch-size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=25,
                    help="reference fine-tunes 25 epochs")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lambda-sino", type=float, default=0.1,
                    help="0 disables the sinogram term (image-domain loop)")
    ap.add_argument("--num-angles", type=int, default=180)
    ap.add_argument("--out", default="finetune_results")
    args = ap.parse_args(argv)

    import numpy as np

    from tmar.data import BenchmarkFinetuneDataset
    from tmar.nn import BAFResNet, DenoisingTransformer, RedCNN
    from tmar.ops import Radon
    from tmar.train import FinetuneWeights, finetune

    if args.synthetic:
        import tempfile

        from tmar.data.synthetic import SyntheticMARDataset

        tmp = tempfile.mkdtemp(prefix="tmar_ft_syn_")
        art, cln = os.path.join(tmp, "artifact"), os.path.join(tmp, "clean")
        os.makedirs(art)
        os.makedirs(cln)
        syn = SyntheticMARDataset(size=args.patch_size, length=args.synthetic)
        for i in range(args.synthetic):
            s = syn[i]
            # store as HU so the dataset's windowing round-trips
            np.save(os.path.join(art, f"{i:04d}.npy"), (s["ct"] + 1) / 2 * 3000 - 1000)
            np.save(os.path.join(cln, f"{i:04d}.npy"), (s["gt"] + 1) / 2 * 3000 - 1000)
        args.artifact_dir, args.clean_dir = art, cln
    if not args.artifact_dir or not args.clean_dir:
        raise SystemExit("pass --artifact-dir/--clean-dir or --synthetic N")

    ds = BenchmarkFinetuneDataset(
        args.artifact_dir, args.clean_dir,
        patch_size=args.patch_size, mode=args.mode,
    )
    projector = None
    if args.lambda_sino or args.arch == "dudo":
        projector = Radon(
            args.patch_size,
            np.linspace(0, np.pi, args.num_angles, endpoint=False),
        )
    freeze_prefixes = ()
    if args.arch == "dudo":
        # the in-tree dual-domain net (reference fine-tunes InDuDoNet-class
        # models with the same loop, finetune_all_benchmarks.py:1523-1650)
        from tmar.nn import DuDoMARNet
        from tmar.train.finetune import dudo_freeze_prefixes

        model = DuDoMARNet(
            projector=projector, stages=args.stages, channels=args.channels
        )
        if args.freeze_stages:
            freeze_prefixes = dudo_freeze_prefixes(args.freeze_stages)
    else:
        model = {"redcnn": RedCNN, "transformer": DenoisingTransformer,
                 "bafresnet": BAFResNet}[args.arch]()
    result = finetune(
        model, ds,
        num_epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weights=FinetuneWeights(sino=args.lambda_sino),
        projector=projector, progress=True,
        freeze_prefixes=freeze_prefixes,
    )
    os.makedirs(args.out, exist_ok=True)
    import pickle

    with open(os.path.join(args.out, f"{args.arch}_finetuned.pkl"), "wb") as f:
        pickle.dump(jax_tree_to_numpy(result["state"].params), f)
    with open(os.path.join(args.out, "history.json"), "w") as f:
        json.dump(result["history"], f, indent=2)
    print(json.dumps({"final": result["history"][-1], "out": args.out}))
    return 0


def jax_tree_to_numpy(tree):
    import jax
    import numpy as np

    return jax.tree.map(lambda a: np.asarray(a), tree)


def _load_generator_params(path: str, gen, cfg):
    import jax
    import jax.numpy as jnp

    if path.endswith(".pth"):
        from tmar.checkpoint import import_ngswin_state_dict, load_torch_checkpoint

        return import_ngswin_state_dict(load_torch_checkpoint(path))
    from tmar.checkpoint.io import CheckpointManager
    from tmar.train.steps import create_train_state
    from tmar.train.trainer import build_discriminator
    import optax

    def _template(ema_decay: float):
        # the template only provides SHAPES (params are input-size-agnostic);
        # init at >=128 so the 3-scale PatchGAN template is constructible
        # even when the TEST config uses a smaller eval patch size
        return create_train_state(
            jax.random.PRNGKey(0), gen, build_discriminator(cfg),
            optax.adam(1e-4), optax.adam(1e-4),
            max(cfg.data.patch_size, 128), cfg.model.in_chans,
            ema_decay=ema_decay,
        )

    def _restore(state):
        restored = mgr.restore(state, best=os.path.isdir(os.path.join(path, "best")))
        if restored is None:
            restored = mgr.restore(state)
        return restored

    mgr = CheckpointManager(path)
    # Whether the saved tree carries g_ema is a property of the TRAINING
    # run, not of this (possibly different) serving config: try the
    # config-implied layout first, and on an orbax structure mismatch retry
    # with the other layout instead of surfacing an opaque pytree error.
    cfg_ema = getattr(cfg.optim, "ema_decay", 0.0)
    try:
        restored = _restore(_template(cfg_ema))
    except Exception:
        restored = _restore(_template(0.0 if cfg_ema else 1.0))
    if restored is None:
        raise SystemExit(f"no checkpoint found under {path}")
    st = restored[0]
    # EMA runs serve the EMA weights (what validation selected "best" by)
    return st.g_ema if st.g_ema is not None else st.g_params


def _build_test_dataset(cfg):
    from tmar.data import SpineWebDataset, SynDeepLesionTestDataset, SyntheticMARDataset

    d = cfg.data
    if d.dataset == "syndeeplesion":
        return SynDeepLesionTestDataset(d.root)
    if d.dataset == "spineweb":
        return SpineWebDataset(
            d.spineweb_artifact, d.spineweb_clean, train=False
        )
    # synthetic fallback: full 416² slices by default, or the configured
    # patch size when one is set (keeps CI/CPU runs fast)
    size = d.patch_size if d.patch_size and d.patch_size != 128 else 416
    return SyntheticMARDataset(size=size, length=32)


def _export_cmd(argv=None) -> int:
    _honor_env_platforms()
    from tmar.export import main as export_main

    return export_main(argv)


_COMMANDS = {
    "train": train,
    "test": test,
    "ablate": ablate,
    "compare": compare,
    "finetune": finetune_cmd,
    "export": _export_cmd,
}


def main(argv=None):
    """Umbrella dispatcher: ``tmar <command> [args]`` (also ``python -m tmar.cli``).

    Each command is separately installed as a ``tmar-<command>`` console
    script (pyproject [project.scripts]); this entry point parses the
    subcommand explicitly rather than sniffing argv[0]."""
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        names = " | ".join(sorted(_COMMANDS))
        print(f"usage: tmar {{{names}}} [options]\n"
              f"run 'tmar <command> -h' for command options")
        return 0 if argv else 2
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; expected one of {sorted(_COMMANDS)}",
              file=sys.stderr)
        return 2
    return _COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
