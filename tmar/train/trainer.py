"""Trainer — the orchestration loop around the jit'd train step.

Covers the reference's combined-trainer surface (train_combined.py:133-740)
as a reusable class instead of a script: run-dir layout
(checkpoints/samples/logs), per-epoch checkpointing with retention, periodic
validation with best-model-by-PSNR tracking, CSV/JSON metric history, loss
curves, resume-from-checkpoint, and TTUR dual-Adam optimisation — all of it
config-driven (variants/ablations are LossWeights/DiscConfig overrides).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tmar.core.mesh import create_mesh, replicate
from tmar.data import Loader, SpineWebDataset, SynDeepLesionTrainDataset, SyntheticMARDataset
from tmar.nn import MultiScaleDiscriminator, NGswin
from tmar.nn.baselines import DCGANCritic
from tmar.ops import Radon
from tmar.train.config import TrainConfig
from tmar.train.schedules import build_optimizer, build_schedule
from tmar.train.steps import create_train_state, make_eval_step, make_train_step
from tmar.checkpoint.io import CheckpointManager


def build_generator(cfg: TrainConfig):
    import jax.numpy as jnp

    m = cfg.model
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    arch = getattr(m, "arch", "ngswin")
    if arch != "ngswin":
        # benchmark-architecture fine-tuning (reference
        # scripts/finetune_all_benchmarks.py trains third-party image-domain
        # models with the same rec/edge recipe; here any in-tree baseline
        # slots into the identical trainer).
        from tmar.nn import BAFResNet, DenoisingTransformer, RedCNN

        archs = {
            "redcnn": lambda: RedCNN(dtype=dtype),
            "transformer": lambda: DenoisingTransformer(dtype=dtype),
            "bafresnet": lambda: BAFResNet(dtype=dtype),
        }
        if arch not in archs:
            raise ValueError(f"unknown generator arch {arch!r}")
        return archs[arch]()
    return NGswin(
        ngrams=tuple(m.ngrams),
        in_chans=m.in_chans,
        embed_dim=m.embed_dim,
        depths=tuple(m.depths),
        num_heads=tuple(m.num_heads),
        dec_dim=m.dec_dim,
        dec_depths=m.dec_depths,
        dec_num_heads=m.dec_num_heads,
        window_size=m.window_size,
        mlp_ratio=m.mlp_ratio,
        qkv_bias=m.qkv_bias,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        use_pallas_attention=getattr(m, "use_pallas_attention", False),
        xla_window_merge=getattr(m, "xla_window_merge", False),
        attn_backward=getattr(m, "attn_backward", "auto"),
        remat=getattr(m, "remat", False),
    )


def build_discriminator(cfg: TrainConfig):
    import jax.numpy as jnp

    d = cfg.disc
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    if d.kind == "multiscale":
        return MultiScaleDiscriminator(
            base_channels=d.base_channels,
            num_layers=d.num_layers,
            num_scales=d.num_scales,
            use_sn=d.use_sn,
            dtype=dtype,
        )
    if d.kind == "dcgan":
        return DCGANCritic(ndf=d.base_channels, dtype=dtype)
    raise ValueError(f"unknown discriminator kind {d.kind!r}")




def build_dataset(cfg: TrainConfig):
    d = cfg.data
    if d.dataset == "synthetic":
        return SyntheticMARDataset(size=d.patch_size, length=d.samples_per_epoch, base_seed=d.seed)
    if d.dataset == "synthetic_cache":
        # one-time materialisation of full 416² slices, then mmap reads +
        # random 128² crops at train time: live synthesis caps at ~52
        # samples/s single-thread — below one chip's ~71 samples/s step
        # consumption — while the cache path measured 6.9k samples/s
        # (PERF.md host pipeline).  Crop-from-full-slice also matches the
        # reference's SynDeepLesion patch protocol (datasets.py random
        # crops of full slices) more closely than native-resolution
        # synthesis.
        import tempfile

        from tmar.data import ShardCachedDataset, build_shard_cache

        cache_dir = d.cache_dir or os.path.join(
            tempfile.gettempdir(), f"tmar_synth_cache_{d.cache_slices}_{d.seed}"
        )
        if not os.path.isfile(os.path.join(cache_dir, "index.json")):
            build_shard_cache(
                SyntheticMARDataset(size=416, length=d.cache_slices, base_seed=d.seed),
                cache_dir, shard_size=64,
            )
        return ShardCachedDataset(
            cache_dir, patch_size=d.patch_size, augment=True, seed=d.seed,
            length=d.samples_per_epoch,
        )
    if d.dataset == "syndeeplesion":
        return SynDeepLesionTrainDataset(
            d.root, patch_size=d.patch_size, length=d.samples_per_epoch, seed=d.seed
        )
    if d.dataset == "spineweb":
        return SpineWebDataset(
            d.spineweb_artifact, d.spineweb_clean, patch_size=d.patch_size, train=True,
            seed=d.seed, length=d.samples_per_epoch,
        )
    raise ValueError(f"unknown dataset {d.dataset!r}")


def build_val_dataset(cfg: TrainConfig):
    """Validation split for each dataset (reference MARValDataset — last 10%
    of the train tree at full slices, datasets.py:165-236; SpineWeb test
    split; a held-out seeded synthetic set otherwise)."""
    d = cfg.data
    if d.dataset in ("synthetic", "synthetic_cache"):
        # held-out seeded set, synthesized live (only ~32 samples per val):
        # base_seed offset guarantees no overlap with the train slices
        return SyntheticMARDataset(
            size=d.patch_size, length=min(32, d.samples_per_epoch),
            base_seed=d.seed + 10_000,
        )
    if d.dataset == "syndeeplesion":
        from tmar.data import SynDeepLesionValDataset

        return SynDeepLesionValDataset(d.root)
    if d.dataset == "spineweb":
        return SpineWebDataset(d.spineweb_artifact, d.spineweb_clean, train=False)
    raise ValueError(f"unknown dataset {d.dataset!r}")


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh=None, val_dataset=None):
        self.cfg = cfg
        par = getattr(cfg, "parallel", None)
        mode = getattr(par, "mode", "dp") if par else "dp"
        if mode not in ("dp", "tp", "fsdp"):
            raise ValueError(f"unknown parallel.mode {mode!r} (dp | tp | fsdp)")
        if mode == "tp" and getattr(cfg.model, "use_pallas_attention", False):
            raise ValueError(
                "parallel.mode=tp requires the plain XLA attention path "
                "(set model.use_pallas_attention=false) — tensor parallelism "
                "Megatron-splits the qkv/proj weights across heads, and the "
                "fused Pallas kernels are written against the full head set "
                "(packed per-head weight layout, per-head logit scales). "
                "FSDP composes: params are ZeRO-sharded at rest and "
                "all-gathered at use, so the kernels see full tensors."
            )
        mp = getattr(par, "model_parallel", 1) if par else 1
        if mode == "tp" and mp < 2:
            raise ValueError(
                "parallel.mode=tp needs parallel.model_parallel >= 2"
            )
        if mode != "tp":
            mp = 1
        self.parallel_mode = mode
        self.mesh = (
            mesh if mesh is not None
            else create_mesh(cfg.n_devices, model_parallel=mp)
        )
        self.generator = build_generator(cfg)
        self.discriminator = build_discriminator(cfg)

        o = cfg.optim
        total_steps = max(
            1, cfg.num_epochs * (cfg.data.samples_per_epoch // cfg.data.batch_size)
        )
        llrd = {"decay": o.llrd_decay} if o.llrd_decay else None
        g_params_shapes = None
        if llrd:
            # LLRD scales depend only on parameter PATHS — an eval_shape init
            # yields the tree without computing values
            g_params_shapes = jax.eval_shape(
                self.generator.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.data.patch_size, cfg.data.patch_size,
                           cfg.model.in_chans)),
            )["params"]
        g_tx = build_optimizer(
            o.lr_g, o.beta1, o.beta2,
            schedule=build_schedule(o, o.lr_g, total_steps),
            grad_clip=o.grad_clip, llrd=llrd, params=g_params_shapes,
            fused=o.fused_update,
        )
        d_tx = build_optimizer(
            o.lr_d, o.beta1, o.beta2,
            schedule=build_schedule(o, o.lr_d, total_steps),
            grad_clip=o.grad_clip, fused=o.fused_update,
        )
        self.g_tx, self.d_tx = g_tx, d_tx

        projector = None
        if cfg.radon.enabled and cfg.loss.phys:
            import jax as _jax

            prec = {
                "highest": _jax.lax.Precision.HIGHEST,
                "high": _jax.lax.Precision.HIGH,
                "default": _jax.lax.Precision.DEFAULT,
            }[cfg.radon.precision]
            projector = Radon(
                cfg.data.patch_size,
                np.linspace(0, np.pi, cfg.radon.num_angles, endpoint=False),
                precision=prec,
            )
        self.projector = projector

        ema_decay = getattr(o, "ema_decay", 0.0)
        self.state = create_train_state(
            jax.random.PRNGKey(cfg.seed), self.generator, self.discriminator,
            g_tx, d_tx, cfg.data.patch_size, cfg.model.in_chans,
            ema_decay=ema_decay,
        )
        # State placement per parallel.mode: replicated for dp; TP/FSDP
        # sharding trees from tmar.core.mesh otherwise (XLA derives the
        # collectives — psum / all-gather / reduce-scatter — from these
        # annotations alone).
        if self.parallel_mode == "dp":
            self.state_shardings = None
            self.state = replicate(self.mesh, self.state)
        else:
            from tmar.core.mesh import gan_state_shardings

            self.state_shardings = gan_state_shardings(
                self.mesh, self.state,
                tensor_parallel=(self.parallel_mode == "tp"),
                fsdp=(self.parallel_mode == "fsdp"),
            )
            self.state = jax.device_put(
                jax.device_get(self.state), self.state_shardings
            )
        self.train_step = make_train_step(
            self.generator, self.discriminator, g_tx, d_tx, cfg.loss,
            projector=projector, mesh=self.mesh,
            fused_pairs=cfg.disc.fused_pairs,
            state_shardings=self.state_shardings,
            ema_decay=ema_decay,
        )
        self.eval_step = make_eval_step(self.generator, mesh=self.mesh)

        run_name = cfg.run_name or time.strftime("run_%Y%m%d_%H%M%S")
        self.run_dir = os.path.join(cfg.run_dir, run_name)
        for sub in ("checkpoints", "samples", "logs"):
            os.makedirs(os.path.join(self.run_dir, sub), exist_ok=True)
        self.ckpt = CheckpointManager(
            os.path.join(self.run_dir, "checkpoints"), keep_last_n=cfg.keep_last_n
        )
        self.history: list = []
        self.val_history: list = []
        self.best_psnr = -np.inf
        self.start_epoch = 0
        self.val_dataset = val_dataset
        # TensorBoard-compatible scalar stream (reference
        # train_combined.py:536-544 logs per-loss scalars + Val/*)
        from tmar.utils.tfevents import TBWriter

        self.tb = TBWriter(os.path.join(self.run_dir, "tb"))
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(cfg.to_dict(), f, indent=2, default=str)

    # ------------------------------------------------------------------ io
    def resume(self, step: Optional[int] = None) -> bool:
        """Restore the latest (or a specific) checkpoint; returns success."""
        restored = self.ckpt.restore(self.state, step=step)
        if restored is None:
            return False
        state, meta = restored
        if self.state_shardings is None:
            self.state = replicate(self.mesh, state)
        else:
            self.state = jax.device_put(state, self.state_shardings)
        self.start_epoch = int(meta.get("epoch", 0))
        self.best_psnr = float(meta.get("best_psnr", -np.inf))
        return True

    # ----------------------------------------------------------------- loop
    def fit(self, num_epochs: Optional[int] = None, progress: bool = True):
        cfg = self.cfg
        epochs = num_epochs or cfg.num_epochs
        loader = Loader(
            build_dataset(cfg),
            batch_size=cfg.data.batch_size,
            num_workers=cfg.data.num_workers,
            seed=cfg.data.seed,
            mesh=self.mesh,
        )
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            # metric accumulation stays ON DEVICE (tiny async scalar adds):
            # a per-step float(v) readback would fence the pipeline every
            # step and serialize host data prep with device compute
            # (measured 2.5 vs 8.85 steps/s wall at b8·128², PERF.md)
            epoch_acc = None
            n = 0
            for i, batch in enumerate(loader):
                self.state, metrics = self.train_step(self.state, batch)
                n += 1
                epoch_acc = (
                    metrics if epoch_acc is None
                    else jax.tree_util.tree_map(lambda a, b: a + b, epoch_acc, metrics)
                )
                if (i + 1) % cfg.log_every == 0 or i == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    step_no = int(self.state.step)
                    self.tb.scalars(
                        {f"Train/{k}": v for k, v in host.items()}, step_no
                    )
                    host.update(epoch=epoch, iter=i, step=step_no)
                    self.history.append(host)
                    if progress:
                        msg = " ".join(f"{k}={v:.4f}" for k, v in host.items()
                                       if k.startswith("loss"))
                        print(f"[epoch {epoch+1}/{epochs} it {i+1}] {msg}", flush=True)
            epoch_metrics = (
                {k: float(v) for k, v in epoch_acc.items()} if epoch_acc else {}
            )
            wall = time.time() - t0
            epoch_summary = {k: v / max(n, 1) for k, v in epoch_metrics.items()}
            epoch_summary.update(epoch=epoch, wall_s=wall, steps_per_s=n / wall)

            if (epoch + 1) % cfg.val_every_n_epochs == 0 and self.val_dataset is not None:
                val = self.validate()
                self.tb.scalars(
                    {f"Val/{k}": v for k, v in val.items()}, int(self.state.step)
                )
                epoch_summary.update({f"val_{k}": v for k, v in val.items()})
                if val["psnr"] > self.best_psnr:
                    self.best_psnr = val["psnr"]
                    self.ckpt.save(
                        self.state,
                        step=int(self.state.step),
                        meta={"epoch": epoch + 1, "best_psnr": self.best_psnr},
                        best=True,
                    )
            self.val_history.append(epoch_summary)

            if (epoch + 1) % cfg.checkpoint_every_n_epochs == 0:
                self.ckpt.save(
                    self.state,
                    step=int(self.state.step),
                    meta={"epoch": epoch + 1, "best_psnr": self.best_psnr},
                )
            self._write_logs()
        return self.state

    def validate(
        self,
        max_batches: int = 16,
        save_samples: bool = True,
        full_metrics: bool = True,
    ) -> Dict[str, float]:
        """Validation with the reference's full metric families.

        Device side computes MSE/PSNR (the cheap every-epoch signal,
        train_combined.py:586-650); when ``full_metrics`` is set the host
        additionally computes SSIM/MAE/RMSE plus the regional
        metal/band/non-metal and HU-domain families the reference's ablation
        validation reports (run_ablation_studies.py:1656-1843)."""
        # pad_last: a val split smaller than one batch must still validate
        # (the r5 h5prod run's 2-slice SynDeepLesion val split produced ZERO
        # batches under drop_last → NaN val PSNR and no best checkpoint);
        # cyclic padding keeps the jit shape bucket and mesh divisibility
        loader = Loader(
            self.val_dataset,
            batch_size=self.cfg.data.batch_size,
            shuffle=False,
            num_workers=self.cfg.data.num_workers,
            mesh=self.mesh,
            drop_last=False,
            pad_last=True,
        )
        psnrs, mses = [], []
        extra: Dict[str, list] = {}
        # validate with the EMA weights when tracked (they are what the
        # best checkpoint serves); raw g_params otherwise
        g_eval = (
            self.state.g_ema if self.state.g_ema is not None
            else self.state.g_params
        )
        if self.state_shardings is not None:
            # TP/FSDP-sharded params: gather to the replicated layout the
            # eval step's in_shardings expect (an on-device all-gather)
            g_eval = replicate(self.mesh, g_eval)
        for i, batch in enumerate(loader):
            if i >= max_batches:
                break
            batch = dict(batch)
            vm = batch.pop("valid", None)
            B = batch["ct"].shape[0]
            n_valid = (
                int(np.asarray(jax.device_get(vm)).sum()) if vm is not None else B
            )
            fake, m = self.eval_step(g_eval, batch)
            if B % max(n_valid, 1) == 0:
                # full batch, or cyclic padding with an exact mean (each
                # distinct sample appears B/n_valid times)
                psnrs.append(float(m["psnr"]))
                mses.append(float(m["mse"]))
            else:
                fk_p = np.asarray(jax.device_get(fake))[:n_valid]
                gt_p = np.asarray(jax.device_get(batch["gt"]))[:n_valid]
                per_mse = np.mean((fk_p - gt_p) ** 2, axis=(1, 2, 3))
                mses.append(float(per_mse.mean()))
                psnrs.append(
                    float(np.mean(10.0 * np.log10(4.0 / np.maximum(per_mse, 1e-12))))
                )
            if full_metrics:
                from tmar.eval import metrics as M

                fk = np.asarray(jax.device_get(fake))[..., 0]
                gt = np.asarray(jax.device_get(batch["gt"]))[..., 0]
                ct = np.asarray(jax.device_get(batch["ct"]))[..., 0]
                for b in range(min(fk.shape[0], n_valid)):
                    p01 = np.clip((fk[b] + 1) / 2, 0, 1)
                    g01 = np.clip((gt[b] + 1) / 2, 0, 1)
                    row = {
                        "ssim": M.ssim(p01, g01),
                        "mae": M.mae(p01, g01),
                        "rmse": M.rmse(p01, g01),
                    }
                    row.update(M.compute_regional_metrics(fk[b], gt[b], ct[b]))
                    hu = M.compute_hu_accuracy(p01, g01)
                    row.update({k: v for k, v in hu.items() if k.endswith("MAE") or k.endswith("RMSE")})
                    row.update(M.hu_tolerance_rates(p01, g01))
                    for k, v in row.items():
                        extra.setdefault(k, []).append(float(v))
            if i == 0 and save_samples:
                self._save_sample_grid(batch, fake)
        out = {"psnr": float(np.mean(psnrs)), "mse": float(np.mean(mses))}
        out.update({k: float(np.mean(v)) for k, v in extra.items()})
        return out

    def _save_sample_grid(self, batch, fake, max_rows: int = 4):
        """Input / restored / target triplet grid (the reference's periodic
        sample images, train_combined.py:546-558)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        ct = np.asarray(jax.device_get(batch["ct"]))[..., 0]
        gt = np.asarray(jax.device_get(batch["gt"]))[..., 0]
        fk = np.asarray(jax.device_get(fake))[..., 0]
        n = min(max_rows, ct.shape[0])
        fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
        for r in range(n):
            for c, (img, title) in enumerate(
                ((ct[r], "input"), (fk[r], "restored"), (gt[r], "target"))
            ):
                axes[r][c].imshow((img + 1) / 2, cmap="gray", vmin=0, vmax=1)
                if r == 0:
                    axes[r][c].set_title(title)
                axes[r][c].axis("off")
        fig.tight_layout()
        fig.savefig(
            os.path.join(self.run_dir, "samples", f"step_{int(self.state.step):08d}.png"),
            dpi=110,
        )
        plt.close(fig)

    def _write_logs(self):
        import csv

        self.tb.flush()
        logs = os.path.join(self.run_dir, "logs")
        if self.history:
            with open(os.path.join(logs, "training_history.csv"), "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=sorted({k for h in self.history for k in h}))
                w.writeheader()
                w.writerows(self.history)
        if self.val_history:
            with open(os.path.join(logs, "validation_history.csv"), "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=sorted({k for h in self.val_history for k in h}))
                w.writeheader()
                w.writerows(self.val_history)
        with open(os.path.join(logs, "summary.json"), "w") as f:
            json.dump(
                {
                    "best_psnr": self.best_psnr,
                    "epochs": len(self.val_history),
                    "last": self.val_history[-1] if self.val_history else None,
                },
                f,
                indent=2,
            )
