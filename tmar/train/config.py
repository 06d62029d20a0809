"""Unified training configuration.

The reference scatters configuration across module-level constants
(train_combined.py:75-128), argparse in eval scripts, and YAML files that are
never parsed (SURVEY.md §5.6).  Here the YAML schema of
configs/train_syndeeplesion.yaml is made real: one dataclass, loadable from
YAML, overridable from the CLI, covering model, optimizer (TTUR), loss
weights, metal parameters, radon geometry, checkpointing and logging.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import yaml

from tmar.losses import LossWeights


@dataclasses.dataclass
class ModelConfig:
    arch: str = "ngswin"  # ngswin | redcnn | transformer | bafresnet
    ngrams: Tuple[int, ...] = (2, 2, 2, 2)
    in_chans: int = 1
    embed_dim: int = 64
    depths: Tuple[int, ...] = (6, 4, 4)
    num_heads: Tuple[int, ...] = (6, 4, 4)
    dec_dim: int = 64
    dec_depths: int = 6
    dec_num_heads: int = 6
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    use_pallas_attention: bool = False
    # attention backward under training: "auto" = XLA math fwd+bwd when
    # differentiated; "pallas" = fused pallas fwd + hand-written bwd kernels
    # (measured fastest after the r2 fixes: 6.25 vs 6.06 steps/s, PERF.md)
    attn_backward: str = "auto"
    # lane-aligned block-diagonal window pairing on the XLA attention path
    # (PERF.md: removes the 2x lane-padding tax in the train backward)
    xla_window_merge: bool = False
    remat: bool = False


@dataclasses.dataclass
class DiscConfig:
    base_channels: int = 64
    num_layers: int = 5
    num_scales: int = 3          # B1 ablation: 1
    use_sn: bool = True          # B2 ablation: False
    kind: str = "multiscale"     # "multiscale" | "dcgan" | "conditional"
    # batch each loss's real+fake D applications into ONE pass (2 instead of
    # 4 per step).  Exact without SN; with SN it halves the power iterations
    # per step (u/v estimate deviation only).  See make_train_step.
    fused_pairs: bool = False


@dataclasses.dataclass
class OptimConfig:
    # TTUR: lrD = 2 * lrG (reference train_combined.py:98-100)
    lr_g: float = 1e-4
    lr_d: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    grad_clip: Optional[float] = None
    # LR schedule applied to BOTH optimizers (reference utils/train_utils.py
    # cosine/step-half + the YAML's promised MultiStepLR, SURVEY.md §0.10):
    # "none" | "cosine" | "step_half" | "multistep"
    schedule: str = "none"
    warmup_steps: int = 0            # cosine warmup
    min_lr: float = 0.0              # cosine floor
    schedule_step_size: int = 1000   # step_half period
    milestones: Tuple[int, ...] = () # multistep boundaries
    gamma: float = 0.5               # multistep decay factor
    # BEiT-style layer-wise LR decay on the GENERATOR (reference
    # train_utils.py:63-188 param groups); None = off
    llrd_decay: Optional[float] = None
    # run clip+adam on ONE ravelled vector (optax.flatten) instead of one
    # XLA fusion per param leaf — the b8·128² step is kernel-count-bound
    # (PERF.md train study).  Changes the optimizer-state layout, so
    # checkpoints are not interchangeable across this flag.
    fused_update: bool = False
    # Exponential moving average of the GENERATOR params (beyond-reference:
    # standard GAN serving practice).  0.0 = off; typical 0.999.  When on,
    # validation and the best-PSNR checkpoint select the EMA weights.
    ema_decay: float = 0.0


@dataclasses.dataclass
class RadonConfig:
    enabled: bool = True
    num_angles: int = 180
    # MXU precision of the projection einsums in the TRAINING physics loss:
    # "highest" (6-pass f32, the eval/FBP default), "high" (3-pass), or
    # "default" (bf16 single pass).  The loss compares two same-op sinogram
    # projections, so reduced precision perturbs only the λ_phys=0.02 term.
    precision: str = "highest"


@dataclasses.dataclass
class ParallelConfig:
    """Mesh layout for the train step (tmar.core.mesh).

    ``dp``   — batch sharded over the data axis, params replicated (the
               canonical layout; the reference's only analogue is a dormant
               ``ngpu`` switch, train_combined.py:95,234-235).
    ``tp``   — generator params + optimizer moments Megatron-split over a
               ``model_parallel``-wide model axis (gan_state_shardings).
    ``fsdp`` — ZeRO: every eligible param/moment leaf of BOTH networks
               sharded over the data axis.
    ``tp`` requires the plain XLA attention path (the fused Pallas kernels
    are written against the full head set, which TP Megatron-splits) —
    Trainer enforces this.  ``fsdp`` composes with the fused kernels:
    params are ZeRO-sharded at rest and all-gathered at use, so the
    kernels see full tensors.
    """

    mode: str = "dp"            # "dp" | "tp" | "fsdp"
    model_parallel: int = 1     # model-axis size (tp only; must divide n_devices)


@dataclasses.dataclass
class DataConfig:
    # "syndeeplesion" | "spineweb" | "synthetic" | "synthetic_cache"
    # (synthetic_cache materialises 416² synthetic slices into an npy shard
    # cache once and trains on mmap reads + random crops — the live
    # synthesizer caps at ~52 samples/s single-thread, below what one chip
    # consumes; the cache path measured 6.9k samples/s, PERF.md host path)
    dataset: str = "synthetic"
    cache_dir: str = ""          # synthetic_cache location (default: tmp)
    cache_slices: int = 512      # synthetic_cache: distinct 416² slices
    root: str = ""
    spineweb_artifact: str = ""
    spineweb_clean: str = ""
    patch_size: int = 128
    batch_size: int = 4
    samples_per_epoch: int = 16000
    num_workers: int = 2
    seed: int = 999


@dataclasses.dataclass
class TrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    disc: DiscConfig = dataclasses.field(default_factory=DiscConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    loss: LossWeights = dataclasses.field(default_factory=LossWeights)
    radon: RadonConfig = dataclasses.field(default_factory=RadonConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    num_epochs: int = 100
    val_every_n_epochs: int = 5
    checkpoint_every_n_epochs: int = 1
    keep_last_n: int = 3
    seed: int = 999
    run_dir: str = "runs"
    run_name: Optional[str] = None
    n_devices: Optional[int] = None   # default: all
    bf16: bool = True
    log_every: int = 50
    variant: str = "full"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _build(cls, data: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs: Dict[str, Any] = {}
    for k, v in data.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        f = fields[k]
        sub_cls = None
        if f.default_factory is not dataclasses.MISSING:
            proto = f.default_factory()
            if dataclasses.is_dataclass(proto):
                sub_cls = type(proto)
        if sub_cls is not None and isinstance(v, dict):
            kwargs[k] = _build(sub_cls, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> TrainConfig:
    """Load a TrainConfig from YAML (with `section.key=value` overrides)."""
    data: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    cfg = _build(TrainConfig, data)
    for key, value in (overrides or {}).items():
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown override {key!r}")
        if isinstance(value, list):
            value = tuple(value)  # same list→tuple rule as the YAML path
        # object.__setattr__ also works for frozen dataclasses (LossWeights)
        object.__setattr__(obj, leaf, value)
    return cfg
