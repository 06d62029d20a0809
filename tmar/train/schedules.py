"""LR schedules and layer-wise LR decay.

The reference ships (but never wires up) cosine and step-half schedules and
BEiT-style layer-wise LR decay param groups for NGswin
(reference utils/train_utils.py:19-188, imported by nothing; the YAML config
promises MultiStepLR that no trainer builds — SURVEY.md §0.10).  Here they
are real optax transforms selectable from config.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import optax


def warmup_cosine(base_lr: float, total_steps: int, warmup_steps: int = 0,
                  min_lr: float = 0.0) -> optax.Schedule:
    """Linear warmup then cosine decay (the upstream NGswin recipe)."""
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=warmup_steps,
            decay_steps=total_steps, end_value=min_lr,
        )
    return optax.cosine_decay_schedule(base_lr, total_steps, alpha=min_lr / base_lr if base_lr else 0.0)


def step_half(base_lr: float, step_size: int) -> optax.Schedule:
    """Halve the LR every ``step_size`` steps (train_utils.py:39-60)."""

    def schedule(count):
        return base_lr * (0.5 ** (count // step_size))

    return schedule


def multistep(base_lr: float, milestones, gamma: float = 0.5) -> optax.Schedule:
    """The MultiStepLR the reference YAML promises
    (configs/train_syndeeplesion.yaml:46-49)."""
    milestones = sorted(milestones)

    def schedule(count):
        factor = 1.0
        for m in milestones:
            factor = factor * gamma if count >= m else factor
        return base_lr * factor

    return schedule


def build_schedule(optim_cfg, base_lr: float, total_steps: int):
    """Resolve an OptimConfig's schedule fields to an optax schedule
    (None = constant LR).  Drives both TTUR optimizers in the Trainer."""
    kind = getattr(optim_cfg, "schedule", "none") or "none"
    if kind == "none":
        return None
    if kind == "cosine":
        return warmup_cosine(base_lr, total_steps,
                             warmup_steps=optim_cfg.warmup_steps,
                             min_lr=optim_cfg.min_lr)
    if kind == "step_half":
        return step_half(base_lr, optim_cfg.schedule_step_size)
    if kind == "multistep":
        return multistep(base_lr, list(optim_cfg.milestones), optim_cfg.gamma)
    raise ValueError(f"unknown schedule {kind!r}")


# --------------------------------------------------------------------- LLRD
def ngswin_layer_id(path: str, num_encoder_stages: int = 3) -> int:
    """Assign a depth id to an NGswin parameter path for layer-wise decay.

    Mirrors the grouping intent of reference train_utils.py:63-188:
    shallow extractor = 0, encoder stage i blocks increase with depth,
    bottleneck/decoder/head get the highest id (largest LR).
    """
    if "shallow_extract" in path:
        return 0
    m = re.search(r"encoder_layer(\d+)/blocks_(\d+)", path)
    if m:
        return 1 + int(m.group(1)) * 10 + int(m.group(2))
    m = re.search(r"encoder_layer(\d+)/downsample", path)
    if m:
        return 1 + int(m.group(1)) * 10 + 9
    if "bottleneck" in path:
        return 1 + (num_encoder_stages + 1) * 10
    m = re.search(r"decoder_layer1/blocks_(\d+)", path)
    if m:
        return 2 + (num_encoder_stages + 1) * 10 + int(m.group(1))
    return 3 + (num_encoder_stages + 2) * 10  # norm / reconstruction head


def layerwise_lr_decay(params, base_lr: float, decay: float = 0.9,
                       num_encoder_stages: int = 3) -> optax.GradientTransformation:
    """Scale each parameter's LR by decay^(max_id - id) (BEiT-style)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ids = {}
    for path, _ in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        ids[key] = ngswin_layer_id(key, num_encoder_stages)
    max_id = max(ids.values())

    def scale_tree(p):
        def walk(node, prefix):
            if isinstance(node, dict):
                return {k: walk(v, prefix + (k,)) for k, v in node.items()}
            key = "/".join(prefix)
            return decay ** (max_id - ids.get(key, max_id))

        return walk(p, ())

    scales = scale_tree(params)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        import jax

        scaled = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(base_lr: float, beta1: float = 0.5, beta2: float = 0.999,
                    schedule: Optional[optax.Schedule] = None,
                    grad_clip: Optional[float] = None,
                    llrd: Optional[Dict[str, Any]] = None,
                    params=None,
                    fused: bool = False) -> optax.GradientTransformation:
    """Assemble clip -> adam -> (llrd scaling) with an optional schedule.

    ``fused=True`` wraps the clip+adam prefix in ``optax.flatten``: the
    moment/update math runs on ONE ravelled vector instead of one XLA fusion
    per parameter leaf (504 leaves for the flagship NGswin) — the per-step
    kernel count is what bounds the b8·128² step (PERF.md train study).
    LLRD and the schedule scaling stay outside the wrapper (they need the
    tree structure).  NOTE: changes the optimizer state layout (flat mu/nu),
    so checkpoints are not interchangeable across this flag.
    """
    prefix = []
    if grad_clip:
        prefix.append(optax.clip_by_global_norm(grad_clip))
    prefix.append(optax.scale_by_adam(b1=beta1, b2=beta2))
    chain = [optax.flatten(optax.chain(*prefix))] if fused else prefix
    if llrd and params is not None:
        chain.append(layerwise_lr_decay(params, base_lr, **llrd))
    if schedule is not None:
        chain.append(optax.scale_by_schedule(lambda c: -schedule(c)))
    else:
        chain.append(optax.scale(-base_lr))
    return optax.chain(*chain)
