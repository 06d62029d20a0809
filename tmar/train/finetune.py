"""Dual-domain fine-tune engine.

TPU-native re-design of reference scripts/finetune_all_benchmarks.py's two
training loops:

* image-domain (:1410-1486): L1 reconstruction + edge-preservation loss;
* dual-domain (:1599-1650): additionally projects prediction / target /
  metal-mask through the Radon transform ON THE FLY and applies a
  trace-masked sinogram L1 (``sinogram_loss``, :293-305) with the non-metal
  trace ``Tr = (Radon(mask) < 0.1)`` (:1606-1608).

Where the reference round-trips every batch through host-side ODL
projections (forward_project_batch, fp32, per-image), here the projection
is the in-tree differentiable Radon operator fused INTO the jit'd train
step — image loss, sinogram loss, and the optimizer update compile to one
XLA program, sharded over the mesh's ``data`` axis for multi-chip runs.
The reference's AMP + gradient-checkpointing memory levers (:79-84,
1533-1597) map to the bf16 policy and the generator ``remat`` flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tmar.ops.gradients import image_gradients


@dataclasses.dataclass
class FinetuneWeights:
    """Loss weights (reference opt.lambda_* defaults, :60-72)."""

    rec: float = 1.0
    edge: float = 0.1
    sino: float = 0.1
    trace_threshold: float = 0.1  # Tr = (Radon(mask) < 0.1), :1607


class FinetuneState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any


def _is_dual_domain(model) -> bool:
    """Dual-domain nets (tmar.nn.dudo.DuDoMARNet-class) mark themselves with
    a ``dual_domain`` attribute and take the 6-tensor benchmark signature."""
    return bool(getattr(model, "dual_domain", False))


def _init_variables(rng, model, patch_size: int, in_chans: int = 1):
    x = jnp.zeros((1, patch_size, patch_size, in_chans))
    if _is_dual_domain(model):
        proj = model.projector
        s = jnp.zeros((1, proj.num_angles, proj.det_count))
        return model.init(rng, x, x, x, s, s, jnp.ones_like(s))
    return model.init(rng, x)


def create_finetune_state(
    rng: jax.Array, model, tx: optax.GradientTransformation, patch_size: int,
    in_chans: int = 1,
) -> FinetuneState:
    variables = _init_variables(rng, model, patch_size, in_chans)
    return FinetuneState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt=tx.init(variables["params"]),
    )


# ------------------------------------------------------------------ freezing
def freeze_by_path(
    tx: optax.GradientTransformation, params, frozen_prefixes,
) -> optax.GradientTransformation:
    """Wrap ``tx`` so parameters whose path starts with any of
    ``frozen_prefixes`` receive zero updates (optax ``set_to_zero`` masking).

    TPU-native equivalent of the reference's requires_grad=False stage
    freezing (scripts/finetune_all_benchmarks.py:1533-1597 freezes MEPNet's
    priornet + first N proxNet stages to fit memory) — here the frozen
    branch is pruned from the compiled update, so XLA drops the dead
    gradient math entirely.
    """
    frozen_prefixes = tuple(frozen_prefixes)

    def label(path_keys) -> str:
        path = "/".join(str(getattr(k, "key", k)) for k in path_keys)
        return "frozen" if path.startswith(frozen_prefixes) else "train"

    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: label(p), params
    )
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )


def dudo_freeze_prefixes(freeze_stages: int, freeze_prior: bool = True):
    """Path prefixes freezing the prior net + first N unrolled stages of a
    :class:`tmar.nn.dudo.DuDoMARNet` (the reference's
    ``--mepnet_freeze_stages`` semantics, finetune_all_benchmarks.py:84,
    :1875-1597)."""
    prefixes = ["prior_net"] if freeze_prior else []
    for k in range(freeze_stages):
        prefixes += [f"prox_s_{k}", f"prox_x_{k}"]
    return tuple(prefixes)


def make_finetune_step(
    model,
    tx: optax.GradientTransformation,
    weights: FinetuneWeights,
    projector=None,
    mesh=None,
    donate: bool = True,
):
    """Build the jit'd fine-tune step.

    ``step(state, batch) -> (state, metrics)``; batch carries
    ``Xma``/``Xgt``/``mask`` as [B, H, W, 1] (the
    tmar.data.finetune.BenchmarkFinetuneDataset dict through the Loader).
    With a ``projector`` the sinogram term is active (dual-domain mode);
    without one this is the image-domain loop.
    """

    dual = _is_dual_domain(model)
    if dual and projector is None:
        projector_ = model.projector
    else:
        projector_ = projector

    def train_step(state: FinetuneState, batch):
        xma, xgt = batch["Xma"], batch["Xgt"]

        def loss_fn(params):
            s_out = None
            if dual:
                # dual-domain signature (reference :1618-1624): sinogram
                # inputs synthesized in-step by the native Radon — data-side
                # projections carry no gradient
                xli = batch.get("XLI", xma)
                mask = batch["mask"]
                stack = jnp.concatenate(
                    [xma[..., 0], xli[..., 0], mask[..., 0]], axis=0
                )
                sinos = jax.lax.stop_gradient(projector_.forward(stack))
                b = xma.shape[0]
                sma, sli, trace = sinos[:b], sinos[b:2 * b], sinos[2 * b:]
                tr = (trace < weights.trace_threshold).astype(sma.dtype)
                out = model.apply(
                    {"params": params}, xma, xli, 1.0 - mask, sma, sli, tr
                )
                xout, s_out = out["x"], out["s"]
            else:
                xout = model.apply({"params": params}, xma)
            l_rec = jnp.mean(jnp.abs(xout - xgt))
            pdx, pdy = image_gradients(xout)
            gdx, gdy = image_gradients(xgt)
            l_edge = jnp.mean(jnp.abs(pdx - gdx)) + jnp.mean(jnp.abs(pdy - gdy))
            total = weights.rec * l_rec + weights.edge * l_edge
            terms = {"rec": l_rec, "edge": l_edge}
            if projector_ is not None and weights.sino:
                if s_out is None:
                    s_out = projector_.forward(xout)
                    trace = projector_.forward(batch["mask"])
                    tr = (trace < weights.trace_threshold).astype(s_out.dtype)
                s_gt = jax.lax.stop_gradient(projector_.forward(xgt))
                l_sino = jnp.mean(jnp.abs(s_out - s_gt) * tr)
                total = total + weights.sino * l_sino
                terms["sino"] = l_sino
            return total, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **terms}
        return FinetuneState(step=state.step + 1, params=params, opt=opt), metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        return jax.jit(
            train_step,
            in_shardings=(repl, data_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def finetune(
    model,
    dataset,
    num_epochs: int = 1,
    batch_size: int = 4,
    lr: float = 1e-4,
    weights: Optional[FinetuneWeights] = None,
    projector=None,
    mesh=None,
    seed: int = 0,
    num_workers: int = 0,
    progress: bool = False,
    freeze_prefixes=(),
) -> Dict[str, Any]:
    """Convenience loop: fine-tune ``model`` on a BenchmarkFinetuneDataset.

    ``freeze_prefixes`` freezes parameter subtrees by path prefix (see
    :func:`freeze_by_path`; :func:`dudo_freeze_prefixes` builds the
    reference's MEPNet stage-freezing set).  Returns {'state', 'history'}
    with per-epoch mean losses."""
    import numpy as np

    from tmar.core.mesh import create_mesh, replicate
    from tmar.data import Loader

    mesh = mesh if mesh is not None else create_mesh(1)
    weights = weights or FinetuneWeights()
    sample = dataset[0]
    patch = sample["Xma"].shape[0]
    tx = optax.adam(lr)
    variables = _init_variables(jax.random.PRNGKey(seed), model, patch)
    if freeze_prefixes:
        tx = freeze_by_path(tx, variables["params"], freeze_prefixes)
    state = FinetuneState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt=tx.init(variables["params"]),
    )
    state = replicate(mesh, state)
    step = make_finetune_step(model, tx, weights, projector=projector, mesh=mesh)
    keys = ("Xma", "Xgt", "mask") + (("XLI",) if _is_dual_domain(model) else ())
    loader = Loader(
        dataset, batch_size=batch_size, num_workers=num_workers, seed=seed,
        mesh=mesh, keys=keys,
    )
    history = []
    for epoch in range(num_epochs):
        sums: Dict[str, float] = {}
        n = 0
        for batch in loader:
            state, metrics = step(state, batch)
            n += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        row = {k: v / max(n, 1) for k, v in sums.items()}
        row["epoch"] = epoch
        history.append(row)
        if progress:
            print(f"[finetune epoch {epoch + 1}/{num_epochs}] "
                  + " ".join(f"{k}={v:.5f}" for k, v in row.items() if k != "epoch"),
                  flush=True)
    return {"state": jax.device_get(state), "history": history}
