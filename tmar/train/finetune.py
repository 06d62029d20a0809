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


def create_finetune_state(
    rng: jax.Array, model, tx: optax.GradientTransformation, patch_size: int,
    in_chans: int = 1,
) -> FinetuneState:
    variables = model.init(rng, jnp.zeros((1, patch_size, patch_size, in_chans)))
    return FinetuneState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt=tx.init(variables["params"]),
    )


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

    def train_step(state: FinetuneState, batch):
        xma, xgt = batch["Xma"], batch["Xgt"]

        def loss_fn(params):
            xout = model.apply({"params": params}, xma)
            l_rec = jnp.mean(jnp.abs(xout - xgt))
            pdx, pdy = image_gradients(xout)
            gdx, gdy = image_gradients(xgt)
            l_edge = jnp.mean(jnp.abs(pdx - gdx)) + jnp.mean(jnp.abs(pdy - gdy))
            total = weights.rec * l_rec + weights.edge * l_edge
            terms = {"rec": l_rec, "edge": l_edge}
            if projector is not None and weights.sino:
                s_out = projector.forward(xout)
                s_gt = projector.forward(xgt)
                trace = projector.forward(batch["mask"])
                tr = (trace < weights.trace_threshold).astype(s_out.dtype)
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
) -> Dict[str, Any]:
    """Convenience loop: fine-tune ``model`` on a BenchmarkFinetuneDataset.

    Returns {'state', 'history'} with per-epoch mean losses."""
    import numpy as np

    from tmar.core.mesh import create_mesh, replicate
    from tmar.data import Loader

    mesh = mesh if mesh is not None else create_mesh(1)
    weights = weights or FinetuneWeights()
    sample = dataset[0]
    patch = sample["Xma"].shape[0]
    tx = optax.adam(lr)
    state = create_finetune_state(jax.random.PRNGKey(seed), model, tx, patch)
    state = replicate(mesh, state)
    step = make_finetune_step(model, tx, weights, projector=projector, mesh=mesh)
    loader = Loader(
        dataset, batch_size=batch_size, num_workers=num_workers, seed=seed,
        mesh=mesh, keys=("Xma", "Xgt", "mask"),
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
