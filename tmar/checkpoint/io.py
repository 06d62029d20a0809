"""Orbax checkpointing: {G params, D params, SN state, both optimizer states,
step} + metadata, with retention and best-model tracking.

TPU-native equivalent of the reference's torch checkpoint dicts
(train_combined.py:565-574: netG/netD/optimizerG/optimizerD/epoch) plus the
``keep_last_n`` retention its configs promise but never implement
(configs/train_syndeeplesion.yaml:82, SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep_last_n: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_last_n = keep_last_n
        self._ckptr = ocp.PyTreeCheckpointer()

    # ------------------------------------------------------------------ save
    def save(self, state, step: int, meta: Optional[Dict[str, Any]] = None, best: bool = False):
        name = "best" if best else f"step_{step:010d}"
        path = os.path.join(self.directory, name)
        host_state = jax.device_get(state)
        self._ckptr.save(path, host_state, force=True)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step, **(meta or {})}, f)
        if not best:
            self._prune()
        return path

    def _steps(self):
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("step_"):
                try:
                    out.append(int(d[5:]))
                except ValueError:
                    pass
        return sorted(out)

    def _prune(self):
        import shutil

        steps = self._steps()
        for s in steps[: -self.keep_last_n] if self.keep_last_n else []:
            shutil.rmtree(os.path.join(self.directory, f"step_{s:010d}"), ignore_errors=True)

    # --------------------------------------------------------------- restore
    def restore(
        self, target, step: Optional[int] = None, best: bool = False
    ) -> Optional[Tuple[Any, Dict[str, Any]]]:
        """Restore into the structure of ``target``; returns (state, meta) or
        None when no checkpoint exists."""
        if best:
            name = "best"
        else:
            steps = self._steps()
            if step is not None:
                if step not in steps:
                    return None
                name = f"step_{step:010d}"
            elif steps:
                name = f"step_{steps[-1]:010d}"
            elif os.path.isdir(os.path.join(self.directory, "best")):
                name = "best"
            else:
                return None
        path = os.path.join(self.directory, name)
        if not os.path.isdir(path):
            return None
        host_target = jax.device_get(target)
        state = self._ckptr.restore(path, item=host_target)
        meta: Dict[str, Any] = {}
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None
