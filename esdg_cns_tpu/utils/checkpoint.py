"""Checkpoint / resume of simulation state (SURVEY.md section 5).

The reference has no checkpointing (state lives in memory, outputs are
ad-hoc text dumps).  Here: orbax-backed snapshots of the full stepper
state (q, t, dt, step index, and any extra pytree), so long runs survive
preemption and restarts resume bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """Thin wrapper: save/restore pytrees keyed by step.

    Uses orbax when available; falls back to .npz (single-host only).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:  # pragma: no cover
            self._mgr = None

    def save(self, step: int, state: Any):
        state = jax.device_get(state)
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:  # pragma: no cover
            leaves, treedef = jax.tree_util.tree_flatten(state)
            np.savez(
                os.path.join(self.directory, f"ckpt_{step}.npz"),
                *[np.asarray(l) for l in leaves],
            )

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [
            int(f[5:-4])
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        ]  # pragma: no cover
        return max(steps) if steps else None  # pragma: no cover

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if self._mgr is not None:
            if template is not None:
                target = jax.device_get(template)
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(target)
                )
            return self._mgr.restore(step)
        data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))  # pragma: no cover
        leaves = [data[k] for k in data.files]  # pragma: no cover
        _, treedef = jax.tree_util.tree_flatten(template)  # pragma: no cover
        return jax.tree_util.tree_unflatten(treedef, leaves)  # pragma: no cover
