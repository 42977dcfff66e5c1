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


def _flat_with_keys(state):
    """Flatten a pytree into (key-path string, leaf) pairs.

    The key strings are stable across processes for a fixed tree
    structure, so the npz fallback is keyed by PATH, not by insertion
    order.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    # "leaf" prefix keeps keys non-empty for single-array pytrees
    return [("leaf" + jax.tree_util.keystr(path), leaf) for path, leaf in flat]


class CheckpointManager:
    """Thin wrapper: save/restore pytrees keyed by step.

    Uses orbax when available; falls back to .npz (single-host only,
    ``use_orbax=False`` forces it for tests).  The npz fallback stores
    each leaf under its pytree key path and verifies leaf count, keys
    and shapes against the restore template.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 use_orbax: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        if use_orbax and not _HAS_ORBAX:
            # never silently downgrade an explicit request: the npz
            # fallback is single-host only (raced/corrupt on a pod)
            raise ImportError(
                "use_orbax=True but orbax.checkpoint is not importable")
        use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
        if use_orbax:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:
            self._mgr = None

    def save(self, step: int, state: Any):
        state = jax.device_get(state)
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:
            arrays = {key: np.asarray(leaf)
                      for key, leaf in _flat_with_keys(state)}
            path = os.path.join(self.directory, f"ckpt_{step}.npz")
            np.savez(path, **arrays)
            self._prune_npz()

    def _prune_npz(self):
        steps = sorted(self._npz_steps())
        for s in steps[: max(0, len(steps) - self.max_to_keep)]:
            os.remove(os.path.join(self.directory, f"ckpt_{s}.npz"))

    def _npz_steps(self):
        return [
            int(f[5:-4])
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        ]

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._npz_steps()
        return max(steps) if steps else None

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
        if template is None:
            raise ValueError(
                "the npz fallback needs a `template` pytree to restore into"
            )
        with np.load(os.path.join(self.directory,
                                  f"ckpt_{step}.npz")) as data:
            keyed = _flat_with_keys(template)
            if sorted(data.files) != sorted(k for k, _ in keyed):
                raise ValueError(
                    f"checkpoint ckpt_{step}.npz does not match the "
                    f"template: stored keys {sorted(data.files)} vs "
                    f"template keys {sorted(k for k, _ in keyed)}"
                )
            leaves = []
            for key, tmpl_leaf in keyed:
                arr = data[key]
                tmpl_shape = np.shape(tmpl_leaf)
                if arr.shape != tuple(tmpl_shape):
                    raise ValueError(
                        f"checkpoint leaf {key!r} shape {arr.shape} != "
                        f"template shape {tuple(tmpl_shape)}"
                    )
                # scalar python leaves restore as python scalars
                if np.ndim(tmpl_leaf) == 0 and not isinstance(
                    tmpl_leaf, (np.ndarray, jax.Array)
                ):
                    leaves.append(arr.item())
                else:
                    leaves.append(arr)
        _, treedef = jax.tree_util.tree_flatten(template)
        return jax.tree_util.tree_unflatten(treedef, leaves)
