"""Checkpoint / resume via Orbax.

Parity with the reference's checkpoint system (`train.py:290-355`): a
rolling "common" checkpoint holding model/optimizer/step/best-results plus a
config snapshot, and per-metric best copies; resume restores everything.
Array state goes through orbax; best-metrics + config snapshot are JSON side
files (orbax's StandardCheckpointer handles array pytrees only).
"""
from __future__ import annotations

import dataclasses
import json
import os

import orbax.checkpoint as ocp

from .steps import TrainState


class CheckpointManager:
    """Rolling 'common' + per-metric 'best' checkpoints under ckpt_dir."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def _save(self, name: str, state: TrainState, best: dict, config) -> None:
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        meta = {
            "best": {k: float(v) for k, v in best.items()},
            "config": dataclasses.asdict(config) if dataclasses.is_dataclass(config)
            else dict(config or {}),
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2)

    def save_common(self, state: TrainState, best: dict, config) -> None:
        self._save("common", state, best, config)

    def save_best(self, metric_name: str, state: TrainState, best: dict,
                  config) -> None:
        self._save(f"best_{metric_name}", state, best, config)

    def load_meta(self, name: str = "common") -> dict | None:
        """The JSON side file: {'best': {...}, 'config': <snapshot dict>}."""
        path = self._path(name) + ".meta.json"
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore_raw(self, name: str = "common") -> dict | None:
        """Template-free restore of the saved array pytree.

        Returns {'step', 'params', 'batch_stats', 'opt_state'} as plain
        dicts/arrays, or None if absent. Used by the evaluate path
        (ref: `train.py:231-243` loads ckpt['model'] into a model whose
        head may differ from the training head): evaluation needs only
        params + batch_stats, so no optimizer template is required.

        Arrays come back as host numpy regardless of where the checkpoint
        was written: a template-free StandardCheckpointer restore replays
        the *saved* shardings, which fails when evaluating a TPU-trained
        checkpoint on CPU (and vice versa).
        """
        import jax
        import numpy as np

        path = self._path(name)
        if not os.path.isdir(path):
            return None
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(path, restore_args=restore_args)

    def restore(self, template_state: TrainState, name: str = "common"
                ) -> tuple[TrainState, dict] | None:
        path = self._path(name)
        if not os.path.isdir(path):
            return None
        state = self._ckptr.restore(path, template_state)
        best = {}
        meta_path = path + ".meta.json"
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                best = json.load(f).get("best", {})
        return state, best
