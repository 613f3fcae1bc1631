"""Step-level checkpoint/resume via Orbax.

Extension over the reference, which has no step checkpointing — only MLflow
best-epoch artifact logging (models_gnn.py:384-387; SURVEY §5
"Checkpoint/resume"). Saves the full train state (params, optimizer state,
step) with retention, and restores with sharding-aware loading.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        if self._mngr.latest_step() == step:
            return  # e.g. per-epoch best save colliding with checkpoint_every
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template)
        return self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
