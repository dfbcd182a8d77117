"""Orbax checkpoint manager: atomic per-step saves + latest-restore.

Replaces the reference's per-epoch pickle of Lasagne param values
(SURVEY.md §5.4) with orbax's atomic-commit checkpoints; resume is
restore_latest + continuing the step counter (tested by the restart-resume
test, SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        """`async_save=False` forces synchronous writes — slower epochs but
        no background save to wedge on flaky device→host links
        (ROADMAP.md #8)."""
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))

    def restore_latest(self, abstract_state: Any) -> Any | None:
        """Restore the newest checkpoint into the structure of
        `abstract_state` (a live state works); None if no checkpoint."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
