"""Orbax checkpoint manager: atomic per-step saves + latest-restore.

Replaces the reference's per-epoch pickle of Lasagne param values
(SURVEY.md §5.4) with orbax's atomic-commit checkpoints; resume is
restore_latest + continuing the step counter (tested by the restart-resume
test, SURVEY.md §5.3).

Two robustness features beyond the reference:

* **data-position metadata**: every save can carry a small JSON dict
  (epoch, batch-in-epoch, grain iterator state) as a composite checkpoint
  item, enabling MID-EPOCH resume (the reference's `load` flag was
  epoch-granular only).
* **async-save watchdog**: one observed failure mode on flaky
  device→host links is an async orbax save wedging forever (ROADMAP r1
  #8). Before each save (and in `wait()`), outstanding async work is
  awaited with a timeout; on expiry the manager logs a warning, abandons
  the wedged background writer, and rebuilds itself in synchronous mode so
  training completes (the wedged step is dropped — orbax's atomic commit
  ignores partial step dirs on restore).
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Any, Callable

import orbax.checkpoint as ocp

log = logging.getLogger(__name__)

_STATE = "state"
_META = "meta"


def _has_prepared_leaves(tree: Any) -> bool:
    """True if `tree` contains inference-prepared caches (ADVICE r4):
    `prepare_inference` DROPS the raw f32 fc_expand kernel and stores a
    compute-dtype (possibly bf16, lossy) `dec_cache` form in its place, and
    `precompose_collapsed` adds a derived `enc_cache` — checkpointing such
    a pytree would silently lose the master weight."""
    if isinstance(tree, dict):
        if "dec_cache" in tree or "enc_cache" in tree:
            return True
        return any(_has_prepared_leaves(v) for v in tree.values())
    params = getattr(tree, "params", None)  # TrainState-style containers
    return isinstance(params, dict) and _has_prepared_leaves(params)


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        async_save: bool = True,
        async_timeout_s: float = 300.0,
        on_warning: Callable[[str], None] | None = None,
    ):
        """`async_save=False` forces synchronous writes — slower epochs but
        no background save to wedge on flaky device→host links."""
        self._dir = os.path.abspath(directory)
        self._max_to_keep = max_to_keep
        self._async = async_save
        self._timeout = async_timeout_s
        self._on_warning = on_warning
        self.fell_back_to_sync = False
        self._mgr = self._make()

    def _make(self) -> ocp.CheckpointManager:
        return ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self._max_to_keep,
                create=True,
                enable_async_checkpointing=self._async,
            ),
        )

    def _warn(self, msg: str) -> None:
        log.warning(msg)
        if self._on_warning is not None:
            self._on_warning(msg)

    def _wait_with_timeout(self, timeout: float | None) -> bool:
        """True if outstanding async work finished within `timeout`."""
        if timeout is None:
            self._mgr.wait_until_finished()
            return True
        done = threading.Event()
        mgr = self._mgr

        def _waiter():
            try:
                mgr.wait_until_finished()
            finally:
                done.set()

        threading.Thread(target=_waiter, daemon=True).start()
        return done.wait(timeout)

    def _fallback_to_sync(self, what: str) -> None:
        self._warn(
            f"async checkpoint {what} did not finish within {self._timeout}s; "
            f"abandoning the wedged writer and falling back to SYNCHRONOUS "
            f"saves (the unfinished step is dropped — atomic commit keeps "
            f"restores safe)"
        )
        self._async = False
        self.fell_back_to_sync = True
        self._mgr = self._make()  # wedged manager left to its daemon thread

    def save(self, step: int, state: Any, extra: dict | None = None) -> None:
        """Atomic save; `extra` (JSON-serializable) rides as a composite
        item for mid-epoch resume metadata."""
        if _has_prepared_leaves(state):
            raise ValueError(
                "refusing to checkpoint an inference-prepared pytree "
                "(dec_cache/enc_cache present): prepare_inference drops the "
                "raw f32 fc_expand weight — save the ORIGINAL params instead"
            )
        if self._async and not self._wait_with_timeout(self._timeout):
            self._fallback_to_sync("save")
        args = ocp.args.Composite(
            **{
                _STATE: ocp.args.StandardSave(state),
                _META: ocp.args.JsonSave(extra if extra is not None else {}),
            }
        )
        self._mgr.save(int(step), args=args)

    def restore_latest(self, abstract_state: Any) -> tuple[Any, dict] | None:
        """Restore the newest checkpoint into the structure of
        `abstract_state` (a live state works) → (state, meta dict);
        None if no checkpoint. Pre-composite checkpoints restore with an
        empty meta dict."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    **{
                        _STATE: ocp.args.StandardRestore(abstract_state),
                        _META: ocp.args.JsonRestore(),
                    }
                ),
            )
            return out[_STATE], dict(out[_META] or {})
        except (KeyError, FileNotFoundError, ValueError):
            # legacy layout: bare StandardSave checkpoints
            state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
            return state, {}

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self, timeout: float | None = None) -> bool:
        """Wait for outstanding async saves; on timeout fall back to sync
        mode and return False."""
        if not self._wait_with_timeout(timeout if timeout is not None else self._timeout):
            self._fallback_to_sync("wait")
            return False
        return True

    def close(self) -> None:
        self._mgr.close()
