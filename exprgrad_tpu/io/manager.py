"""Rotating checkpoint management: save every N epochs, keep K, resume.

The reference checkpoints are one-shot ``save``/``loadModel`` calls
(serialize.nim:364-379); a production training loop needs the policy
around them — numbered checkpoints, bounded disk (keep the most recent
K), crash-resume from the latest — and it must work for BOTH checkpoint
formats this framework has: single-file (``io.save_model``) and
sharded-directory (``parallel.save_sharded``, mesh state + elastic
restore).  ``CheckpointManager`` is that policy; ``train(...,
checkpoint=mgr, checkpoint_every=N)`` drives it.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional

from ..errors import ModelRuntimeError

_STEP_RE = re.compile(r"^step_(\d+)(\.egt)?$")


class CheckpointManager:
    """Numbered checkpoints under one directory with bounded retention.

    ``sharded=False`` (default) writes ``step_<n>.egt`` single files
    (program + params + caches + epoch, CRC-trailed);
    ``sharded=True`` writes ``step_<n>/`` sharded directories (one file
    per mesh shard, async-save capable, elastic restore).

    Resume determinism: params, optimizer caches, the epoch counter AND
    the host RNG stream (shuffle order, dropout/per-call seeds) all
    restore, so a resumed run is bit-identical to an uninterrupted one
    even under stochastic shuffling (checkpoint format v8+).
    """

    def __init__(self, directory: str, keep: int = 3,
                 sharded: bool = False) -> None:
        if keep < 1:
            raise ModelRuntimeError("CheckpointManager keep must be >= 1")
        self.directory = directory
        self.keep = keep
        self.sharded = sharded
        self._pending: list = []  # (step, SaveHandle) of async saves
        os.makedirs(directory, exist_ok=True)

    # -- discovery ------------------------------------------------------

    def steps(self) -> list[int]:
        """Completed checkpoint steps, ascending."""
        out = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m is None:
                continue
            path = os.path.join(self.directory, name)
            if self.sharded:
                if not os.path.isfile(os.path.join(path, "manifest.json")):
                    continue  # in-flight or aborted save
            elif not os.path.isfile(path):
                continue
            out.append(int(m.group(1)))
        return sorted(set(out))

    def latest(self) -> Optional[int]:
        steps = self.steps()
        return steps[-1] if steps else None

    def path(self, step: int) -> str:
        name = f"step_{step}" if self.sharded else f"step_{step}.egt"
        return os.path.join(self.directory, name)

    # -- save -----------------------------------------------------------

    def save(self, model, step: Optional[int] = None,
             async_save: bool = False):
        """Checkpoint ``model`` as ``step`` (default ``model.epoch``).

        Returns the ``SaveHandle`` for sharded async saves (else None).
        Prunes beyond ``keep`` afterwards — async saves are joined
        before anything is pruned, so rotation never races a writer.
        """
        if step is None:
            step = int(model.epoch)
        target = self.path(step)
        if self.sharded:
            from ..parallel.checkpoint import save_sharded

            handle = save_sharded(model, target, async_save=async_save)
            if async_save:
                self._pending.append((step, handle))
                self._prune()
                return handle
        else:
            from .serialize import save_model

            if async_save:
                raise ModelRuntimeError(
                    "async_save requires sharded=True (single-file saves "
                    "gather to the host synchronously anyway)"
                )
            save_model(model, target)
        self._prune()
        return None

    def wait(self) -> None:
        """Join all in-flight async saves (re-raises their IO errors)."""
        pending, self._pending = self._pending, []
        for _step, handle in pending:
            handle.wait()
        self._prune()  # saves that were in flight are now rotatable

    def _prune(self) -> None:
        done = [s for s in self.steps()
                if not any(p == s and not h.done for p, h in self._pending)]
        for step in done[: max(0, len(done) - self.keep)]:
            path = self.path(step)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            elif os.path.exists(path):
                os.remove(path)

    # -- restore --------------------------------------------------------

    def restore(self, model=None, step: Optional[int] = None, mesh=None,
                backend: str = "jax"):
        """Load a checkpoint; returns the restored model.

        ``step=None`` restores the latest.  Sharded mode restores INTO
        the given ``model`` (required — the program must already be
        compiled) onto ``mesh`` (or host arrays).  Single-file mode
        returns a freshly loaded model (``model`` is ignored).
        """
        if step is None:
            step = self.latest()
            if step is None:
                raise ModelRuntimeError(
                    f"no checkpoints under {self.directory}"
                )
        if step not in self.steps():
            raise ModelRuntimeError(
                f"checkpoint step {step} not found under {self.directory}"
            )
        if self.sharded:
            if model is None:
                raise ModelRuntimeError(
                    "sharded restore loads into an existing model: pass "
                    "model= (compiled from the same program)"
                )
            from ..parallel.checkpoint import load_sharded

            load_sharded(self.path(step), model, mesh=mesh)
            return model
        from .serialize import load_model

        return load_model(self.path(step), backend=backend)
