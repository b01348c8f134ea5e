"""Checkpoint save/restore with the reference's retention + resume contract.

Parity with BaseTrainer checkpointing (lib/train/trainers/base_trainer.py:
115-232): atomic writes, keep the last 10 epochs plus every 20th, resume from
latest / a specific epoch / an explicit path. Serialization is orbax
(PyTreeCheckpointer) over the TrainState pytree + a small metadata dict.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 10, keep_every: int = 20):
        self.directory = os.path.abspath(directory)
        self.keep_last = keep_last
        self.keep_every = keep_every
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"ep{epoch:04d}")

    def epochs(self):
        out = []
        for p in glob.glob(os.path.join(self.directory, "ep*")):
            m = re.match(r"ep(\d+)$", os.path.basename(p))
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def save(self, epoch: int, state: Any, extra: Optional[dict] = None) -> str:
        path = self._path(epoch)
        payload = {"state": state, "extra": extra or {}, "epoch": epoch}
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, payload)  # orbax writes tmp dir + atomic rename
        self._gc()
        return path

    def _gc(self):
        eps = self.epochs()
        keep = set(eps[-self.keep_last:])
        keep |= {e for e in eps if e % self.keep_every == 0}
        for e in eps:
            if e not in keep:
                shutil.rmtree(self._path(e), ignore_errors=True)

    def restore(self, state_template: Any, epoch: Optional[int] = None,
                path: Optional[str] = None) -> Tuple[Any, dict, int]:
        """Restore (state, extra, epoch). epoch=None -> latest."""
        if path is None:
            eps = self.epochs()
            if not eps:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            epoch = eps[-1] if epoch is None else epoch
            path = self._path(epoch)
        template = {"state": state_template, "extra": {}, "epoch": 0}
        payload = self._ckpt.restore(path, item=template)
        return payload["state"], payload.get("extra", {}), int(payload["epoch"])

    def has_checkpoint(self) -> bool:
        return bool(self.epochs())
