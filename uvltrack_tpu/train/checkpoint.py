"""Checkpoint save/restore with the reference's retention + resume contract.

Parity with BaseTrainer checkpointing (lib/train/trainers/base_trainer.py:
115-232): atomic writes (tmp file + os.rename), keep the last 10 epochs plus
every 20th, resume from latest / a specific epoch / an explicit path.

Serialization is flax msgpack over a state-dict'ed pytree: restoring requires
a template with the same structure (the freshly-built TrainState), which also
round-trips optax namedtuple states exactly.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional, Tuple

import jax
from flax import serialization


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 10, keep_every: int = 20):
        self.directory = os.path.abspath(directory)
        self.keep_last = keep_last
        self.keep_every = keep_every
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"ep{epoch:04d}.msgpack")

    def epochs(self):
        out = []
        for p in glob.glob(os.path.join(self.directory, "ep*.msgpack")):
            m = re.match(r"ep(\d+)\.msgpack$", os.path.basename(p))
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def save(self, epoch: int, state: Any, extra: Optional[dict] = None) -> str:
        payload = {
            "state": serialization.to_state_dict(jax.device_get(state)),
            "extra": extra or {},
            "epoch": epoch,
        }
        data = serialization.msgpack_serialize(payload)
        path = self._path(epoch)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, path)  # atomic
        self._gc()
        return path

    def _gc(self):
        eps = self.epochs()
        keep = set(eps[-self.keep_last:])
        keep |= {e for e in eps if e % self.keep_every == 0}
        for e in eps:
            if e not in keep:
                try:
                    os.remove(self._path(e))
                except OSError:
                    pass

    def restore(self, state_template: Any, epoch: Optional[int] = None,
                path: Optional[str] = None) -> Tuple[Any, dict, int]:
        """Restore (state, extra, epoch). epoch=None -> latest."""
        if path is None:
            eps = self.epochs()
            if not eps:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            epoch = eps[-1] if epoch is None else epoch
            path = self._path(epoch)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        state = serialization.from_state_dict(state_template, payload["state"])
        return state, payload.get("extra", {}), int(payload["epoch"])

    def restore_raw(self, path: Optional[str] = None) -> Tuple[dict, dict, int]:
        """Restore without a template: returns the plain nested-dict state."""
        if path is None:
            eps = self.epochs()
            if not eps:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._path(eps[-1])
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        return payload["state"], payload.get("extra", {}), int(payload["epoch"])

    def has_checkpoint(self) -> bool:
        return bool(self.epochs())
