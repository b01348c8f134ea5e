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
import threading
from typing import Any, Optional, Tuple

import jax
from flax import serialization


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 10, keep_every: int = 20):
        self.directory = os.path.abspath(directory)
        self.keep_last = keep_last
        self.keep_every = keep_every
        os.makedirs(self.directory, exist_ok=True)
        self._inflight: Optional[threading.Thread] = None
        self._inflight_error: Optional[BaseException] = None

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"ep{epoch:04d}.msgpack")

    def wait(self) -> None:
        """Join an in-flight async save (no-op when none). Re-raises any
        error the background write hit — a silently-lost checkpoint would
        defeat the fail-safe restart contract."""
        t = self._inflight
        if t is not None:
            if t is threading.current_thread():
                return  # _gc -> epochs() from inside the save worker itself
            t.join()
            self._inflight = None
            if self._inflight_error is not None:
                err, self._inflight_error = self._inflight_error, None
                raise err

    def save_async(self, epoch: int, state: Any,
                   extra: Optional[dict] = None) -> str:
        """Non-blocking save: the device->host snapshot happens HERE,
        synchronously — the caller's train step may donate/overwrite the
        state buffers right after this returns — and msgpack serialization
        + the atomic write + retention GC run in a background thread,
        overlapping the next epoch's compute. At most one save is in
        flight; a second call joins the first. Durability point is wait()
        (restore/epochs/has_checkpoint join implicitly)."""
        self.wait()
        host_state = serialization.to_state_dict(jax.device_get(state))
        payload = {"state": host_state, "extra": extra or {}, "epoch": epoch}
        path = self._path(epoch)

        def _work():
            try:
                data = serialization.msgpack_serialize(payload)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.rename(tmp, path)  # atomic
                self._gc()
            except BaseException as e:  # surfaced by the next wait()
                self._inflight_error = e

        t = threading.Thread(target=_work, name=f"ckpt-save-ep{epoch}",
                             daemon=True)
        t.start()
        self._inflight = t
        return path

    def epochs(self):
        self.wait()
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
        self.wait()
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
        self.wait()
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
