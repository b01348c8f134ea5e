"""Epoch-loop trainer with fail-safe restart, metric meters, and logging.

Parity with BaseTrainer/LTRTrainer (lib/train/trainers/base_trainer.py:63-110,
ltr_trainer.py:67-190): per-epoch train + interval validation cycles, loss/IoU
AverageMeters with FPS printed every PRINT_INTERVAL, checkpoint-per-epoch with
crash-resume (reload latest and continue), and an append-only logfile.

Cross-device stat averaging is implicit: metrics come out of the sharded step
already reduced over the mesh (the reference needed an explicit all_reduce,
ltr_trainer.py:173-178).
"""

from __future__ import annotations

import json
import os
import time
import traceback
from collections import defaultdict
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from .checkpoint import CheckpointManager


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def _fmt_stats(d: dict) -> str:
    """'k: v.vvvvv' pairs, key-sorted — the one stats-line format shared by
    interval, val, and epoch-summary log lines (meters or plain floats)."""
    return "  ".join(
        f"{k}: {(v.avg if isinstance(v, AverageMeter) else v):.5f}"
        for k, v in sorted(d.items()))


class Trainer:
    def __init__(self, cfg, train_step: Callable, state,
                 train_loader: Iterable, val_loaders: Optional[dict] = None,
                 eval_step: Optional[Callable] = None,
                 checkpoint_dir: str = "checkpoints/train/uvltrack/default",
                 log_path: Optional[str] = None,
                 shard_fn: Optional[Callable] = None,
                 tensorboard_dir: Optional[str] = None):
        self.cfg = cfg
        self.train_step = train_step
        self.eval_step = eval_step
        self.state = state
        self.train_loader = train_loader
        self.val_loaders = val_loaders or {}
        self.shard_fn = shard_fn or (lambda b: b)
        self.ckpt = CheckpointManager(checkpoint_dir)
        self.log_path = log_path
        # multihost: exactly one process writes checkpoints/logs — every
        # host saving to the SAME path on a shared filesystem interleaves
        # tmp-file writes and corrupts the renamed checkpoint
        self.is_main = jax.process_index() == 0
        self.epoch = 0
        if log_path:
            os.makedirs(os.path.dirname(log_path), exist_ok=True)
        self.tb = None
        if tensorboard_dir:  # parity: lib/train/admin/tensorboard.py:10-27
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self.tb = None

    # ------------------------------------------------------------------ util
    def _log(self, msg: str):
        if not self.is_main:
            return
        print(msg, flush=True)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(msg + "\n")

    def _log_metrics(self, record: dict):
        if not self.is_main:
            return
        if self.log_path:
            with open(self.log_path + ".jsonl", "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.tb is not None:
            epoch = record.get("epoch", 0)
            for group in ("train", "val"):
                payload = record.get(group) or {}
                flat = payload.items() if group == "train" else (
                    (f"{n}/{k}", v) for n, d in payload.items() for k, v in d.items())
                for k, v in flat:
                    self.tb.add_scalar(f"{group}/{k}", v, epoch)

    # ----------------------------------------------------------------- train
    def train_epoch(self) -> dict:
        meters = defaultdict(AverageMeter)
        t_start = time.time()
        n_frames = 0
        interval = int(self.cfg.TRAIN.PRINT_INTERVAL)
        # metric device->host conversion is DEFERRED to the print boundary:
        # float(v) every step blocks the host on that step's scalars, so the
        # loop would run at step_time + load_time instead of overlapping the
        # input pipeline with the device (the arrays are tiny; holding
        # `interval` of them costs nothing)
        pending = []

        def drain():
            for metrics, bs in pending:
                for k, v in metrics.items():
                    meters[k].update(float(v), bs)
            pending.clear()

        for i, batch in enumerate(self.train_loader, start=1):
            batch = self.shard_fn(batch)
            self.state, metrics = self.train_step(self.state, batch)
            bs = batch["search_images"].shape[0] * batch["search_images"].shape[1]
            n_frames += bs
            pending.append((metrics, bs))
            if i % interval == 0:
                drain()
                fps = n_frames / (time.time() - t_start)
                self._log(f"[train: {self.epoch}, {i}] FPS: {fps:.1f}  "
                          + _fmt_stats(meters))
        drain()
        return {k: m.avg for k, m in meters.items()}

    def validate(self) -> dict:
        out = {}
        if self.eval_step is None:
            return out
        for name, loader in self.val_loaders.items():
            meters = defaultdict(AverageMeter)
            for batch in loader:
                batch = self.shard_fn(batch)
                metrics = self.eval_step(self.state, batch)
                bs = batch["search_images"].shape[0] * batch["search_images"].shape[1]
                for k, v in metrics.items():
                    meters[k].update(float(v), bs)
            out[name] = {k: m.avg for k, m in meters.items()}
            self._log(f"[val {name}: {self.epoch}] " + _fmt_stats(meters))
        return out

    def _state_for_save(self):
        """Host copy of the TrainState. Single-host: plain device_get (works
        for ZeRO-1 shards — all addressable). Multihost: ZeRO-1 moments span
        non-addressable devices, so gather the global values via
        process_allgather (a collective — every process must call this, even
        though only process 0 writes the file). tiled=True is required for
        global non-fully-addressable arrays and returns each leaf's GLOBAL
        logical value (replicated leaves come back at their own shape, ZeRO-1
        shards fully gathered) — caught by tests/test_multihost_train.py."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(self.state, tiled=True)
        return jax.device_get(self.state)

    def train(self, max_epochs: int, load_latest: bool = True,
              fail_safe: bool = True, max_retries: int = 10):
        if load_latest and self.ckpt.has_checkpoint():
            self.state, extra, self.epoch = self.ckpt.restore(self.state)
            self._log(f"resumed from epoch {self.epoch}")

        retries = 0
        while self.epoch < max_epochs:
            try:
                self.epoch += 1
                train_stats = self.train_epoch()
                val_interval = int(self.cfg.TRAIN.VAL_EPOCH_INTERVAL)
                val_stats = self.validate() if (val_interval > 0 and self.epoch % val_interval == 0) else {}
                host_state = self._state_for_save()
                if self.is_main:
                    # async: the host snapshot already happened (above /
                    # inside save_async); msgpack + disk write overlap the
                    # next epoch. wait() below makes the tail durable.
                    self.ckpt.save_async(self.epoch, host_state,
                                         {"train": train_stats,
                                          "val": val_stats})
                self._log_metrics({"epoch": self.epoch, "train": train_stats,
                                   "val": val_stats, "time": time.time()})
                # human-readable epoch summary (parity: the reference's
                # LTRTrainer writes per-epoch stats to its run log; short
                # runs otherwise never touch the .log, only the .jsonl)
                self._log(f"[epoch {self.epoch}/{max_epochs}] "
                          + _fmt_stats(train_stats))
                retries = 0
            except Exception:
                if not fail_safe or retries >= max_retries:
                    raise
                retries += 1
                self._log(f"epoch {self.epoch} crashed (retry {retries}):\n"
                          + traceback.format_exc())
                self.epoch -= 1
                # consume any deferred async-save error FIRST: letting it
                # re-raise out of has_checkpoint()/restore() (which join the
                # writer) would replace the fail-safe recovery path with a
                # stale disk error; the restore below reads the last save
                # that actually landed
                try:
                    self.ckpt.wait()
                except Exception:
                    self._log("async checkpoint save had failed:\n"
                              + traceback.format_exc())
                if self.ckpt.has_checkpoint():
                    # safe even after donation: restore only reads the
                    # template's STRUCTURE (from_state_dict), never the
                    # possibly-deleted buffers
                    self.state, _, self.epoch = self.ckpt.restore(self.state)
                    self._log(f"restarted from epoch {self.epoch}")
                elif any(getattr(x, "is_deleted", lambda: False)()
                         for x in jax.tree_util.tree_leaves(self.state)):
                    # the step donated the state and the crash left its
                    # buffers deleted, with no checkpoint to reload:
                    # retrying would raise 'Array has been deleted'
                    # max_retries times and mask the real error
                    self._log("donated state invalidated and no checkpoint "
                              "exists; re-raising the original error")
                    raise
        self.ckpt.wait()  # final epoch's async save is durable on return
        return self.state
