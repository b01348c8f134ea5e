"""Loader worker-pool modes: thread vs process (reference NUM_WORKER procs,
lib/train/data/loader.py:124-194) + a per-sample cost guard.

scripts/bench_loader.py measures the full chain at realistic 720p; this test
keeps the properties that must not regress: process workers draw DISTINCT
RNG streams after fork (sampler.reseed), both modes produce identical-schema
frame-major batches, and the per-sample host cost stays bounded (the
sample_target_np mask path was once 42% of sample time)."""

import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from uvltrack_tpu.data.loader import SamplerLoader, collate_frame_major


class CountingSampler:
    """Picklable sampler stub recording which RNG stream produced each draw."""

    def __init__(self, seed=0):
        from uvltrack_tpu.data.sampler import _ThreadLocalRng

        self._rng = _ThreadLocalRng(seed)

    def reseed(self, key):
        self._rng.reseed(key)

    def __call__(self):
        # small busy time so a multi-worker pool must spread draws across
        # workers — on a loaded 1-core host, worker 1 could otherwise drain
        # every queued item before workers 2..N finish forking (observed:
        # the all-same-pid flake in the full-suite run)
        time.sleep(0.02)
        r = self._rng.get()
        v = float(r.random())
        return {
            "template_images": np.full((1, 4, 4, 3), v, np.float32),
            "template_anno": np.zeros((1, 4), np.float32),
            "search_images": np.full((2, 8, 8, 3), v, np.float32),
            "search_anno": np.zeros((2, 4), np.float32),
            "search_cls": np.zeros((2, 1, 1), np.float32),
            "text": np.zeros((2, 4), np.int32),
            "text_mask": np.zeros((2, 4), np.int32),
            "flag": np.zeros((1,), np.int32),
            "pid": float(os.getpid()),
        }


def _collate_with_pid(samples):
    batch = collate_frame_major(samples)
    batch["pid"] = np.asarray([s["pid"] for s in samples])
    return batch


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_worker_modes_produce_frame_major_batches(mode, monkeypatch):
    monkeypatch.setattr("uvltrack_tpu.data.loader.collate_frame_major",
                        _collate_with_pid)
    loader = SamplerLoader(CountingSampler(), batch_size=6, steps_per_epoch=3,
                           num_workers=3, worker_mode=mode)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["search_images"].shape == (2, 6, 8, 8, 3)
    assert b["template_images"].shape == (1, 6, 4, 4, 3)
    values = np.concatenate(
        [bb["search_images"][0, :, 0, 0, 0] for bb in batches])
    if mode == "process":
        # the pool really forked...
        assert len(set(np.concatenate([bb["pid"] for bb in batches]))) > 1
    # ...and forked/threaded RNG streams never duplicate a draw
    assert len(np.unique(values)) == len(values)


def test_process_workers_are_deterministic_per_worker():
    """reseed(epoch*num_workers + worker_id) keys each process's stream only
    by (seed, epoch, worker_id): every value a 2-worker pool draws in epoch
    e comes from one of the two precomputable streams (scheduling decides
    how many per worker, never which numbers)."""
    from uvltrack_tpu.data.sampler import _ThreadLocalRng

    def stream_values(wid, n=64):
        r = _ThreadLocalRng(5)
        r.reseed(wid)
        gen = r.get()
        return {np.float32(gen.random()) for _ in range(n)}

    loader = SamplerLoader(CountingSampler(seed=5), batch_size=8,
                           steps_per_epoch=2, num_workers=2,
                           worker_mode="process")
    for epoch in (1, 2):  # epoch counter starts at 1
        expected = stream_values(2 * epoch) | stream_values(2 * epoch + 1)
        drawn = []
        for b in loader:
            drawn += list(b["search_images"][0, :, 0, 0, 0])
        assert drawn and all(v in expected for v in drawn)


def test_process_worker_epochs_draw_distinct_streams():
    """A fresh pool is built per epoch and workers fork from a parent whose
    RNG never advances — without the epoch offset in the reseed key, every
    epoch would replay epoch 1's samples exactly."""
    loader = SamplerLoader(CountingSampler(seed=9), batch_size=6,
                           steps_per_epoch=2, num_workers=2,
                           worker_mode="process")
    epochs = []
    for _ in range(2):
        vals = []
        for b in loader:
            vals += list(b["search_images"][0, :, 0, 0, 0])
        epochs.append(set(np.float32(v) for v in vals))
    assert epochs[0].isdisjoint(epochs[1])


class IndexedBrokenSampler(CountingSampler):
    """Index-aware sampler whose body raises TypeError — must propagate."""

    def __call__(self, index):
        raise TypeError("bug inside the sampler body")


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_sampler_internal_typeerror_propagates(mode):
    """Index-awareness is decided by signature inspection, not by catching
    TypeError at call time — a TypeError raised INSIDE the sampler must
    surface, never be silently retried without the index (which would
    double-advance the RNG and drop grounding_test's index->sequence map)."""
    loader = SamplerLoader(IndexedBrokenSampler(), batch_size=2,
                           steps_per_epoch=1, num_workers=2, worker_mode=mode)
    with pytest.raises(TypeError, match="inside the sampler body"):
        list(loader)


def test_per_sample_host_cost_guard():
    """Full TrackProcessing on a synthetic 720p frame stays under a loose
    per-sample budget (catches quadratic/full-frame regressions like the
    float64 np.ones mask; generous bound for a contended 1-core CI host)."""
    from uvltrack_tpu.config import default_cfg
    from uvltrack_tpu.data.processing import TrackProcessing

    cfg = default_cfg()
    proc = TrackProcessing(cfg, seed=0)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (720, 1280, 3)).astype(np.uint8)
    args = ([frame], [np.array([300.0, 200.0, 300.0, 260.0])],
            [frame, frame], [np.array([310.0, 205.0, 300.0, 260.0])] * 2,
            None)
    proc.track_process(*args)  # warm
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = proc.track_process(*args)
    per = (time.perf_counter() - t0) / n
    assert out["search_images"].shape[0] == 2
    assert per < 0.5, f"track_process {per * 1e3:.0f} ms/sample"
