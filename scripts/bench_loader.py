"""Training input-pipeline throughput bench (host-side, no TPU needed).

Measures the FULL loader chain the train CLI uses outside --synthetic:
synthetic LaSOT disk layout -> names2datasets -> GroundingAndTrackingSampler
-> TrackProcessing -> collate_frame_major, in samples/s, for the thread pool
and the process pool at several worker counts.

Context (TPU_DESIGN.md "Data path"): the train step consumes ~330 samples/s
per v5e chip at batch 8; the loader must sustain that per chip. The
reference feeds its 3090 with 10 worker processes
(lib/train/data/loader.py:124-194).

Usage: python scripts/bench_loader.py [--frames 720,1280] [--seconds 20]
Prints one JSON line per (mode, workers) combination.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def write_lasot(root: str, n_seq: int = 4, n_frames: int = 64,
                h: int = 720, w: int = 1280, quality: int = 80) -> None:
    import cv2

    rng = np.random.default_rng(0)
    names = []
    for k in range(n_seq):
        name = f"airplane-{k + 1}"
        d = os.path.join(root, "airplane", name, "img")
        os.makedirs(d)
        seq_dir = os.path.dirname(d)
        gt = np.tile([40.0 + k, 60.0, 300.0, 260.0], (n_frames, 1))
        np.savetxt(os.path.join(seq_dir, "groundtruth.txt"), gt,
                   delimiter=",", fmt="%d")
        with open(os.path.join(seq_dir, "full_occlusion.txt"), "w") as f:
            f.write(",".join(["0"] * n_frames))
        with open(os.path.join(seq_dir, "out_of_view.txt"), "w") as f:
            f.write(",".join(["0"] * n_frames))
        with open(os.path.join(seq_dir, "nlp.txt"), "w") as f:
            f.write("a toy plane drifting over textured ground\n")
        # real JPEG content (textured, so decode cost is realistic, not a
        # flat-field best case)
        base = rng.integers(0, 255, size=(h // 4, w // 4, 3)).astype(np.uint8)
        base = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
        for i in range(1, n_frames + 1):
            frame = np.roll(base, 7 * i, axis=1)
            cv2.imwrite(os.path.join(d, f"{i:08d}.jpg"), frame,
                        [cv2.IMWRITE_JPEG_QUALITY, quality])
        names.append(name)
    with open(os.path.join(root, "training_set.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def build_loader(lasot_root: str, batch: int, workers: int, mode: str):
    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.data.loader import SamplerLoader
    from uvltrack_tpu.data.processing import TrackProcessing
    from uvltrack_tpu.data.sampler import GroundingAndTrackingSampler
    from uvltrack_tpu.data.datasets.video_datasets import Lasot

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg(os.path.join(repo, "experiments/uvltrack/baseline_base.yaml"))
    ds = Lasot(lasot_root, split="train")
    proc = TrackProcessing(cfg, seed=0)
    sampler = GroundingAndTrackingSampler(
        [ds], [1.0], samples_per_epoch=10_000,
        max_gap=int(cfg.DATA.MAX_SAMPLE_INTERVAL), processing=proc,
        num_search_frames=int(cfg.DATA.SEARCH.NUMBER), mode=cfg.TRAIN.MODE,
        grounding_ratio=float(cfg.TRAIN.GROUNDING_RATIO),
        vl_ratio=float(cfg.TRAIN.VL_RATIO), tokenizer=None,
        max_query_len=int(cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN),
        seed=0)
    return SamplerLoader(sampler, batch, steps_per_epoch=10_000,
                         num_workers=workers, prefetch=4, worker_mode=mode)


def measure(loader, seconds: float, min_batches: int = 3) -> dict:
    it = iter(loader)
    next(it)  # warm: pool spin-up, first decode
    t0 = time.perf_counter()
    n = 0
    while True:
        next(it)
        n += 1
        dt = time.perf_counter() - t0
        if dt > seconds and n >= min_batches:
            break
    return {"batches": n, "seconds": round(dt, 2),
            "samples_per_s": round(n * loader.batch_size / dt, 1)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", default="720,1280")
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", default="1,4,10")
    p.add_argument("--modes", default="thread,process")
    args = p.parse_args(argv)
    h, w = (int(x) for x in args.frames.split(","))

    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "lasot")
        os.makedirs(root)
        write_lasot(root, h=h, w=w)
        ncpu = os.cpu_count()
        for mode in args.modes.split(","):
            for workers in (int(x) for x in args.workers.split(",")):
                loader = build_loader(root, args.batch, workers, mode)
                r = measure(loader, args.seconds)
                r.update(mode=mode, workers=workers, batch=args.batch,
                         host_cpus=ncpu, frame=f"{h}x{w}")
                print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
