"""Interleaved A/B: cond-gated batched prompt re-mine vs unconditional.

The lockstep step (track/batch.py::_step_fn) re-mines prompts every
UPDATE_INTERVAL frames; the batched path used to run forward_prompt every
frame and select with jnp.where. UVLTRACK_BATCH_COND_REMINE=1 (default)
wraps it in lax.cond(jnp.any(refresh), ...) — a scalar predicate, so XLA
keeps it a true conditional (like the single-stream tracker's in-step
cond, TPU_DESIGN "per-frame step") and interval-1 of every interval
lockstep steps skip the whole prompter pass.

Each leg is a fresh subprocess (the knob is read at trace time) running
bench.bench_multistream at s16 / UVLTrack-B — the recommended single-chip
lockstep capacity. Prints one JSON line: per-leg aggregate FPS, medians,
cond/where ratio.

Usage: python scripts/bench_cond_remine_ab.py [--rounds 3] [--iters 128]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG_SRC = """
import json, sys
sys.path.insert(0, {repo!r})
import bench
agg = bench.bench_multistream({config!r}, streams={streams}, iters={iters},
                              chunk={chunk})
print(json.dumps({{"agg_fps": round(agg, 2)}}))
"""


def run_leg(cond: bool, config: str, streams: int, iters: int, chunk: int,
            timeout_s: float) -> dict:
    env = dict(os.environ)
    env["UVLTRACK_BATCH_COND_REMINE"] = "1" if cond else "0"
    src = LEG_SRC.format(repo=REPO, config=config, streams=streams,
                         iters=iters, chunk=chunk)
    proc = subprocess.run([sys.executable, "-u", "-c", src],
                          capture_output=True, text=True, timeout=timeout_s,
                          env=env, cwd=REPO)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    tail = proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ""
    raise RuntimeError(f"no JSON from leg (rc={proc.returncode}): {tail}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--streams", type=int, default=16)
    p.add_argument("--iters", type=int, default=128)
    # chunk*streams full 720p frames live in HBM per dispatch: 16x16 is
    # ~28 GB u8 and OOMs the 16 GB chip (bench.py's sweep uses chunk=4
    # at s>=16 for the same reason).
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--timeout", type=float, default=1800.0)
    args = p.parse_args(argv)

    cond_fps, where_fps = [], []
    t0 = time.perf_counter()
    for r in range(args.rounds):
        for cond in (True, False):
            leg = "cond" if cond else "where"
            try:
                out = run_leg(cond, args.config, args.streams, args.iters,
                              args.chunk, args.timeout)
            except Exception as e:
                print(f"[{time.perf_counter() - t0:.0f}s] round {r} {leg} "
                      f"FAILED: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            fps = out["agg_fps"]
            (cond_fps if cond else where_fps).append(fps)
            print(f"[{time.perf_counter() - t0:.0f}s] round {r} {leg}: "
                  f"{fps} aggregate fps", file=sys.stderr)

    result = {"streams": args.streams, "cond_fps": cond_fps,
              "where_fps": where_fps}
    if cond_fps and where_fps:
        mc = statistics.median(cond_fps)
        mw = statistics.median(where_fps)
        result.update({"cond_median": mc, "where_median": mw,
                       "cond_over_where": round(mc / mw, 4)})
    print(json.dumps(result))


if __name__ == "__main__":
    main()
