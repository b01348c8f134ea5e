"""Serving-capacity probe: lockstep streams per chip, fp vs weight-only int8.

TPU_DESIGN step 6 ended round 4 with int8 measured NEGATIVE for latency and
the fallback claim — "halved weight HBM => 2x the streams per chip" — still
asserted, never benchmarked (VERDICT r4 #3). This measures it directly:

for each (config, quant) x stream-count leg, IN A SUBPROCESS (an OOM must
kill the leg, not poison the parent's tunnel client), run the lockstep
BatchTracker the way bench.py's multistream extra does and record:
  - aggregate FPS and per-frame p50 latency per stream (= chunk wall /
    chunk; lockstep advances every stream together),
  - device HBM in use after the run (memory_stats, when the backend
    exposes it),
  - OOM boundary: a leg whose child dies with RESOURCE_EXHAUSTED in
    stderr is recorded as {"oom": true}.

The SLO framing for "capacity": max streams whose p50 per-frame latency
still meets --slo_ms (default 33 ms ~ video rate), and max streams that
fit HBM at all, per quant. If int8 moves neither boundary, the capacity
claim is retracted (the staging block + activations dominate, not weights).

Run on the real TPU (serialize with other tunnel clients):
  python scripts/bench_capacity.py                  # full table, one JSON line
  python scripts/bench_capacity.py --leg baseline_base fp 16   # one child leg
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# decision points, cheapest first. B s16 is the bench's recommended
# capacity (s24 plateau, s32 OOM in r4); L s16 sits right at the 33ms SLO
# and L s8 is the operating point that actually meets it (measured p50
# 23.7/21.7 ms fp/int8) — without the s8 rows the summary would report
# max_streams_at_slo=0 for L, contradicting the measured capacity.
DEFAULT_LEGS = [
    ("baseline_base", "fp", 16),
    ("baseline_base", "int8", 16),
    ("baseline_base", "fp", 32),
    ("baseline_base", "int8", 32),
    ("baseline_large", "fp", 8),
    ("baseline_large", "int8", 8),
    ("baseline_large", "fp", 16),
    ("baseline_large", "int8", 16),
    ("baseline_large", "fp", 24),
    ("baseline_large", "int8", 24),
]


def run_leg(config: str, quant: str, streams: int, iters: int,
            chunk: int = 4) -> dict:
    """One capacity leg in-process: lockstep streams at `chunk`-deep scan
    dispatch, per-chunk walls fenced so p50 latency is honest."""
    import jax
    import jax.numpy as jnp

    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.models.uvltrack import build_model, init_model
    from uvltrack_tpu.track.batch import BatchTracker

    from bench import default_compile_cache  # the ONE cache-defaulting copy

    cfg = load_cfg(os.path.join(REPO, f"experiments/uvltrack/{config}.yaml"))
    cfg.TEST.MODE = "BBOX"
    if quant == "int8":
        cfg.TPU.WEIGHT_QUANT = "int8"
    default_compile_cache(cfg)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    bt = BatchTracker(cfg, model, variables, num_streams=streams)

    rng = np.random.default_rng(1)
    first = [rng.integers(0, 255, (720, 1280, 3)).astype(np.uint8)
             for _ in range(streams)]
    boxes = np.tile([600.0, 300.0, 120.0, 160.0], (streams, 1))
    boxes[:, 0] += rng.integers(-50, 50, streams)
    bt.initialize(first, boxes)
    base = jnp.stack([jnp.asarray(f) for f in first])
    block = jax.device_put(jnp.stack(
        [base + np.uint8(i % 3) for i in range(chunk)]))

    def fence(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

    fence(block)
    packs = bt.step_many_async(block)  # compile + warmup
    fence(packs)
    walls = []
    n_chunks = max(4, iters // chunk)
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        packs = bt.step_many_async(block)
        fence(packs)  # per-chunk fence: latency, not just throughput
        walls.append(time.perf_counter() - t0)
    out = np.asarray(packs)
    assert np.isfinite(out).all()
    walls = np.asarray(walls)
    hbm = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            hbm = {k: int(stats[k]) for k in
                   ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                   if k in stats}
    except Exception:
        pass
    frame_ms = walls / chunk * 1e3  # lockstep: every stream advances/chunk
    return {
        "config": config, "quant": quant, "streams": streams,
        "agg_fps": round(streams * chunk / float(np.median(walls)), 2),
        "frame_p50_ms": round(float(np.percentile(frame_ms, 50)), 3),
        "frame_p90_ms": round(float(np.percentile(frame_ms, 90)), 3),
        "hbm": hbm,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--leg", nargs=3, metavar=("CONFIG", "QUANT", "S"),
                   default=None, help="child mode: run one leg, print JSON")
    p.add_argument("--iters", type=int, default=48)
    p.add_argument("--slo_ms", type=float, default=33.0)
    p.add_argument("--timeout", type=float, default=1500.0,
                   help="per-leg child timeout (cold L compiles are slow)")
    args = p.parse_args(argv)

    if args.leg:
        config, quant, s = args.leg
        print(json.dumps(run_leg(config, quant, int(s), args.iters)),
              flush=True)
        return

    table = []
    skip = set()  # (config, quant) whose smaller S already OOMed
    for config, quant, s in DEFAULT_LEGS:
        if any((config, quant, s0) in skip for s0 in range(1, s)):
            table.append({"config": config, "quant": quant, "streams": s,
                          "skipped": "smaller S already OOMed"})
            continue
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg",
                 config, quant, str(s), "--iters", str(args.iters)],
                capture_output=True, text=True, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            table.append({"config": config, "quant": quant, "streams": s,
                          "timeout": True})
            continue
        dt = round(time.perf_counter() - t0, 1)
        if proc.returncode == 0 and proc.stdout.strip():
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            row["leg_wall_s"] = dt
            table.append(row)
        else:
            oom = ("RESOURCE_EXHAUSTED" in proc.stderr
                   or "Out of memory" in proc.stderr
                   or "out of memory" in proc.stderr)
            table.append({"config": config, "quant": quant, "streams": s,
                          "oom": bool(oom), "rc": proc.returncode,
                          "stderr_tail": proc.stderr.strip()[-300:]})
            if oom:
                skip.add((config, quant, s))
        sys.stderr.write(f"[{config} {quant} s{s}] {table[-1]}\n")

    # capacity summary per (config, quant): max S fitting HBM, max S at SLO
    summary = {}
    for row in table:
        key = f"{row['config']}:{row['quant']}"
        c = summary.setdefault(key, {"max_streams_fit": 0,
                                     "max_streams_at_slo": 0})
        if row.get("agg_fps"):
            c["max_streams_fit"] = max(c["max_streams_fit"], row["streams"])
            if row["frame_p50_ms"] <= args.slo_ms:
                c["max_streams_at_slo"] = max(c["max_streams_at_slo"],
                                              row["streams"])
    print(json.dumps({"slo_ms": args.slo_ms, "legs": table,
                      "capacity": summary}))


if __name__ == "__main__":
    main()
