"""Corrected end-to-end A/B: fused block-prefix kernel vs step-3 qkv kernel.

History (TPU_DESIGN.md "Attention" step 4): the original +4-6% e2e claim for
`fused_ln_qkv_attention` was measured against a leg where
UVLTRACK_FUSED_PREFIX=0 accidentally fell back to PURE XLA (dispatch bug,
fixed in the round-3 review sweep) — so it measured fused-vs-XLA, not
fused-vs-step-3. This script re-runs the honest comparison: interleaved
subprocess legs (A=fused prefix, B=qkv kernel without the LN/matmul
prologue), each a full `bench.py --extra primary` run (deferred tracked FPS,
UVLTrack-B, 720p frames) in its own tunnel client.

Usage:  python scripts/bench_fused_prefix_ab.py [--rounds 3] [--iters 192]
        python scripts/bench_fused_prefix_ab.py --knob proj   # proj-epilogue A/B

--knob proj A/Bs the round-3 full-branch kernel instead (UVLTRACK_FUSED_PROJ:
A = LN+qkv+attn+proj+residual in one program, B = the shipped fused prefix +
composed proj); both legs keep UVLTRACK_FUSED_PREFIX=1. Flip the
UVLTRACK_FUSED_PROJ default in ops/attention.attention_block_core only on a
measured win here.

Prints one JSON line: per-leg FPS lists, medians, and the fused/qkv ratio.
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


def run_leg(fused: bool, config: str, iters: int, timeout_s: float,
            knob: str = "prefix") -> dict:
    env = dict(os.environ)
    if knob == "proj":
        env["UVLTRACK_FUSED_PREFIX"] = "1"
        env["UVLTRACK_FUSED_PROJ"] = "1" if fused else "0"
    else:
        env["UVLTRACK_FUSED_PREFIX"] = "1" if fused else "0"
        env.pop("UVLTRACK_FUSED_PROJ", None)
    env["UVLTRACK_BENCH_EXTRAS"] = "0"  # skip the upload-overlap tail
    env["UVLTRACK_BENCH_ITERS"] = str(iters)
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "bench.py"),
         "--extra", "primary", "--config", config],
        capture_output=True, text=True, timeout=timeout_s, env=env)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    tail = proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ""
    raise RuntimeError(f"no JSON from leg (rc={proc.returncode}): {tail}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved A/B pairs (A=fused, B=qkv)")
    p.add_argument("--iters", type=int, default=192)
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--knob", choices=("prefix", "proj"), default="prefix",
                   help="prefix: fused LN+qkv prologue vs qkv kernel; "
                        "proj: +proj/residual epilogue vs shipped prefix")
    p.add_argument("--timeout", type=float, default=2400.0,
                   help="per-leg cap; first cold compile can take ~9-13 min")
    args = p.parse_args(argv)

    fused_fps, qkv_fps = [], []
    t0 = time.perf_counter()
    for r in range(args.rounds):
        for fused in (True, False):
            leg = "fused" if fused else "qkv"
            try:
                out = run_leg(fused, args.config, args.iters,
                              args.timeout, knob=args.knob)
            except Exception as e:
                print(f"[{time.perf_counter() - t0:.0f}s] round {r} {leg} "
                      f"FAILED: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            fps = out["fps_primary"]
            (fused_fps if fused else qkv_fps).append(fps)
            print(f"[{time.perf_counter() - t0:.0f}s] round {r} {leg}: "
                  f"{fps} fps (sync p50 {out.get('sync_p50_ms')}ms, "
                  f"attn={out.get('attn')})", file=sys.stderr)

    result = {"knob": args.knob, "fused_fps": fused_fps,
              "qkv_fps": qkv_fps}
    if fused_fps and qkv_fps:
        mf = statistics.median(fused_fps)
        mq = statistics.median(qkv_fps)
        result.update({"fused_median": mf, "qkv_median": mq,
                       "fused_over_qkv": round(mf / mq, 4)})
    print(json.dumps(result))


if __name__ == "__main__":
    main()
