#!/bin/bash
# Round-4 chip measurement sequence. Stages run SERIALLY: the tunnel serves
# exactly one client at a time (DEVNOTES), so never parallelize these.
# Ordered by VERDICT-round-3 value: int8 verdict (#2), train smoke (#3),
# proj-epilogue 5-round A/B (#4), then a full bench validating the new
# incremental headline printing (#1). Logs to output/round4_chip.log.
set -u
cd /root/repo
mkdir -p output
LOCK=output/tpu_return.lock
echo "=== round4 chip sequence start $(date) ===" >> output/round4_chip.log

echo "--- stage 1: int8 A/B (3 interleaved rounds, tpu_return quant stage) ---" >> output/round4_chip.log
# tpu_return.py takes and releases the lock itself (and refuses a fresh
# foreign lock), so stage 1 must NOT hold it.
timeout 5400 python -u scripts/tpu_return.py --skip prefix,proj,bench --rounds 3 \
  >> output/round4_chip.log 2>&1
echo "quant rc=$?" >> output/round4_chip.log

# Stages 2-4 are manual TPU work: hold the tunnel lock ourselves so a
# probe-loop tpu_return.py can't start mid-stage (CLAUDE.md: one tunnel
# client; "manual TPU work should check for it"). Refreshed per stage —
# tpu_return treats a lock older than 4h as stale and each stage fits.
# Never clobber a live FOREIGN lock (e.g. stage 1 exited rc=1 refusing
# one, or a client slipped in after stage 1 released): wait it out the
# same way tpu_return.py does, honoring its 4h staleness rule.
acquire_lock() {
  # atomic create (noclobber): two concurrent acquirers can't both win —
  # the check-then-write race ADVICE r4 flagged is gone. On failure we
  # fall through to the staleness/dead-holder wait below and re-try.
  while ! (set -o noclobber; echo "$$ $(date +%s)" > "$LOCK") 2>/dev/null; do
    # the holder may delete the lock between -f and stat (it vanishes in
    # tpu_return's finally) — treat a failed stat as "gone, re-check"
    mtime=$(stat -c %Y "$LOCK" 2>/dev/null) || { sleep 1; continue; }
    age=$(( $(date +%s) - mtime ))
    if [ "$age" -ge 14400 ]; then
      echo "stale lock (age ${age}s) — taking over" >> output/round4_chip.log
      break
    fi
    # the lock records "PID timestamp": a dead holder (e.g. stage 1's
    # tpu_return SIGKILLed by its outer timeout before its finally ran)
    # must not cost the 4h staleness wait
    holder=$(awk '{print $1}' "$LOCK" 2>/dev/null)
    if [ -n "${holder:-}" ] && ! kill -0 "$holder" 2>/dev/null; then
      echo "lock holder pid=$holder is dead — taking over" >> output/round4_chip.log
      break
    fi
    echo "tunnel lock held by pid=${holder:-?} (age ${age}s); waiting 60s" \
      >> output/round4_chip.log
    sleep 60
  done
  echo "$$ $(date +%s)" > "$LOCK"
}
acquire_lock
trap 'rm -f "$LOCK"' EXIT

echo "--- stage 2: train smoke on chip (async ckpt + GRAD_ACCUM=2) ---" >> output/round4_chip.log
timeout 2700 python -m uvltrack_tpu.cli.train --config baseline_base \
  --synthetic 3 --epochs 2 --batch_size 4 --save_dir /tmp/vt_r4 \
  --set TPU.GRAD_ACCUM=2 --set TPU.COMPILE_CACHE=output/xla_cache \
  >> output/round4_chip.log 2>&1
echo "train rc=$?" >> output/round4_chip.log

echo "$$ $(date +%s)" > "$LOCK"
echo "--- stage 3: proj-epilogue A/B, 5 interleaved rounds ---" >> output/round4_chip.log
timeout 7200 python -u scripts/bench_fused_prefix_ab.py --knob proj --rounds 5 --iters 192 \
  > output/round4_proj_ab.json 2>> output/round4_chip.log
echo "proj rc=$?" >> output/round4_chip.log

echo "$$ $(date +%s)" > "$LOCK"
echo "--- stage 4: full bench (incremental headline printing) ---" >> output/round4_chip.log
# 4800 > primary timeout (2400) + extras budget (1200) + slack: the outer
# timeout must never undercut the budget the extras phase was promised
timeout 4800 python -u bench.py > output/round4_bench.stdout 2>> output/round4_chip.log
echo "bench rc=$?" >> output/round4_chip.log
echo "=== round4 chip sequence done $(date) ===" >> output/round4_chip.log
