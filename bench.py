"""Benchmark: tracked FPS/chip for UVLTrack on the real TPU.

Measures the FULL tracking step (device-side crop/resize/normalize + backbone
+ head + Hann/contrastive decode + map-back + state update) on 720p frames,
i.e. the per-frame latency a user sees — a stricter measurement than the
reference's model-only profile (tracking/profile_model.py:30-47, ~60 FPS on
an RTX 3090 for UVLTrack-B, ~34 FPS for UVLTrack-L).

Prints ONE JSON line: the primary metric (UVLTrack-B tracked FPS/chip,
deferred readback) plus an "extra" dict with the other measured lines:
  - sync per-frame latency (includes one host readback per frame)
  - upload-included pipelined FPS (per-frame H2D device_put included,
    chunk-double-buffered) + the measured upload/compute overlap factor
  - UVLTrack-L tracked FPS/chip (vs the 34 FPS 3090 baseline)
  - 8-stream UVLTrack-L lockstep aggregate FPS (BASELINE.json config 5)
  - training samples/s on one chip (full jitted train step, synthetic batch)

Extras run under a time budget (UVLTRACK_BENCH_BUDGET_S, default 1800s —
sized to absorb one observed ~10-min tunnel degradation; measured from the
END of the primary so a cold ~13-min tunnel compile can't
starve them) and each is fault-isolated; the headline JSON re-prints,
cumulatively, after the primary and after EVERY completed extra — the last
stdout JSON line is always parseable and an outer timeout loses at most
the extra in flight.

Driver-proofing (round 5): each extra's subprocess timeout is capped at
min(remaining budget, its own cap — ~330s, sweep 600s) so ONE tunnel blip
can never eat the whole extras budget (round 4 lost every extra to a
single 1200s hang); a failed extra gets ONE retry, preceded by a cheap
tunnel health probe loop that detects the blip mode (child silent at jax
init) and resumes the moment the tunnel answers. MFU lines (mfu_b, mfu_l,
mfu_b_s16) come from XLA cost analysis of the EXACT compiled programs the
bench timed, vs the v5e bf16 peak (UVLTRACK_TPU_PEAK_TFLOPS, default 197).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_FPS_B = 60.0  # UVLTrack-B on RTX 3090 (reference README.md:130)
BASELINE_FPS_L = 34.0  # UVLTrack-L on RTX 3090 (reference README.md:133)
# v5e bf16 peak per chip; override for other TPU generations
TPU_PEAK_FLOPS = float(os.environ.get(
    "UVLTRACK_TPU_PEAK_TFLOPS", "197")) * 1e12
T0 = time.perf_counter()


def mfu_of(flops_per_frame: float, fps: float) -> float:
    return round(flops_per_frame * fps / TPU_PEAK_FLOPS, 4)


def log(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


def elapsed():
    return time.perf_counter() - T0


def fence(x):
    """block_until_ready can return early through the sandbox tunnel; a tiny
    readback is the only reliable fence (DEVNOTES)."""
    np.asarray(jax_slice(x))


def jax_slice(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return leaf.reshape(-1)[:1]


def default_compile_cache(cfg):
    """Point cfg at the shared persistent XLA compile cache unless the
    experiment sets its own or UVLTRACK_BENCH_CACHE=0 (cold-compile timing).
    The ONE copy of this defaulting — every bench model build goes through
    it so all legs share warm compiles."""
    if (os.environ.get("UVLTRACK_BENCH_CACHE", "1") == "1"
            and not cfg.TPU.COMPILE_CACHE):
        cfg.TPU.COMPILE_CACHE = os.path.join(REPO, "output", "xla_cache")


def make_tracker(config: str, build_tracker: bool = True):
    """build_tracker=False skips the Tracker (and its bf16 variable cast)
    for callers that construct their own with a tokenizer."""
    import jax

    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.models.uvltrack import build_model, init_model
    from uvltrack_tpu.track.tracker import Tracker

    cfg = load_cfg(os.path.join(REPO, f"experiments/uvltrack/{config}.yaml"))
    cfg.TEST.MODE = "BBOX"
    # persistent compile cache: the fused-block pallas path makes the first
    # tracker compile expensive (~9 min through the tunnel); cached repeats
    # start in seconds. UVLTRACK_BENCH_CACHE=0 disables for cold-compile
    # timing experiments.
    default_compile_cache(cfg)
    # UVLTRACK_BENCH_QUANT=int8 -> weight-only int8 on the ViT matmul
    # kernels (cfg.TPU.WEIGHT_QUANT; halves the dominant weight stream at
    # bs=1 — A/B this against the default when the chip is reachable)
    q = os.environ.get("UVLTRACK_BENCH_QUANT")
    if q:
        cfg.TPU.WEIGHT_QUANT = q
    # default: cfg.TPU.USE_PALLAS_ATTENTION=True -> the qkv-layout-native
    # Pallas kernel (beats XLA end-to-end, TPU_DESIGN.md "Attention");
    # UVLTRACK_BENCH_PALLAS=0 forces XLA, =1 forces Pallas
    force = os.environ.get("UVLTRACK_BENCH_PALLAS")
    if force is not None:
        cfg.TPU.USE_PALLAS_ATTENTION = force == "1"
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    trk = (Tracker(cfg, model, variables, tokenizer=None)
           if build_tracker else None)
    return cfg, model, variables, trk


def frame_pool(n=8, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    frames_np = [rng.integers(0, 255, size=(720, 1280, 3)).astype(np.uint8)
                 for _ in range(n)]
    pool = [jax.device_put(jnp.asarray(f)) for f in frames_np]
    fence(pool[-1])
    return frames_np, pool


def bench_single(tracker, pool, warmup, iters, repeats=3):
    """Deferred-readback tracked FPS + synchronous per-frame latency."""
    frame0 = np.asarray(pool[0])
    tracker.initialize(frame0, {"init_bbox": [600.0, 300.0, 120.0, 160.0]})
    for i in range(warmup):
        tracker.track(pool[i % len(pool)])
    lat = []
    for i in range(iters):
        t0 = time.perf_counter()
        tracker.track(pool[i % len(pool)])
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)

    tracker.track_many([pool[i % len(pool)] for i in range(32)])  # scan warmup
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = tracker.track_many([pool[i % len(pool)] for i in range(iters)])
        walls.append(time.perf_counter() - t0)
    assert out.shape == (iters, 5) and np.isfinite(out).all()
    fps = iters / min(walls)
    return fps, lat


def bench_upload_overlap(tracker, frames_np, iters):
    """Pipelined tracking INCLUDING per-frame H2D upload: device_put(frame
    i+1) is issued while the chained step for frame i computes (jax async
    dispatch double-buffers them). Returns (fps_upload_included,
    overlap_factor, upload_s_per_frame) where overlap_factor =
    (upload_only + compute_only) / pipelined — > 1 proves overlap (≈2 at
    perfect overlap of equal phases; ≈1 means serial)."""
    import jax
    import jax.numpy as jnp

    frames = [frames_np[i % len(frames_np)] for i in range(iters)]
    # upload-only wall
    t0 = time.perf_counter()
    devs = [jax.device_put(jnp.asarray(f)) for f in frames]
    fence(devs[-1])
    t_upload = time.perf_counter() - t0
    # compute-only wall (pre-uploaded, chained single-frame steps)
    for d in devs[:4]:
        packed = tracker.track_async(d)  # warm the single-step path
    fence(packed)
    t0 = time.perf_counter()
    for d in devs:
        packed = tracker.track_async(d)
    fence(packed)
    t_compute = time.perf_counter() - t0
    del devs
    # pipelined: upload + step per frame, reads deferred to the end
    t0 = time.perf_counter()
    for f in frames:
        packed = tracker.track_async(jax.device_put(jnp.asarray(f)))
    out = np.asarray(packed)
    t_pipe = time.perf_counter() - t0
    assert np.isfinite(out).all()
    return iters / t_pipe, (t_upload + t_compute) / t_pipe, t_upload / iters


def bench_multistream(config: str, streams: int, iters: int,
                      chunk: int = 16, want_cost: bool = False):
    """Lockstep multi-stream aggregate throughput (BASELINE.json config 5:
    8 parallel UVLTrack-L streams). Scan-chunked: step_many_async advances
    `chunk` lockstep steps per dispatch (per-step dispatch overhead was
    ~45% of the batch-2 step); one fence at the end."""
    import jax
    import jax.numpy as jnp

    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.models.uvltrack import build_model, init_model
    from uvltrack_tpu.track.batch import BatchTracker

    cfg = load_cfg(os.path.join(REPO, f"experiments/uvltrack/{config}.yaml"))
    cfg.TEST.MODE = "BBOX"
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
    # (chunk, S, H, W, 3) pre-uploaded frame block, lightly varied per step
    block = jax.device_put(jnp.stack(
        [base + np.uint8(i % 3) for i in range(chunk)]))
    fence(block)

    packs = bt.step_many_async(block)  # warmup/compile
    fence(packs)
    n_chunks = max(1, iters // chunk)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        packs = bt.step_many_async(block)
    out = np.asarray(packs)
    wall = time.perf_counter() - t0
    assert np.isfinite(out).all()
    agg = streams * n_chunks * chunk / wall
    # per-frame compiled cost of the EXACT chunk program just timed (for
    # the batched MFU line); computed before the HBM cleanup below
    flops_per_frame = None
    if want_cost:
        try:
            # the chunk program is a lax.scan over T=chunk; XLA cost
            # analysis counts the scan BODY once, independent of trip count
            # (verified: scan(length=1/4/8) of a matmul all report one
            # matmul's flops — tests/test_misc_helpers.py guards this), so
            # body flops / S is already per-frame. Dividing by T*S too
            # under-read s16 by 4x (12.26 vs the true ~49 GF/frame).
            cost = bt.step_many_cost(block)
            if cost["flops"]:
                # divide by the device stream count (S_pad; == streams
                # here, no mesh) — pad streams compute too
                flops_per_frame = cost["flops"] / cost["streams"]
        except Exception as e:
            log(f"multistream cost analysis failed: "
                f"{type(e).__name__}: {e}")
    # free this leg's HBM before the next (model copies, frame blocks, and
    # the leg's compiled programs in the global jit cache)
    import gc

    del packs, block, base, bt, variables, model
    gc.collect()
    jax.clear_caches()
    return (agg, flops_per_frame) if want_cost else agg


# ---------------------------------------------------------------- extras
# Each heavyweight extra (own model build) runs in a SUBPROCESS: the tunnel
# server reclaims a client's HBM only on disconnect — in-process gc +
# jax.clear_caches() measurably do NOT free device memory through it, and
# extras stack up to RESOURCE_EXHAUSTED. A fresh client per extra is the
# only reliable isolation (verified: s8 sweep OOMs in-process after the L
# legs, runs at full speed in a fresh process immediately after).


def extra_nlbbox(config: str, iters: int) -> dict:
    """Tri-modal path (flag 2: text branch live in every frame's joint
    attention) — BASELINE.json config 3's speed aspect."""
    import tempfile

    from uvltrack_tpu.core.tokenizer import BertTokenizer
    from uvltrack_tpu.track.tracker import Tracker

    _, pool = frame_pool()
    cfg2, model2, variables2, _ = make_tracker(config, build_tracker=False)
    cfg2.TEST.MODE = "NLBBOX"
    # real (tiny) vocab so the text tokens are actually unmasked in the
    # joint attention — tokenizer=None would zero-fill ids AND mask,
    # making "text branch live" true only in shape, not in dataflow
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as vf:
        vf.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]",
                            "the", "moving", "object"]) + "\n")
    try:
        tok = BertTokenizer(vf.name)
    finally:
        os.unlink(vf.name)
    trk = Tracker(cfg2, model2, variables2, tokenizer=tok)
    trk.initialize(np.asarray(pool[0]),
                   {"init_bbox": [600.0, 300.0, 120.0, 160.0],
                    "language": "the moving object"})
    trk.track_many([pool[i % len(pool)] for i in range(32)])
    # best-of-3 like bench_single: the first post-warmup dispatch chain
    # through the tunnel is reliably 3-4x slower than steady state
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = trk.track_many([pool[i % len(pool)] for i in range(iters)])
        walls.append(time.perf_counter() - t0)
    assert np.isfinite(out).all()
    return {"tracked_fps_nlbbox_mode_b": round(iters / min(walls), 2)}


def extra_quant_int8(config: str, iters: int, warmup: int) -> dict:
    """Weight-only int8 primary (cfg.TPU.WEIGHT_QUANT — ops/quant.py): the
    bs=1 step is weight-read bound, so the int8 stream is the largest
    single-chip lever; this extra records its deferred FPS next to the fp
    primary every round."""
    os.environ["UVLTRACK_BENCH_QUANT"] = "int8"
    _, pool = frame_pool()
    cfg, model, variables, trk = make_tracker(config)
    fps, lat = bench_single(trk, pool, warmup, iters, repeats=2)
    return {"tracked_fps_quant_int8_b": round(fps, 2),
            "quant_int8_sync_p50_ms": round(
                float(np.percentile(lat, 50)) * 1e3, 3)}


def extra_large(config: str, iters: int, warmup: int) -> dict:
    # full-length chains, same as the primary: short (64-frame) track_many
    # chains leave the ~25ms tunnel fence unamortized and under-read L by
    # ~25% (measured 368-411 at 64 iters vs 460+ at 192 — the r4 L-prefix
    # A/B legs, which run the primary recipe at baseline_large)
    import jax

    _, pool = frame_pool()
    _, _, _, trk_l = make_tracker("baseline_large")
    fps_l, _ = bench_single(trk_l, pool, max(8, warmup // 2), iters)
    out = {"tracked_fps_per_chip_uvltrack_l": round(fps_l, 2),
           "uvltrack_l_vs_baseline": round(fps_l / BASELINE_FPS_L, 3)}
    try:
        gf = trk_l.step_cost((720, 1280, 3))["flops"] / 1e9
        if gf:  # see run_primary: no-'flops' cost_analysis reads as 0.0
            out["step_gflops_l"] = round(gf, 2)
            if jax.devices()[0].platform == "tpu":
                out["mfu_l"] = mfu_of(gf * 1e9, fps_l)
        else:
            log("L cost analysis returned no flops; omitting MFU")
    except Exception as e:
        log(f"L cost analysis failed: {type(e).__name__}: {e}")
    return out


def extra_multistream_l(config: str, iters: int) -> dict:
    agg = bench_multistream("baseline_large", streams=8, iters=64, chunk=8)
    return {"multistream8_l_aggregate_fps": round(agg, 2)}


def extra_b_sweep(config: str, iters: int) -> dict:
    """Service-mode throughput curve: aggregate FPS vs stream count (how
    MXU utilisation climbs with batch). Measured ceiling (round 4, chip):
    s24=1196 (plateau), s32 OOMs — the bench stops at the s16 knee."""
    import jax

    curve = {}
    out = {"multistream_b_sweep_fps": curve}
    for s in (2, 4, 8, 16):
        try:
            # s=16 with a 16-deep frame block deterministically kills the
            # tunnel's remote-compile helper; shallower chunks fit.
            # 128 iters: at 64 the single end fence (~25ms tunnel RTT) is
            # ~5% of the run and under-reads the point (s16 read 1241 at
            # 64 iters vs 1263-1271 across five 128-iter legs, the r4
            # cond-remine A/B) — same under-read extra_large had
            r = bench_multistream(
                config, streams=s, iters=128, chunk=4 if s >= 16 else 16,
                want_cost=(s == 16))
            fps_s, flops_f = r if s == 16 else (r, None)
            curve[f"s{s}"] = round(fps_s, 2)
            if s == 16 and flops_f:
                out["step_gflops_b_s16"] = round(flops_f / 1e9, 2)
                if jax.devices()[0].platform == "tpu":
                    out["mfu_b_s16"] = mfu_of(flops_f, fps_s)
            # cumulative print per leg: if the parent's budget timeout kills
            # this subprocess mid-sweep, the legs already measured survive
            # in the partial stdout (run_extra_subprocess parses it)
            print(json.dumps(out), flush=True)
        except Exception as e:  # keep earlier points if one leg dies
            log(f"B-sweep s={s} failed: {type(e).__name__}: {e}")
            break
    return out


def extra_train_step(config: str, iters: int) -> dict:
    """Steady-state training throughput on one chip: the full jitted train
    step (fwd, all 4 losses, bwd, grouped AdamW with the 0.1x backbone LR)
    on synthetic batches at the experiment's TRAIN.BATCH_SIZE, built by the
    SAME setup recipe cli/train runs (train/step.py::setup_sharded_training
    + data/synthetic.py::synthetic_batch_from_cfg) so the benched step can't
    drift from the shipped one. The reference publishes no training-speed
    number (its counterpart is the DDP loop in
    lib/train/trainers/ltr_trainer.py); this records ours in the round
    artifact instead of only as a README claim. Samples = batch
    x DATA.SEARCH.NUMBER search frames, matching the loader's accounting."""
    import jax
    import jax.numpy as jnp

    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.data.synthetic import synthetic_batch_from_cfg
    from uvltrack_tpu.parallel.mesh import make_mesh, shard_batch
    from uvltrack_tpu.train.step import setup_sharded_training

    cfg = load_cfg(os.path.join(REPO, f"experiments/uvltrack/{config}.yaml"))
    default_compile_cache(cfg)
    b = int(cfg.TRAIN.BATCH_SIZE)
    n_search = int(cfg.DATA.SEARCH.NUMBER)
    mesh = make_mesh(data=1, model=1)  # the shipped single-chip layout
    _, state, step = setup_sharded_training(
        cfg, mesh, steps_per_epoch=100, rng_key=jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch_from_cfg(rng, cfg, b)))
    for _ in range(3):  # compile + warm
        state, metrics = step(state, batch)
    fence(metrics["Loss/total"])
    # a train step is ~25x a tracking frame, so scale the shared per-frame
    # iters knob down instead of ignoring it (default 192 -> 12 steps;
    # halved in round 5 so the extra lands inside its subprocess cap —
    # VERDICT r4 #4: this number had never reached a driver artifact)
    timed = max(4, iters // 16)
    t0 = time.perf_counter()
    for _ in range(timed):
        state, metrics = step(state, batch)
    loss = float(np.asarray(metrics["Loss/total"]))
    wall = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    return {"train_samples_per_s_b": round(timed * b * n_search / wall, 2),
            "train_step_ms_b": round(wall / timed * 1e3, 2)}


def run_primary(config: str, iters: int, warmup: int) -> dict:
    """Primary deferred/sync metric + the upload-overlap extra (which reuses
    the primary tracker). Runs in its own subprocess like every other
    measurement so the orchestrator never holds a tunnel client."""
    import jax

    from uvltrack_tpu.ops import attention

    frames_np, pool = frame_pool()
    cfg, model, variables, tracker = make_tracker(config)
    try:
        fps_b, lat = bench_single(tracker, pool, warmup, iters)
    except Exception as e:  # pallas kernel may be unsupported on this runtime
        if attention.get_backend() == "pallas":
            log(f"pallas path failed ({e}); falling back to XLA attention")
            # pin, not set: a later build_model -> configure_attention
            # would re-enable the broken path
            attention.force_backend("xla")
            # drop EVERY pallas-traced program, not just the per-frame step:
            # the failure can first surface in the scan-chunk compile
            # (track_many) or the cached-text encode, and a stale entry
            # would refail the retry
            tracker.jt._step_cache.clear()
            tracker.jt._init_cache.clear()
            tracker.jt._scan_cache.clear()
            tracker.jt._ground_cache.clear()
            tracker.jt._text_fn = None
            fps_b, lat = bench_single(tracker, pool, warmup, iters)
        else:
            raise
    platform = jax.devices()[0].platform
    out = {
        "fps_primary": round(fps_b, 2),
        "platform": platform,
        "attn": attention.get_backend(),
        "sync_fps": round(1.0 / lat.mean(), 2),
        "sync_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 3),
        "sync_p90_ms": round(float(np.percentile(lat, 90)) * 1e3, 3),
    }
    # MFU of the timed program: XLA compiled-cost FLOPs/frame x measured
    # FPS / bf16 peak (only meaningful against the TPU peak constant)
    try:
        gf = tracker.step_cost((720, 1280, 3))["flops"] / 1e9
        # a cost_analysis without a 'flops' key reads back 0.0 — omit the
        # lines rather than publish a real-looking mfu=0.0 in the artifact
        if gf:
            suffix = "b" if config == "baseline_base" else "l"
            out[f"step_gflops_{suffix}"] = round(gf, 2)
            if platform == "tpu":
                out[f"mfu_{suffix}"] = mfu_of(gf * 1e9, fps_b)
        else:
            log("step cost analysis returned no flops; omitting MFU")
    except Exception as e:
        log(f"step cost analysis failed: {type(e).__name__}: {e}")
    log(f"[{elapsed():.0f}s] {config} deferred fps={fps_b:.1f} "
        f"sync p50={out['sync_p50_ms']}ms")
    if config == "baseline_base" and os.environ.get(
            "UVLTRACK_BENCH_EXTRAS", "1") == "1":
        try:
            fps_up, overlap, up_ms = bench_upload_overlap(
                tracker, frames_np, iters)
            out["fps_upload_included"] = round(fps_up, 2)
            out["upload_overlap_factor"] = round(overlap, 2)
            out["upload_ms_per_frame"] = round(up_ms * 1e3, 2)
            log(f"[{elapsed():.0f}s] upload-included fps={fps_up:.1f} "
                f"overlap x{overlap:.2f} (upload {up_ms * 1e3:.1f}ms/frame; "
                "~1ms PCIe on a TPU VM, network-tunneled here)")
        except Exception as e:
            log(f"upload extra failed: {type(e).__name__}: {e}")
    return out


SUBPROCESS_EXTRAS = {
    "primary": lambda cfg, it, wu: run_primary(cfg, it, wu),
    "multistream_b_sweep": lambda cfg, it, wu: extra_b_sweep(cfg, it),
    "nlbbox_mode": lambda cfg, it, wu: extra_nlbbox(cfg, it),
    "quant_int8": lambda cfg, it, wu: extra_quant_int8(cfg, it, wu),
    "uvltrack_l": lambda cfg, it, wu: extra_large(cfg, it, wu),
    "multistream8_l": lambda cfg, it, wu: extra_multistream_l(cfg, it),
    "train_step": lambda cfg, it, wu: extra_train_step(cfg, it),
}


class ExtraTimeoutError(RuntimeError):
    """The extra's subprocess hit its timeout without printing any JSON.
    A distinct type so run_extras_phase's compile-vs-blip escalation keys
    on what actually happened, not on substring-matching the message (a
    child that CRASHES with 'socket.timeout' in its stderr tail must not
    trigger the 3x-cap escalation)."""


def run_extra_subprocess(name: str, config: str, timeout_s: float) -> dict:
    """Run one extra as `python bench.py --extra NAME` and parse the last
    JSON line of its stdout."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--extra", name, "--config", config],
            capture_output=True, text=True, timeout=timeout_s)
        stdout, rc, err = proc.stdout, proc.returncode, proc.stderr
    except subprocess.TimeoutExpired as e:
        # the child is killed, but TimeoutExpired carries the output
        # captured so far — extras that print cumulative lines per leg
        # (extra_b_sweep) still surface what they measured before the cut,
        # and the partial stderr says where the child was stuck
        def _dec(x):
            return x.decode(errors="replace") if isinstance(x, bytes) else (x or "")
        stdout, rc, err = _dec(e.stdout), "timeout", _dec(e.stderr)
        # a recovered partial must not read as a completed extra in the
        # round artifact: tag it and say where the child was cut
        tail = err.strip().splitlines()[-1] if err.strip() else ""
        log(f"extra '{name}' hit its {timeout_s:.0f}s timeout; recovering "
            f"partial stdout (last stderr: {tail})")
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn/non-JSON '{' line; keep scanning upward
            if rc == "timeout":
                result[f"{name}_timeout"] = True
            elif rc != 0:
                # a child that printed cumulative per-leg JSON then crashed
                # (nonzero rc) returned a PARTIAL curve — tag it so a
                # truncated sweep can't read as complete in the artifact
                result[f"{name}_partial_rc"] = rc
            return result
    exc = ExtraTimeoutError if rc == "timeout" else RuntimeError
    raise exc(
        f"no JSON from extra subprocess (rc={rc}): "
        f"{err.strip().splitlines()[-1] if err.strip() else ''}")


def probe_tunnel(timeout_s: float = 75.0) -> bool:
    """Cheap device liveness check in a throwaway subprocess (~10-15s when
    the tunnel answers; the round-4 blip mode is a child hung INSIDE axon
    init, which this detects as a probe timeout instead of burning an
    extra's whole cap on it)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# per-extra subprocess timeout caps: ONE hung child may burn at most its
# cap, never the whole extras budget (round 4 failure mode). Warm-cache
# durations are ~60-120s each, sweep ~490s (round-4 chip log); train_step
# gets headroom for its grad compile.
EXTRA_CAP_S = {"multistream_b_sweep": 600.0, "train_step": 450.0}
DEFAULT_EXTRA_CAP_S = float(os.environ.get(
    "UVLTRACK_BENCH_EXTRA_CAP_S", "330"))

# train_step runs EARLY (3rd): it is cheap warm (~120s) and is the number
# that r3/r4 driver artifacts never managed to record — a mid-run tunnel
# blip (observed 10 min, round-5 bench4) must not starve it behind the
# blip-prone middle. The sweep stays last (largest, and its per-leg
# cumulative prints survive a budget cut).
EXTRA_ORDER = ("nlbbox_mode", "uvltrack_l", "train_step", "quant_int8",
               "multistream8_l", "multistream_b_sweep")


def run_extras_phase(config: str, extra: dict, budget: float,
                     on_result=None, runner=run_extra_subprocess,
                     prober=probe_tunnel, sleep=time.sleep,
                     clock=time.perf_counter, order=EXTRA_ORDER):
    """Run every extra under the shared budget, each capped and retried
    once. After a failed attempt the tunnel is health-probed in a loop
    (45s sleeps) and the retry fires the moment it answers — a 20-min
    tunnel blip costs the blip, not the budget.

    Timeout escalation: when an attempt TIMES OUT but the tunnel probes
    healthy, the cause is a long compile (a cold persistent cache pays
    5-10 min for L/int8 through the tunnel — DEVNOTES), not a blip, and
    re-running with the same cap would just time out again without ever
    seeding the cache; the retry gets up to 3x the cap, BUT never more
    than the remaining budget minus a 60s-per-pending-extra reserve — a
    truly hung child can still only delay the extras behind it, never
    starve them. Measured in this exact shape on the round-5
    cold-workspace run: uvltrack_l died at 330s twice while the tunnel
    answered probes in seconds.

    Injectable runner/prober/sleep/clock so the recovery logic is
    unit-testable without a device."""
    t0 = clock()

    def remaining():
        return budget - (clock() - t0)

    # cold-compile escalation is a HYPOTHESIS: a healthy-probe timeout is
    # assumed to be a long compile worth 3x the cap. If an escalated retry
    # ALSO times out, the hypothesis is falsified for the whole phase — a
    # real compile would have finished in 3x, so this is the mid-run
    # tunnel degradation (DEVNOTES: probe answers, ops stall) and further
    # escalation would just burn the pending extras' budget (round-5
    # bench5: a 795s escalated retry hung exactly like the 330s attempt).
    escalation_spent = False

    for i, name in enumerate(order):
        cap = EXTRA_CAP_S.get(name, DEFAULT_EXTRA_CAP_S)
        base_cap = cap
        for attempt in (1, 2):
            rem = remaining()
            if rem <= 60:
                log(f"[{elapsed():.0f}s] extras budget exhausted; "
                    f"skipping {name}")
                break
            try:
                result = runner(name, config, timeout_s=min(cap, rem))
                extra.update(result)
                log(f"[{elapsed():.0f}s] {name}: " + " ".join(
                    f"{k}={v}" for k, v in result.items()))
                if on_result is not None:
                    on_result(extra)
                if cap > base_cap:
                    # an escalated retry actually finished: the cold-cache
                    # hypothesis held — re-arm escalation for later extras
                    # (their caches may be cold too)
                    escalation_spent = False
                break
            except Exception as e:
                timed_out = isinstance(e, ExtraTimeoutError)
                log(f"extra '{name}' attempt {attempt} failed: "
                    f"{type(e).__name__}: {e}")
                if attempt == 2:
                    break
                # before the retry: if the tunnel is in its blip mode,
                # probing (not a hung child) is what the budget buys —
                # resume as soon as it answers, skip out when it doesn't
                healthy = prober()
                while remaining() > 120 and not healthy:
                    log(f"[{elapsed():.0f}s] tunnel probe failed; "
                        f"re-probing in 45s ({remaining():.0f}s budget left)")
                    sleep(45)
                    healthy = prober()
                # bound the RETRY (escalated or not) by the remaining
                # budget minus a 60s-per-pending-extra reserve, so a
                # genuinely hung child can't starve the queue behind it;
                # a healthy-tunnel timeout means a cold compile, which a
                # same-cap rerun would refail, so it earns up to 3x cap
                reserve = 60.0 * (len(order) - i - 1)
                ceiling = remaining() - reserve
                escalate = timed_out and healthy and not escalation_spent
                if escalate:
                    escalation_spent = True  # one shot until one pays off
                cap = min(cap * 3 if escalate else cap, ceiling)
                if cap < 60:
                    log(f"[{elapsed():.0f}s] skipping retry of {name}: "
                        f"{remaining():.0f}s left minus {reserve:.0f}s "
                        "reserve leaves no useful window")
                    break
    return extra


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--extra", default=None,
                   help="run ONE extra standalone and print its JSON dict "
                        "(used by the parent bench via subprocess)")
    p.add_argument("--config", default=None)
    args = p.parse_args(argv)

    # 1800s: a 1200s budget minus ONE observed ~10-min tunnel degradation
    # (round-5 bench4: quant_int8 hung 330s+211s across both attempts)
    # leaves nothing for the extras behind it; 1800 absorbs a blip and
    # still bounds the whole bench under ~55 min worst-case
    budget = float(os.environ.get("UVLTRACK_BENCH_BUDGET_S", "1800"))
    warmup = int(os.environ.get("UVLTRACK_BENCH_WARMUP", "20"))
    iters = int(os.environ.get("UVLTRACK_BENCH_ITERS", "192"))  # 6 x chunk=32
    config = args.config or os.environ.get("UVLTRACK_BENCH_CONFIG",
                                           "baseline_base")

    if args.extra is not None:
        result = SUBPROCESS_EXTRAS[args.extra](config, iters, warmup)
        print(json.dumps(result), flush=True)
        return

    # ------------------------------------------------------- orchestrator
    # This path NEVER initializes jax: the tunnel serves exactly one client
    # at a time, a parent holding an idle connection visibly depresses a
    # child's numbers (measured NLBBOX 385 vs 950 FPS), and the server only
    # reclaims a client's HBM on disconnect — so every measurement runs in
    # its own subprocess.
    #
    # The tunnel can blip (observed: axon init backs off ~25 min, then
    # raises Unavailable). One bounded retry rescues the round's bench from
    # a transient outage without doubling a genuinely-down wait forever.
    retries = int(os.environ.get("UVLTRACK_BENCH_PRIMARY_RETRIES", "1"))
    for attempt in range(retries + 1):
        try:
            primary = run_extra_subprocess("primary", config,
                                           timeout_s=2400.0)
            break
        except Exception as e:
            log(f"primary attempt {attempt + 1}/{retries + 1} failed: "
                f"{type(e).__name__}: {e}")
            if attempt == retries:
                raise
            time.sleep(60.0)
    fps_b = primary.pop("fps_primary")
    platform = primary.pop("platform", "?")
    attn = primary.pop("attn", "?")
    extra = dict(primary)

    suffix = "b" if config == "baseline_base" else "l"
    baseline = BASELINE_FPS_B if suffix == "b" else BASELINE_FPS_L
    metric = {
        "metric": f"tracked_fps_per_chip_uvltrack_{suffix}",
        "value": round(fps_b, 2), "unit": "fps",
        "vs_baseline": round(fps_b / baseline, 3),
    }
    # insurance for outer-timeout kills: the headline metric is already
    # valid — emit it now so the last JSON line on stdout is always
    # parseable; the complete line (with extras) replaces it at the end
    print(json.dumps({**metric, "extra": dict(extra)}), flush=True)

    # budget counts from here: a cold tracker compile through the tunnel
    # costs up to ~13 min by itself and must not starve the extras
    if config == "baseline_base" and os.environ.get(
            "UVLTRACK_BENCH_EXTRAS", "1") == "1":
        # re-print the full headline after EVERY extra: the driver parses
        # the LAST JSON line on stdout, so an outer timeout mid-extras
        # loses at most the extra in flight, never one already measured
        run_extras_phase(
            config, extra, budget,
            on_result=lambda ex: print(
                json.dumps({**metric, "extra": dict(ex)}), flush=True))

    log(f"platform={platform} attn={attn} total {elapsed():.0f}s")
    print(json.dumps({**metric, "extra": extra}))


if __name__ == "__main__":
    main()
