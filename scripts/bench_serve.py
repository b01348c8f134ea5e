"""Serving-throughput bench: the HTTP surface end to end, both modes.

Measures what a deployment actually sees — aggregate tracked FPS through
cli/serve.py's full stack (HTTP + JSON + base64 + dispatch), not just the
device step. S client threads each run an independent stream over loopback:

  leg A: per-stream mode (each /track = one batch-1 dispatch)
  leg B: --lockstep S  (concurrent /track coalesce into one batch-S dispatch)

Run on the real TPU (UVLTrack-B, random weights — speed only):
  python scripts/bench_serve.py --streams 8 --frames 192
CPU smoke with the tiny test model (correctness of the harness, not speed):
  python scripts/bench_serve.py --tiny --streams 2 --frames 8

Prints one JSON line: per-mode aggregate FPS and the lockstep/per-stream
ratio. The device-only ceiling for comparison is bench.py's
multistream_b_sweep extra (939/1084/1192/1246 FPS at 2/4/8/16 streams).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
sys.path.insert(0, REPO)


def _post(url: str, route: str, payload: dict, timeout: float = 1200.0):
    req = urllib.request.Request(
        url + route, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _build_proto(tiny: bool, config: str):
    if tiny:
        sys.path.insert(0, REPO + "/tests")
        import jax

        # force CPU BEFORE any backend use: the axon plugin ignores
        # JAX_PLATFORMS once registered (DEVNOTES.md), and the tiny smoke
        # must not touch (or wait for) the tunnel
        jax.config.update("jax_platforms", "cpu")

        from test_model import tiny_model, tiny_inputs
        from test_tracker import tiny_cfg
        from uvltrack_tpu.track.tracker import Tracker

        model = tiny_model()
        variables = jax.jit(lambda r: model.init(r, *tiny_inputs(),
                                                 train=False))(
            jax.random.PRNGKey(0))
        return tiny_cfg(), Tracker(tiny_cfg(), model, variables)
    from uvltrack_tpu.cli.test import build_tracker
    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.eval.environment import env_settings, experiment_cfg_path

    cfg = load_cfg(experiment_cfg_path(env_settings(), "uvltrack", config))
    import os

    if os.environ.get("UVLTRACK_BENCH_QUANT"):  # int8 serving leg
        cfg.TPU.WEIGHT_QUANT = os.environ["UVLTRACK_BENCH_QUANT"]
    return cfg, build_tracker(cfg, None)


def _run_leg(proto, streams: int, frames: int, lockstep: bool,
             frame_hw, mesh=None) -> float:
    """Returns aggregate tracked FPS across all client threads (warmup — the
    first 25% of frames, min 2 — excluded via a mid-run barrier restart)."""
    from uvltrack_tpu.cli.serve import make_server

    server = make_server(proto, port=0,
                         lockstep=streams if lockstep else 0,
                         batch_window=0.25, mesh=mesh)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=frame_hw + (3,)).astype(np.uint8)
    buf = io.BytesIO()
    np.save(buf, frame)
    payload_img = base64.b64encode(buf.getvalue()).decode()

    warmup = max(frames // 4, 2)
    start_barrier = threading.Barrier(streams + 1)
    timed_barrier = threading.Barrier(streams + 1)
    errors = []

    def client(i: int):
        sid = f"s{i}"
        try:
            _post(url, "/initialize",
                  {"stream": sid, "image": payload_img, "format": "npy",
                   "bbox": [600.0, 300.0, 120.0, 160.0]})
            start_barrier.wait()
            for _ in range(warmup):
                _post(url, "/track", {"stream": sid, "image": payload_img,
                                      "format": "npy"})
            timed_barrier.wait()
            for _ in range(frames):
                _post(url, "/track", {"stream": sid, "image": payload_img,
                                      "format": "npy"})
        except Exception as e:
            errors.append((sid, repr(e)))
            # unblock the barriers so the leg fails fast instead of hanging
            start_barrier.abort()
            timed_barrier.abort()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(streams)]
    for t in threads:
        t.start()
    start_barrier.wait()
    timed_barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if server.dispatcher is not None:
        server.dispatcher.stop()
    server.shutdown()
    server.server_close()
    if errors:
        raise RuntimeError(f"leg failed: {errors}")
    return streams * frames / wall


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--frames", type=int, default=192,
                   help="timed frames per stream (plus 25% warmup)")
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test model on CPU: harness smoke, not speed")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the lockstep leg's stream slots over an "
                        "N-device jax mesh (cli/serve --multichip path); "
                        "with --tiny, forces N virtual CPU devices — the "
                        "multichip serving dryrun artifact")
    args = p.parse_args(argv)

    if args.mesh and args.tiny:
        # must happen before any jax import initializes the backend
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()

    proto = None
    cfg, proto = _build_proto(args.tiny, args.config)
    hw = (80, 100) if args.tiny else (720, 1280)
    mesh = None
    if args.mesh:
        from uvltrack_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh, model=1)

    fps_per_stream = _run_leg(proto, args.streams, args.frames,
                              lockstep=False, frame_hw=hw)
    print(f"per-stream mode: {fps_per_stream:.1f} aggregate FPS",
          file=sys.stderr)
    fps_lockstep = _run_leg(proto, args.streams, args.frames,
                            lockstep=True, frame_hw=hw, mesh=mesh)
    print(f"lockstep mode:   {fps_lockstep:.1f} aggregate FPS"
          + (f" (slots sharded over {args.mesh}-device mesh)"
             if mesh is not None else ""),
          file=sys.stderr)
    print(json.dumps({
        "streams": args.streams, "frames_per_stream": args.frames,
        "fps_http_per_stream_mode": round(fps_per_stream, 2),
        "fps_http_lockstep_mode": round(fps_lockstep, 2),
        "lockstep_over_per_stream": round(fps_lockstep / fps_per_stream, 3),
        "tiny": bool(args.tiny), "mesh": args.mesh,
    }))


if __name__ == "__main__":
    main()
