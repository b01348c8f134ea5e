"""Latency/FPS profiler CLI (parity: tracking/profile_model.py:30-47).

Two measurements:
  --what forward : model forward_test only (comparable to the reference's
                   500-warmup/1000-iter profile that produced the 60/34 FPS
                   README numbers)
  --what step    : full tracking step incl. fused preprocessing and decode
                   (the real tracked FPS; what bench.py reports)

Optionally dumps an XLA profiler trace with --trace_dir.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--script", default="uvltrack")
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--what", choices=["forward", "step"], default="forward")
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--pallas", action="store_true",
                   help="force the Pallas attention kernel (cfg default on TPU)")
    p.add_argument("--quant", default=None, choices=("int8",),
                   help="weight-only int8 on the ViT matmul kernels "
                        "(cfg.TPU.WEIGHT_QUANT): cost_analysis then shows "
                        "the halved weight-byte traffic")
    p.add_argument("--xla", action="store_true",
                   help="force the XLA einsum attention backend")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import load_cfg
    from ..eval.environment import env_settings, experiment_cfg_path
    from ..models.uvltrack import UVLTrack, build_model, init_model
    settings = env_settings()
    cfg = load_cfg(experiment_cfg_path(settings, args.script, args.config))
    # Pallas is the cfg default on TPU; --xla forces the einsum backend
    if args.pallas:
        cfg.TPU.USE_PALLAS_ATTENTION = True
    if args.xla:
        cfg.TPU.USE_PALLAS_ATTENTION = False
    if args.quant:
        cfg.TPU.WEIGHT_QUANT = args.quant
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    if args.quant and args.what == "forward":
        # the tracker path quantizes in prepare_inference_variables; the
        # raw-forward path does it here so cost_analysis sees int8 operands
        from ..models.uvltrack import prepare_inference_variables

        variables = prepare_inference_variables(cfg, variables)

    if args.what == "forward":
        tz, sx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
        nt = cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN
        c = model.backbone.embed_dim
        rng = np.random.default_rng(0)
        b = args.batch
        inputs = (
            jnp.asarray(rng.normal(size=(b, tz, tz, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(b, sx, sx, 3)), jnp.float32),
            jnp.asarray(rng.integers(0, 30000, size=(b, nt)), jnp.int32),
            jnp.ones((b, nt), jnp.int32),
            jnp.asarray(rng.normal(size=(b, 3, c)), jnp.float32),
            jnp.full((b,), 2, jnp.int32),
        )
        fn = jax.jit(lambda v, *a: model.apply(v, *a,
                                               method=UVLTrack.forward_test)["bbox_map"])

        try:  # FLOPs from the compiled executable (parity: thop in the ref)
            cost = fn.lower(variables, *inputs).compile().cost_analysis()
            if cost and "flops" in cost:
                print(f"compiled cost: {cost['flops']/1e9:.2f} GFLOPs, "
                      f"{cost.get('bytes accessed', 0)/1e6:.0f} MB accessed")
        except Exception:
            pass

        def once():
            return fn(variables, *inputs)
    else:
        from ..track.tracker import Tracker

        cfg.TEST.MODE = "BBOX"
        tracker = Tracker(cfg, model, variables, tokenizer=None)
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, size=(720, 1280, 3)).astype(np.uint8)
        tracker.initialize(frame, {"init_bbox": [600.0, 300.0, 120.0, 160.0]})

        def once():
            return tracker.track(frame)

    out = None
    for _ in range(args.warmup):
        out = once()
    if out is not None and not isinstance(out, dict):
        jax.block_until_ready(out)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = once()
        if not isinstance(out, dict):
            jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")

    lat = np.asarray(lat)
    print(f"{args.what} (batch={args.batch}): mean={lat.mean()*1e3:.2f}ms "
          f"p50={np.percentile(lat,50)*1e3:.2f}ms p90={np.percentile(lat,90)*1e3:.2f}ms "
          f"fps={args.batch/lat.mean():.1f}")


if __name__ == "__main__":
    main()
