"""Batch-scaling probe for the compiled forward (real TPU).

Question: how much of the s16 lockstep step (~12.9 ms, b_sweep plateau
1241 agg FPS) is the model forward, and does the forward itself amortize
weights with batch (roofline: bs=1 sits at ~1.8x the 0.42 ms weight-read
floor; perfect amortization at B=16 would approach 16x the 0.34 ms
compute floor ~= 5.5 ms)?

Methodology as in scripts/bench_attention.py: the whole timing chain runs
inside ONE jit via fori_loop with a data dependency (the head output
perturbs the next search image), fenced by a real readback — through the
sandbox tunnel block_until_ready returns early (DEVNOTES), so per-call
timing is garbage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uvltrack_tpu.config import load_cfg
from uvltrack_tpu.models.uvltrack import (UVLTrack, build_model,
                                          configure_compile_cache, init_model,
                                          prepare_inference_variables)

BATCHES = (1, 4, 8, 16)
CHAIN = 100
REPS = 3


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = os.environ.get("UVLTRACK_BENCH_CONFIG", "baseline_base")
    cfg = load_cfg(os.path.join(repo, f"experiments/uvltrack/{config}.yaml"))
    if not cfg.TPU.COMPILE_CACHE:
        cfg.TPU.COMPILE_CACHE = os.path.join(repo, "output", "xla_cache")
    configure_compile_cache(cfg)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    variables = prepare_inference_variables(cfg, variables)

    tz, sx = int(cfg.DATA.TEMPLATE.SIZE), int(cfg.DATA.SEARCH.SIZE)
    nt = int(cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN)
    c = model.backbone.embed_dim
    rng = np.random.default_rng(0)
    out = {}
    for b in BATCHES:
        template = jnp.asarray(rng.normal(size=(b, tz, tz, 3)), jnp.float32)
        search = jnp.asarray(rng.normal(size=(b, sx, sx, 3)), jnp.float32)
        tid = jnp.asarray(rng.integers(0, 30000, size=(b, nt)), jnp.int32)
        tmask = jnp.ones((b, nt), jnp.int32)
        prompt = jnp.asarray(rng.normal(size=(b, 3, c)), jnp.float32)
        flag = jnp.full((b,), 2, jnp.int32)

        @jax.jit
        def chained(v, s):
            def body(_, cur):
                o = model.apply(v, template, cur, tid, tmask, prompt, flag,
                                method=UVLTrack.forward_test)
                # data dependency: next search depends on this output
                return cur + 1e-9 * jnp.mean(o["bbox_map"])

            return jax.lax.fori_loop(0, CHAIN, body, s)

        r = chained(variables, search)
        np.asarray(r[0, 0, 0])  # fence (compile + warm)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            r = chained(variables, search)
            np.asarray(r[0, 0, 0])
            times.append((time.perf_counter() - t0) / CHAIN * 1e3)
        med = sorted(times)[len(times) // 2]
        out[f"b{b}"] = {"ms_per_forward": round(med, 3),
                        "ms_per_frame": round(med / b, 4),
                        "reps_ms": [round(t, 3) for t in times]}
        print(f"B={b}: {med:.3f} ms/forward = {med / b:.4f} ms/frame "
              f"(reps {['%.3f' % t for t in times]})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
