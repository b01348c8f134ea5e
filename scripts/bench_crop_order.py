"""A/B: separable crop_resize gather order on real TPU (720p landscape).

rows-first (the SHIPPED order — pipeline.py crop_resize measured and
kept it) materializes a (256, 1280, 3) f32 intermediate; cols-first (the
rejected longer-axis-first candidate this script A/Bs) materializes
(720, 256, 3) — 1.8x less intermediate traffic on paper, slower on chip. Measures both orders with the fenced-chain
methodology (DEVNOTES: block_until_ready returns early through the
tunnel; per-dispatch overhead ~25 ms, so chain crops inside one jit with
a data dependency and fence with a real readback).

Single-crop chain (the bs=1 tracker path) and a vmap-16 chain (the s16
lockstep path) for each order.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uvltrack_tpu.track.pipeline import _axis_taps

CHAIN = 500
REPS = 5
OUT = 256
H, W = 720, 1280


def crop_rows_first(frame, x1, y1, crop_sz):
    ry0, ry1, wy0, wy1 = _axis_taps(OUT, crop_sz, y1, H)
    rx0, rx1, wx0, wx1 = _axis_taps(OUT, crop_sz, x1, W)
    rows = (frame[ry0].astype(jnp.float32) * wy0[:, None, None]
            + frame[ry1].astype(jnp.float32) * wy1[:, None, None])
    return rows[:, rx0] * wx0[None, :, None] + rows[:, rx1] * wx1[None, :, None]


def crop_cols_first(frame, x1, y1, crop_sz):
    ry0, ry1, wy0, wy1 = _axis_taps(OUT, crop_sz, y1, H)
    rx0, rx1, wx0, wx1 = _axis_taps(OUT, crop_sz, x1, W)
    cols = (frame[:, rx0].astype(jnp.float32) * wx0[None, :, None]
            + frame[:, rx1].astype(jnp.float32) * wx1[None, :, None])
    return cols[ry0] * wy0[:, None, None] + cols[ry1] * wy1[:, None, None]


def timed(fn):
    fn()  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) / CHAIN * 1e6)
    return sorted(times)[len(times) // 2], times


def main():
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, size=(H, W, 3)), jnp.uint8)
    frames16 = jnp.asarray(rng.integers(0, 255, size=(16, H, W, 3)), jnp.uint8)
    crop_sz = jnp.int32(300)

    out = {}
    for name, crop in (("rows_first", crop_rows_first),
                       ("cols_first", crop_cols_first)):

        @jax.jit
        def single(f, x0, _crop=crop):
            def body(_, x):
                patch = _crop(f, x.astype(jnp.int32), jnp.int32(100), crop_sz)
                return x + 1e-6 * jnp.mean(patch)  # data dependency

            return jax.lax.fori_loop(0, CHAIN, body, x0)

        @jax.jit
        def batch16(fs, x0, _crop=crop):
            def body(_, x):
                xs = x.astype(jnp.int32) + jnp.arange(16) * 3
                patches = jax.vmap(
                    lambda f, xi: _crop(f, xi, jnp.int32(100), crop_sz)
                )(fs, xs)
                return x + 1e-6 * jnp.mean(patches)

            return jax.lax.fori_loop(0, CHAIN, body, x0)

        med1, t1 = timed(lambda: np.asarray(single(frame, jnp.float32(200.0))))
        med16, t16 = timed(lambda: np.asarray(batch16(frames16, jnp.float32(200.0))))
        out[name] = {"single_us_per_crop": round(med1, 2),
                     "vmap16_us_per_step": round(med16, 2),
                     "single_reps": [round(t, 2) for t in t1],
                     "vmap16_reps": [round(t, 2) for t in t16]}
        print(f"{name}: single {med1:.2f} us/crop, vmap16 {med16:.2f} us/step",
              flush=True)

    out["speedup_single"] = round(out["rows_first"]["single_us_per_crop"]
                                  / out["cols_first"]["single_us_per_crop"], 4)
    out["speedup_vmap16"] = round(out["rows_first"]["vmap16_us_per_step"]
                                  / out["cols_first"]["vmap16_us_per_step"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
