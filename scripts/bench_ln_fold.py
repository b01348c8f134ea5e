"""Measure the prologue-folded kernel (LN + qkv matmul + attention in one
Pallas program) against the production two-op path (XLA LN+Dense ->
qkv-native Pallas attention) and the pure-XLA composition, on the real TPU.

Per-layer chain through fori_loop inside one jit, readback-fenced (see
scripts/bench_attention.py for why). The op is VitBlock's
norm1 -> qkv -> attention_qkv_core prefix at ViT-B width.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uvltrack_tpu.ops.pallas_attention import (_xla_ln_qkv_attention,
                                               fused_attention_qkv,
                                               fused_ln_qkv_attention)

C, H = 768, 12
ITERS = 2000
SHAPES = [(1, 361), (8, 361), (16, 361), (1, 681)]


def _sync(out):
    np.asarray(jax.device_get(out.ravel()[:1]))


def timed(name, fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS * 1e6
    print(f"  {name:26s} {per:8.2f} us/iter")
    return per


def main():
    print(f"platform={jax.devices()[0].platform} C={C} H={H} iters={ITERS}")
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(C,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(C, 3 * C)) / np.sqrt(C), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(3 * C,)) * 0.02, jnp.float32)

    for b, n in SHAPES:
        x = jnp.asarray(rng.normal(size=(b, n, C)), jnp.bfloat16)
        masked = rng.random((b, n)) > 0.9
        kb = jnp.asarray(np.where(masked, -1e10, 0.0), jnp.float32)

        def xla_composed(xx):
            return _xla_ln_qkv_attention(xx, g, be, w, wb, kb, heads=H)

        def two_op(xx):  # production path today
            x32 = xx.astype(jnp.float32)
            mean = jnp.mean(x32, -1, keepdims=True)
            var = jnp.mean(x32 * x32, -1, keepdims=True) - mean * mean
            y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * g + be
            qkv = (jnp.dot(y.astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)
                   + wb).astype(jnp.bfloat16)
            return fused_attention_qkv(qkv, kb, H)

        def folded(xx):
            return fused_ln_qkv_attention(xx, g, be, w, wb, kb, heads=H)

        ref = np.asarray(xla_composed(x), np.float32)
        for name, fn in (("two_op", two_op), ("folded", folded)):
            err = np.abs(np.asarray(fn(x), np.float32) - ref).max()
            assert err < 0.08, (name, err)

        def chain(op):
            @jax.jit
            def run(xx):
                def body(_, cur):
                    return op(cur)[:, :, :C].astype(cur.dtype)

                return jax.lax.fori_loop(0, ITERS, body, xx)

            return run

        print(f"B={b} N={n}")
        t_x = timed("xla composed", chain(xla_composed), x)
        t_2 = timed("ln+dense -> pallas qkv", chain(two_op), x)
        t_f = timed("folded pallas", chain(folded), x)
        print(f"  -> folded/two_op = {t_f / t_2:.3f}  "
              f"folded/xla = {t_f / t_x:.3f}")


if __name__ == "__main__":
    main()
