"""Attention-kernel shootout on the real TPU: XLA fused attention vs the
Pallas kernel (ops/pallas_attention.py), across the shapes the model uses.

Device time per iteration is measured by chaining the op through a fori_loop
inside one jit (one dispatch regardless of iteration count) and fencing with
a real readback — on this sandbox's tunnel runtime, block_until_ready can
return before the device finishes, and the per-dispatch overhead (~25 ms RTT)
would otherwise swamp a ~20 us op.

Usage: python scripts/bench_attention.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uvltrack_tpu.ops.attention import xla_attention
from uvltrack_tpu.ops.pallas_attention import fused_attention, fused_attention_qkv

H, D = 12, 64
ITERS = 2000
DTYPE = jnp.bfloat16
# (B, N): single-stream fusion layer / visual-only layer, 8-stream batch
# tracker, BERT layer, training step
SHAPES = [(1, 361), (1, 321), (8, 361), (1, 40), (16, 361)]


def _sync(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))


def timed(name, fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS * 1e6
    print(f"  {name:24s} {per:8.2f} us/iter")
    return per


def chain(op):
    @jax.jit
    def run(q, k, v, kb):
        def body(_, qq):
            return op(qq, k, v, kb).astype(qq.dtype)

        return jax.lax.fori_loop(0, ITERS, body, q)

    return run


def main():
    print(f"platform={jax.devices()[0].platform} H={H} D={D} dtype=bf16 "
          f"iters={ITERS}")
    for b, n in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, H, n, D)), DTYPE)
        k = jnp.asarray(rng.normal(size=(b, H, n, D)), DTYPE)
        v = jnp.asarray(rng.normal(size=(b, H, n, D)), DTYPE)
        key_masked = jnp.asarray(rng.random((b, n)) > 0.9)
        kb4 = jnp.where(key_masked, -1e10, 0.0).astype(jnp.float32)[:, None, None, :]
        kb2 = jnp.where(key_masked, -1e10, 0.0).astype(jnp.float32)

        ref = np.asarray(xla_attention(q, k, v, kb4), np.float32)
        out = np.asarray(fused_attention(q, k, v, kb2), np.float32)
        err = np.abs(out - ref).max()
        print(f"B={b} N={n}  (max |pallas - xla| = {err:.4f})")
        assert err < 0.05

        t_x = timed("xla", chain(lambda qq, kk, vv, _: xla_attention(qq, kk, vv, kb4)), q, k, v, kb2)
        t_p = timed("pallas fused", chain(fused_attention), q, k, v, kb2)
        print(f"  -> pallas/xla = {t_p / t_x:.3f}")

        # layout-native variant: in/out in the block's natural (B, N, F)
        # layout — this is the path VitBlock actually calls. The XLA
        # comparison includes the reshape/transposes a (B,H,N,D)-only kernel
        # forces XLA to materialize around an opaque pallas_call.
        qkv = jnp.concatenate([
            q.transpose(0, 2, 1, 3).reshape(b, n, H * D),
            k.transpose(0, 2, 1, 3).reshape(b, n, H * D),
            v.transpose(0, 2, 1, 3).reshape(b, n, H * D)], axis=-1)

        def xla_from_qkv(qq, *_):
            parts = qq.reshape(b, n, 3, H, D).transpose(2, 0, 3, 1, 4)
            o = xla_attention(parts[0], parts[1], parts[2], kb4)
            return o.transpose(0, 2, 1, 3).reshape(b, n, H * D)

        def chain_qkv(op):
            @jax.jit
            def run(qq, kb):
                def body(_, cur):
                    o = op(cur)
                    return jnp.concatenate([o, o, o], -1).astype(cur.dtype)

                return jax.lax.fori_loop(0, ITERS, body, qq)

            return run

        ref_q = np.asarray(xla_from_qkv(qkv), np.float32)
        out_q = np.asarray(fused_attention_qkv(qkv, kb2, H), np.float32)
        errq = np.abs(out_q - ref_q).max()
        assert errq < 0.05, errq
        t_xq = timed("xla (qkv layout)", chain_qkv(xla_from_qkv), qkv, kb2)
        t_pq = timed("pallas qkv-native", chain_qkv(
            lambda qq: fused_attention_qkv(qq, kb2, H)), qkv, kb2)
        print(f"  -> qkv-native pallas/xla = {t_pq / t_xq:.3f}")


if __name__ == "__main__":
    main()
