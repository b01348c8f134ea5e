"""Fused masked attention as a Pallas TPU kernel.

One kernel instance handles ALL heads of one batch element (grid=(B,)): the
per-(batch, head) grid would run B*H tiny programs at inference sizes, and
program-level overhead dominates at N=361 tokens. Q/K/V live in VMEM and
scores + key-padding bias + exp + PV + normalization happen in one fused pass,
so the NxN score matrices never touch HBM.

Softmax shortcuts (exact up to float rounding while |score| < 80,
measured on v5e):
- no max-subtraction: scores are clamped to ±80 instead, which exp() survives
  in fp32 (361*e^80 < fp32 max) and which turns the -1e10 masked-key bias
  into e^-80 ≈ 2e-35 — numerically zero. Saves a full NxN lane reduction.
  CONTRACT: scores beyond ±80 saturate (equal weight among >80 scores) —
  trained attention logits are O(10); the full-size reference-parity and
  bf16 tests cover the realistic range, and the custom-VJP backward
  differentiates the clamped function so fwd/bwd always agree.
- late division: P·V runs on the unnormalized exp in bf16 and the row sums
  divide the (N, D) output instead of the (N, N) probabilities.

Blocks cover the full (1, H, N, D) batch element, so N needs no 128-lane
padding (Mosaic's "block equals array dims" rule); no pad/slice copies appear
around the kernel.

Measured (v5e, 2000-iteration chains, readback-fenced): vs XLA's fused
attention this kernel is ~8% faster at B=1/N=361 (18.5 vs 20.0 us), ~10% at
B=8 (56.6 vs 63.0) and ~25% at B=16 (98.5 vs 131.2); parity at N=40.

The kernel supports key-padding bias only ((B, N) additive, broadcast over
queries) — the only masking UVLTrack uses (reference hot op:
lib/models/backbones/block.py:47-61).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .quant import quant_dot

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# exp-safe score range: 361 * e^80 stays finite in fp32; masked keys
# (bias -1e10) clamp to -80 -> weight e^-80, zero for all practical purposes
_CLAMP = 80.0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


_FORCE_INTERPRET = False  # tests flip this to run the kernels off-TPU


def min_seq_len() -> int:
    """Shortest sequence the kernels accept — below it the layout copies
    around the pallas_call lose end-to-end (measured 841 FPS with the gate
    at 32 vs the 970-class runs at 128; the 40-token BERT layers stay on
    XLA). ONE definition consumed by every entry point (classic, qkv-native
    and the ln-fused prefix in ops/attention.py) so the gate can never
    desynchronize kernel selection between them. Tunable via
    UVLTRACK_PALLAS_MIN_N for experiments."""
    return int(os.environ.get("UVLTRACK_PALLAS_MIN_N", "128"))


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                 heads: int):
    bias = bias_ref[0].astype(jnp.float32)  # (1, N), broadcasts over rows
    for h in range(heads):  # python loop -> fully unrolled, static slices
        q = q_ref[0, h]  # (N, D) bf16: MXU runs at full rate, accumulation
        k = k_ref[0, h]  # is fp32 via preferred_element_type
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT) * scale
        e = jnp.exp(jnp.clip(s + bias, -_CLAMP, _CLAMP))
        o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        o = o * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=False)
        o_ref[0, h] = o.astype(o_ref.dtype)


def fused_attention(q, k, v, key_bias, interpret: bool = False):
    """q,k,v: (B,H,N,D); key_bias: (B,N) fp32 additive. Returns (B,H,N,D).

    interpret=True runs the kernel in the Pallas interpreter (any backend) —
    for CPU tests only.
    """
    interpret = interpret or _FORCE_INTERPRET
    b, h, n, d = q.shape
    key_bias = key_bias[:, None, :]
    spec_qkv = pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=d ** -0.5, heads=h),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
        grid=(b,),
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_bias],
        out_specs=spec_qkv,
        interpret=interpret,
    )(q, k, v, key_bias)


def _attn_kernel_qkv(qkv_ref, bias_ref, o_ref, *, scale: float, heads: int,
                     head_dim: int):
    """Layout-native variant: qkv_ref block is (1, N, 3*H*D) — the raw output
    of the fused qkv Dense (feature order [q|k|v] x head x dim). Per-head
    q/k/v are static lane slices, so no (B,H,N,D) transpose ever reaches HBM;
    the output block is (1, N, H*D), directly consumable by the proj Dense."""
    hd = heads * head_dim
    bias = bias_ref[0].astype(jnp.float32)  # (1, N) broadcast over rows
    qkv = qkv_ref[0]  # (N, 3*H*D)
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, hd + h * head_dim:hd + (h + 1) * head_dim]
        v = qkv[:, 2 * hd + h * head_dim:2 * hd + (h + 1) * head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT) * scale
        e = jnp.exp(jnp.clip(s + bias, -_CLAMP, _CLAMP))
        o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        o = o * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=False)
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = o.astype(o_ref.dtype)


def fused_attention_qkv(qkv, key_bias, heads: int, interpret: bool = False):
    """qkv: (B, N, 3*H*D) raw fused-Dense output; key_bias: (B, N) fp32
    additive. Returns (B, N, H*D)."""
    interpret = interpret or _FORCE_INTERPRET
    b, n, f = qkv.shape
    d = f // (3 * heads)
    key_bias = key_bias[:, None, :]
    spec_qkv = pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, n, f // 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_qkv, scale=d ** -0.5, heads=heads,
                          head_dim=d),
        out_shape=jax.ShapeDtypeStruct((b, n, f // 3), qkv.dtype),
        grid=(b,),
        in_specs=[spec_qkv, spec_bias],
        out_specs=spec_out,
        interpret=interpret,
    )(qkv, key_bias)


def _ln_qkv_attn_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, bias_ref, o_ref,
                        *, scale: float, heads: int, head_dim: int,
                        eps: float):
    """Prologue-folded variant: LayerNorm (fp32) + the fused qkv matmul +
    bias + masked attention in ONE program, per batch element. Folds the
    pre-attention LN and the qkv projection into the kernel so the
    normalized activations and the (N, 3·H·D) qkv tensor never round-trip
    HBM (VitBlock's norm1 -> qkv Dense -> attention_qkv_core chain).

    The qkv weight (C, 3C) rides in VMEM (~3.4 MB bf16 at ViT-B width)."""
    hd = heads * head_dim
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # clamp like flax LayerNorm: fp32 cancellation on a large-mean
    # near-constant row can push fast-variance below -eps -> NaN rsqrt
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    qkv = (qkv + wb_ref[...].astype(jnp.float32)).astype(w_ref.dtype)
    bias = bias_ref[0].astype(jnp.float32)  # (1, N)
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, hd + h * head_dim:hd + (h + 1) * head_dim]
        v = qkv[:, 2 * hd + h * head_dim:2 * hd + (h + 1) * head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT) * scale
        e = jnp.exp(jnp.clip(s + bias, -_CLAMP, _CLAMP))
        o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        o = o * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=False)
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = o.astype(o_ref.dtype)


def fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, key_bias,
                           heads: int, eps: float = 1e-6,
                           interpret: bool = False):
    """x: (B, N, C) residual stream; ln_{scale,bias}: (C,); w_qkv: (C, 3C)
    (bf16 recommended); b_qkv: (3C,); key_bias: (B, N) fp32 additive.
    Returns (B, N, C) attention output (pre-proj), dtype of w_qkv."""
    interpret = interpret or _FORCE_INTERPRET
    b, n, c = x.shape
    d = c // heads
    key_bias = key_bias[:, None, :]
    spec_x = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vec = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_wb = pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_qkv_attn_kernel, scale=d ** -0.5, heads=heads,
                          head_dim=d, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), w_qkv.dtype),
        grid=(b,),
        in_specs=[spec_x, spec_vec, spec_vec, spec_w, spec_wb, spec_bias],
        out_specs=spec_x,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, key_bias)


def _xla_ln_qkv(x, ln_scale, ln_bias, w_qkv, b_qkv, eps: float = 1e-6):
    """Pure-XLA pre-LN LayerNorm + fused qkv projection (fast-variance fp32
    LN like flax's LayerNorm default, fp32-accumulated matmul + fp32 bias
    add). THE one copy of this math — shared by the kernel's backward
    recompute, the CPU/parity reference and ops/attention.py's non-fused
    paths, so the numerics cannot drift between bias shapes or backends."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    qkv = quant_dot(y.astype(w_qkv.dtype), w_qkv)
    return (qkv + b_qkv.astype(jnp.float32)).astype(w_qkv.dtype)


def _xla_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv, key_bias,
                          heads: int, eps: float = 1e-6, clamp: bool = False):
    """Pure-XLA math of fused_ln_qkv_attention; backward recompute target
    for the custom VJP and the CPU/parity reference."""
    qkv = _xla_ln_qkv(x, ln_scale, ln_bias, w_qkv, b_qkv, eps=eps)
    return _xla_qkv_attention(qkv, key_bias, heads, clamp=clamp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ln_qkv_attention_trainable(heads: int, eps: float, x, ln_scale, ln_bias,
                               w_qkv, b_qkv, key_bias):
    """Kernel forward, XLA-recompute backward (same pattern as
    _qkv_attention_trainable): gradients re-derive the whole LN+qkv+attn
    chain from the saved inputs with the clamped einsum math. eps is
    nondiff and threads into BOTH the kernel and the recompute."""
    return fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                  key_bias, heads, eps=eps)


def _ln_qkv_attention_fwd(heads, eps, x, ln_scale, ln_bias, w_qkv, b_qkv,
                          key_bias):
    out = fused_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                 key_bias, heads, eps=eps)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, key_bias)


def _ln_qkv_attention_bwd(heads, eps, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, key_bias = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ln_qkv_attention(*a, heads=heads, eps=eps,
                                         clamp=True),
        x, ln_scale, ln_bias, w_qkv, b_qkv, key_bias)
    return vjp(g.astype(w_qkv.dtype))


ln_qkv_attention_trainable.defvjp(_ln_qkv_attention_fwd,
                                  _ln_qkv_attention_bwd)


def _ln_qkv_attn_proj_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, wp_ref,
                             bp_ref, bias_ref, o_ref, *, scale: float,
                             heads: int, head_dim: int, eps: float):
    """Full attention-branch fusion: the prologue of _ln_qkv_attn_kernel
    (fp32 LayerNorm + fused qkv matmul) plus an EPILOGUE — the output
    projection (w_proj resident in VMEM, ~1.2 MB bf16 at ViT-B width on top
    of the 3.4 MB qkv weight) and the residual add — so VitBlock's whole
    norm1 -> qkv -> attention -> proj -> (+x) chain is ONE program and the
    (N, C) pre-proj attention output never round-trips HBM. Valid only when
    the residual branch has no LayerScale/DropPath (the shipped configs;
    vit.py falls back otherwise)."""
    x_orig = x_ref[0]  # (N, C), residual operand in the stream dtype
    x = x_orig.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)  # clamp like flax LayerNorm (see _ln_qkv_attn_kernel)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    qkv = (qkv + wb_ref[...].astype(jnp.float32)).astype(w_ref.dtype)
    bias = bias_ref[0].astype(jnp.float32)  # (1, N)
    # per-head cast to wp's dtype (like the non-proj kernels cast on o_ref
    # write), so the epilogue matmul sees the same bf16 attention output
    # the composed path's proj Dense would read from HBM
    o_all = _attn_heads_concat(qkv, bias, scale=scale, heads=heads,
                               head_dim=head_dim, out_dtype=wp_ref.dtype)
    proj = jax.lax.dot_general(
        o_all, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    proj = (proj + bp_ref[...].astype(jnp.float32)).astype(x_orig.dtype)
    o_ref[0] = x_orig + proj  # residual add in the stream dtype


def fused_ln_qkv_attn_proj(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj,
                           b_proj, key_bias, heads: int, eps: float = 1e-6,
                           interpret: bool = False):
    """x: (B, N, C) residual stream; w_qkv: (C, 3C); w_proj: (C, C) (bf16
    recommended); key_bias: (B, N) fp32 additive. Returns (B, N, C)
    POST-residual: x + proj(attention(qkv(LN(x)))), dtype of x."""
    interpret = interpret or _FORCE_INTERPRET
    b, n, c = x.shape
    d = c // heads
    key_bias = key_bias[:, None, :]
    spec_x = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vec = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_wb = pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_wp = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_qkv_attn_proj_kernel, scale=d ** -0.5,
                          heads=heads, head_dim=d, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[spec_x, spec_vec, spec_vec, spec_w, spec_wb, spec_wp,
                  spec_vec, spec_bias],
        out_specs=spec_x,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, key_bias)


def _xla_proj(attn, w_proj, b_proj):
    """Output-projection twin (fp32-accumulated matmul + fp32 bias add,
    result in w_proj's dtype) — THE one copy of the proj math, shared by
    the fused kernel's backward recompute, the composed fallback in
    ops/attention.attn_proj_core and the CPU/parity path."""
    o = quant_dot(attn.astype(w_proj.dtype), w_proj)
    return (o + b_proj.astype(jnp.float32)).astype(w_proj.dtype)


def _xla_ln_qkv_attn_proj(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj,
                          b_proj, key_bias, heads: int, eps: float = 1e-6,
                          clamp: bool = False):
    """Pure-XLA math of fused_ln_qkv_attn_proj (incl. the residual add);
    backward recompute target and the CPU/parity reference."""
    attn = _xla_ln_qkv_attention(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                 key_bias, heads, eps=eps, clamp=clamp)
    proj = _xla_proj(attn, w_proj, b_proj)
    return x + proj.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ln_qkv_attn_proj_trainable(heads: int, eps: float, x, ln_scale, ln_bias,
                               w_qkv, b_qkv, w_proj, b_proj, key_bias):
    """Kernel forward, XLA-recompute backward (pattern of
    ln_qkv_attention_trainable), over the whole LN+qkv+attn+proj+residual
    chain."""
    return fused_ln_qkv_attn_proj(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                  w_proj, b_proj, key_bias, heads, eps=eps)


def _ln_qkv_attn_proj_fwd(heads, eps, x, ln_scale, ln_bias, w_qkv, b_qkv,
                          w_proj, b_proj, key_bias):
    out = fused_ln_qkv_attn_proj(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj,
                                 b_proj, key_bias, heads, eps=eps)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
                 key_bias)


def _ln_qkv_attn_proj_bwd(heads, eps, res, g):
    x = res[0]
    _, vjp = jax.vjp(
        lambda *a: _xla_ln_qkv_attn_proj(*a, heads=heads, eps=eps,
                                         clamp=True), *res)
    return vjp(g.astype(x.dtype))


ln_qkv_attn_proj_trainable.defvjp(_ln_qkv_attn_proj_fwd,
                                  _ln_qkv_attn_proj_bwd)


def _attn_heads_concat(qkv, bias, *, scale: float, heads: int,
                       head_dim: int, out_dtype):
    """Shared per-head attention loop over a VMEM-resident (N, 3·H·D) qkv
    tensor, returning the concatenated (N, H·D) output — the body of the
    q8 kernel variants (the measured fp kernels keep their slice-write
    bodies untouched)."""
    hd = heads * head_dim
    outs = []
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, hd + h * head_dim:hd + (h + 1) * head_dim]
        v = qkv[:, 2 * hd + h * head_dim:2 * hd + (h + 1) * head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT) * scale
        e = jnp.exp(jnp.clip(s + bias, -_CLAMP, _CLAMP))
        o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        o = o * pl.reciprocal(jnp.sum(e, axis=-1, keepdims=True), approx=False)
        outs.append(o.astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)


def _ln_qkv_attn_kernel_q8(x_ref, g_ref, b_ref, wq_ref, ws_ref, wb_ref,
                           bias_ref, o_ref, *, scale: float, heads: int,
                           head_dim: int, eps: float):
    """int8-weight variant of _ln_qkv_attn_kernel: the qkv weight rides in
    VMEM as the int8 payload (HALF the HBM stream and resident footprint of
    the bf16 kernel) and the per-output-channel fp32 scale multiplies the
    fp32 accumulator — mathematically the scale lifted out of the
    contraction (ops/quant.py quant_dot), never a dense dequantized copy."""
    cdt = o_ref.dtype
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        y.astype(cdt), wq_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    qkv = qkv * ws_ref[...] + wb_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)
    bias = bias_ref[0].astype(jnp.float32)  # (1, N)
    o_ref[0] = _attn_heads_concat(qkv, bias, scale=scale, heads=heads,
                                  head_dim=head_dim, out_dtype=cdt)


def fused_ln_qkv_attention_q8(x, ln_scale, ln_bias, w_q, w_scale, b_qkv,
                              key_bias, heads: int, eps: float = 1e-6,
                              interpret: bool = False):
    """Quantized-weight prefix kernel. w_q: (C, 3C) int8; w_scale: (3C,)
    fp32. Inference-only (no custom VJP — training keeps fp weights).
    Returns (B, N, C) pre-proj attention output in x.dtype."""
    interpret = interpret or _FORCE_INTERPRET
    b, n, c = x.shape
    d = c // heads
    key_bias = key_bias[:, None, :]
    spec_x = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vec = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_wv = pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_qkv_attn_kernel_q8, scale=d ** -0.5,
                          heads=heads, head_dim=d, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[spec_x, spec_vec, spec_vec, spec_w, spec_wv, spec_wv,
                  spec_bias],
        out_specs=spec_x,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_q, w_scale, b_qkv, key_bias)


def _ln_qkv_attn_proj_kernel_q8(x_ref, g_ref, b_ref, wq_ref, ws_ref, wb_ref,
                                wpq_ref, wps_ref, bp_ref, bias_ref, o_ref, *,
                                scale: float, heads: int, head_dim: int,
                                eps: float):
    """int8-weight variant of the full-branch kernel: both the qkv and proj
    weights ride as int8 payloads; scales multiply the fp32 accumulators."""
    x_orig = x_ref[0]
    cdt = x_orig.dtype  # compute dtype comes from the residual stream
    x = x_orig.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        y.astype(cdt), wq_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    qkv = (qkv * ws_ref[...] + wb_ref[...].astype(jnp.float32)).astype(cdt)
    bias = bias_ref[0].astype(jnp.float32)
    o_all = _attn_heads_concat(qkv, bias, scale=scale, heads=heads,
                               head_dim=head_dim, out_dtype=cdt)
    proj = jax.lax.dot_general(
        o_all, wpq_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    proj = (proj * wps_ref[...] + bp_ref[...].astype(jnp.float32)).astype(
        x_orig.dtype)
    o_ref[0] = x_orig + proj


def fused_ln_qkv_attn_proj_q8(x, ln_scale, ln_bias, w_q, w_scale, b_qkv,
                              wp_q, wp_scale, b_proj, key_bias, heads: int,
                              eps: float = 1e-6, interpret: bool = False):
    """Quantized full-branch kernel: returns (B, N, C) POST-residual.
    w_q: (C, 3C) int8 + (3C,) scale; wp_q: (C, C) int8 + (C,) scale."""
    interpret = interpret or _FORCE_INTERPRET
    b, n, c = x.shape
    d = c // heads
    key_bias = key_bias[:, None, :]
    spec_x = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vc = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_v3c = pl.BlockSpec((3 * c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_wp = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_qkv_attn_proj_kernel_q8, scale=d ** -0.5,
                          heads=heads, head_dim=d, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[spec_x, spec_vc, spec_vc, spec_w, spec_v3c, spec_v3c,
                  spec_wp, spec_vc, spec_vc, spec_bias],
        out_specs=spec_x,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_q, w_scale, b_qkv, wp_q, wp_scale, b_proj,
      key_bias)


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps: float):
    """MLP-half fusion: fp32 LayerNorm + fc1 + exact gelu + fc2 in one
    program (VitBlock's norm2 -> Mlp chain). Both weight matrices ride in
    VMEM (~9.4 MB bf16 at ViT-B width), so the normalized activations and
    the (N, 4C) hidden tensor never round-trip HBM."""
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)  # clamp like flax LayerNorm (see _ln_qkv_attn_kernel)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    h = jax.lax.dot_general(
        y.astype(w1_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    h = h + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False)
    o = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-6,
                 interpret: bool = False):
    """x: (B, N, C); w1: (C, F); w2: (F, C) (bf16 recommended).
    Returns (B, N, C) MLP output (pre-residual), dtype of w2."""
    interpret = interpret or _FORCE_INTERPRET
    b, n, c = x.shape
    f = w1.shape[1]
    spec_x = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_vc = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_vf = pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM)
    spec_w1 = pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_w2 = pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, c), w2.dtype),
        grid=(b,),
        in_specs=[spec_x, spec_vc, spec_vc, spec_w1, spec_vf, spec_w2,
                  spec_vc],
        out_specs=spec_x,
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _xla_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float = 1e-6):
    """Pure-XLA math of fused_ln_mlp; backward recompute target and the
    CPU/parity path (mirrors nn.LayerNorm(fp32) -> Mlp at compute dtype)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = quant_dot(y.astype(w1.dtype), w1)
    h = jax.nn.gelu(h + b1.astype(jnp.float32), approximate=False)
    o = quant_dot(h.astype(w2.dtype), w2)
    return (o + b2.astype(jnp.float32)).astype(w2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def ln_mlp_trainable(eps: float, x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Kernel forward, XLA-recompute backward (pattern of
    ln_qkv_attention_trainable): gradients re-derive LN+fc1+gelu+fc2 from
    the saved inputs — the (N, 4C) hidden tensor is never saved. eps is
    nondiff and threads into both the kernel and the recompute."""
    return fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)


def _ln_mlp_fwd(eps, x, ln_scale, ln_bias, w1, b1, w2, b2):
    out = fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _ln_mlp_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _xla_ln_mlp(*a, eps=eps), *res)
    return vjp(g.astype(res[5].dtype))


ln_mlp_trainable.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)


def _xla_qkv_attention(qkv, key_bias, heads: int, clamp: bool = False):
    """Pure-XLA qkv-layout attention. clamp=True mirrors the kernel's
    clip-to-±80 softmax exactly — the custom-VJP backward differentiates
    THIS so gradients describe the same function the kernel computed in the
    forward (identical to exact softmax while |score| < 80; zero gradient
    through saturated scores, matching the clamp)."""
    b, n, f = qkv.shape
    d = f // (3 * heads)
    parts = qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = parts[0], parts[1], parts[2]
    scale = d ** -0.5
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + key_bias[:, None, None, :].astype(jnp.float32)
    if clamp:
        s = jnp.clip(s, -_CLAMP, _CLAMP)
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qkv_attention_trainable(heads: int, qkv, key_bias):
    """Kernel forward with an XLA-recompute backward: pallas_call defines no
    VJP, so the gradient re-derives attention from the saved qkv/bias with
    the einsum math (flash-attention-style recompute — trades FLOPs for
    never materializing the NxN probabilities in the forward)."""
    return fused_attention_qkv(qkv, key_bias, heads)


def _qkv_attention_fwd(heads, qkv, key_bias):
    return fused_attention_qkv(qkv, key_bias, heads), (qkv, key_bias)


def _qkv_attention_bwd(heads, res, g):
    qkv, key_bias = res
    _, vjp = jax.vjp(lambda q, b: _xla_qkv_attention(q, b, heads, clamp=True),
                     qkv, key_bias)
    return vjp(g.astype(qkv.dtype))


_qkv_attention_trainable.defvjp(_qkv_attention_fwd, _qkv_attention_bwd)


def pallas_attention_qkv(qkv, heads: int, bias=None):
    """Adapter for the layout-native path. qkv: (B, N, 3*H*D); bias: None or
    (B,1,1,N) key-padding. Returns (B, N, H*D) or None when not applicable.
    Differentiable (custom VJP recomputes the backward in XLA math)."""
    if not (_HAS_PALLAS and _on_tpu()):
        return None
    b, n, f = qkv.shape
    if n < min_seq_len():
        return None
    if bias is None:
        key_bias = jnp.zeros((b, n), jnp.float32)
    elif bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)
    else:
        return None
    return _qkv_attention_trainable(heads, qkv, key_bias)


def pallas_attention(q, k, v, bias=None):
    """Adapter used by attention_core. bias: None or (B,1,1,N) key-padding.

    Returns (B,H,N,D), or None when the Pallas path doesn't apply (off-TPU,
    or a bias shape that is not pure key-padding).
    """
    if not (_HAS_PALLAS and _on_tpu()):
        return None
    b, h, n, d = q.shape
    if n < min_seq_len():  # see min_seq_len for the measured rationale
        return None
    if bias is None:
        key_bias = jnp.zeros((b, n), jnp.float32)
    elif bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)
    else:
        return None
    return fused_attention(q, k, v, key_bias)
