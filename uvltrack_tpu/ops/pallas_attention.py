"""Fused masked attention as a Pallas TPU kernel.

One kernel instance handles one (batch, head) pair: Q/K/V tiles live in VMEM
and scores + key-padding bias + softmax + PV happen in one fused pass, so the
NxN score matrix never touches HBM. Sequence lengths in this model are tiny
(361 tokens for UVLTrack-B at 256 search), so there is no need for
online-softmax tiling over K — a full score row fits in VMEM; the win over
the XLA path is fusion, not tiling.

The kernel supports key-padding bias only ((B, N) additive, broadcast over
queries) — the only masking UVLTrack uses. Caller pads N up to a multiple of
128 lanes with -1e30 bias on padded keys and slices the result back.

Falls back to None (caller uses the XLA path) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_PAD_NEG = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # (N, D) — keep bf16 so the MXU runs at full rate;
    k = k_ref[0, 0]  # fp32 accumulation comes from preferred_element_type
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)  # (1, N) broadcasts over rows
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_attention(q, k, v, key_bias):
    """q,k,v: (B,H,N,D); key_bias: (B,N) fp32 additive. Returns (B,H,N,D)."""
    b, h, n, d = q.shape
    n_pad = _round_up(n, 128)
    if n_pad != n:
        pad_qkv = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q = jnp.pad(q, pad_qkv)
        k = jnp.pad(k, pad_qkv)
        v = jnp.pad(v, pad_qkv)
        key_bias = jnp.pad(key_bias, [(0, 0), (0, n_pad - n)],
                           constant_values=_PAD_NEG)
    # (B, 1, N): the trailing (1, N) block equals the array dims, satisfying
    # the Mosaic block-shape divisibility rule for any batch size; same for
    # the head dim D (typically 64), which stays unpadded.
    key_bias = key_bias[:, None, :]

    spec_qkv = pl.BlockSpec((1, 1, n_pad, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), v.dtype),
        grid=(b, h),
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_bias],
        out_specs=spec_qkv,
    )(q, k, v, key_bias)
    if n_pad != n:
        out = out[:, :, :n, :]
    return out


def pallas_attention(q, k, v, bias=None):
    """Adapter used by attention_core. bias: None or (B,1,1,N) key-padding.

    Returns (B,H,N,D), or None when the Pallas path doesn't apply (off-TPU,
    or a bias shape that is not pure key-padding).
    """
    if not (_HAS_PALLAS and _on_tpu()):
        return None
    b, h, n, d = q.shape
    if bias is None:
        key_bias = jnp.zeros((b, n), jnp.float32)
    elif bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
        key_bias = bias[:, 0, 0, :].astype(jnp.float32)
    else:
        return None
    return fused_attention(q, k, v, key_bias)
