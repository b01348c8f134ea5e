"""Multi-head attention core with pluggable backends (XLA einsum / Pallas).

Semantics match the reference blocks: scores = q·k^T * scale + additive bias
(bias = -1e10 at masked keys, lib/models/backbones/block.py:47-61; BERT uses
-10000, lib/models/backbones/bert_backbone.py:728), softmax in fp32, then
probs·v. Sequence lengths here are small (<=361 for UVLTrack-B), so the XLA
path is a single fused region; the Pallas path fuses the whole thing into one
kernel to cut HBM round-trips at inference batch sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BACKEND = "xla"  # selected via set_backend; "pallas" requires TPU
_OVERRIDE = None  # force_backend pin: wins over later set_backend calls


def set_backend(name: str) -> None:
    """Select the backend. A force_backend pin (if any) takes precedence —
    build_model calls this from each model's cfg, and without the pin a
    later build would silently flip the global backend under an earlier
    model (e.g. bench.py's XLA fallback being undone by the next extra)."""
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown attention backend {name!r}")
    if _OVERRIDE is None:
        _BACKEND = name


def force_backend(name: str | None) -> None:
    """Pin the backend process-wide (None clears the pin)."""
    global _BACKEND, _OVERRIDE
    if name is not None and name not in ("xla", "pallas"):
        raise ValueError(f"unknown attention backend {name!r}")
    _OVERRIDE = name
    if name is not None:
        _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """q,k,v: (B, H, N, D). bias: broadcastable to (B, H, N, N), additive.

    Returns (B, H, N, D) in v.dtype. Softmax is computed in float32.
    """
    if _BACKEND == "pallas":
        from .pallas_attention import pallas_attention

        out = pallas_attention(q, k, v, bias)
        if out is not None:
            return out
    return xla_attention(q, k, v, bias)


def attention_qkv_core(qkv: jnp.ndarray, heads: int,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Layout-native attention entry: qkv is the raw fused-Dense output
    (B, N, 3*H*D), feature order [q|k|v] x head x dim. Returns (B, N, H*D).

    On the Pallas backend this feeds the qkv-native kernel so no head-major
    (B,H,N,D) copies materialize around the pallas_call; on the XLA backend
    the transposes below are virtual (fused into the einsums), making the
    fallback identical to the classic path."""
    b, n, f = qkv.shape
    d = f // (3 * heads)
    if _BACKEND == "pallas":
        from .pallas_attention import pallas_attention_qkv

        out = pallas_attention_qkv(qkv, heads, bias)
        if out is not None:
            return out
    parts = qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    out = xla_attention(parts[0], parts[1], parts[2], bias)
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * d)


def xla_attention(q, k, v, bias=None):
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


def key_padding_bias(key_masked: jnp.ndarray, neg: float = -1e10) -> jnp.ndarray:
    """(B, N) bool, True = masked key -> (B, 1, 1, N) additive fp32 bias."""
    return jnp.where(key_masked, neg, 0.0).astype(jnp.float32)[:, None, None, :]
