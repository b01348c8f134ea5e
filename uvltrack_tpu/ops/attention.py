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


def _as_key_bias(bias, b: int, n: int):
    """THE key-padding-bias contract, shared by every fused entry point:
    None -> zeros (no masking); a (B, 1, 1, N) additive bias -> its (B, N)
    fp32 form; any other shape -> None (only the generic composed path
    handles it). Key padding is the only masking UVLTrack uses."""
    if bias is None:
        return jnp.zeros((b, n), jnp.float32)
    if bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1:
        return bias[:, 0, 0, :].astype(jnp.float32)
    return None


def attention_ln_qkv_core(x: jnp.ndarray, ln_scale, ln_bias, w_qkv, b_qkv,
                          heads: int, bias: jnp.ndarray | None = None,
                          compute_dtype=None, eps: float = 1e-6) -> jnp.ndarray:
    """Block-prefix attention entry: pre-LN LayerNorm + fused qkv projection
    + masked attention, from the raw residual stream x (B, N, C).
    Returns (B, N, C) pre-proj attention output.

    On the Pallas backend this runs as ONE kernel (LN prologue + qkv matmul
    with the weight resident in VMEM + per-head attention — measured -5%
    at B=1 and -13/-15% at B=8/16 vs LN+Dense+qkv-kernel on v5e,
    scripts/bench_ln_fold.py); differentiable via an XLA-recompute custom
    VJP. The XLA fallback composes the same math (fast-variance fp32 LN,
    matching flax LayerNorm defaults)."""
    compute_dtype = compute_dtype or x.dtype
    from . import pallas_attention as pa

    b, n, c = x.shape
    key_bias = _as_key_bias(bias, b, n)
    if (_BACKEND == "pallas" and key_bias is not None and pa._HAS_PALLAS
            and pa._on_tpu() and n >= pa.min_seq_len()):
        import os

        # VMEM *estimate* for the prefix kernel: qkv weight at compute
        # width (int8 when quantized) + the fp32 (N, 3C) qkv transient +
        # one (N, N) score + ~3 (N, C) fp32 LN buffers. The estimate
        # over-counts (Mosaic reuses disjoint-lifetime buffers): ViT-L at
        # N=361 estimates ~15.6 MB and is compile-PROVEN on a v5e (the
        # step_many L-8 bench ran with the fused prefix default-on), so
        # the cap sits just above it — ViT-B tracking (~11 MB) and
        # grounding N=681 (~13.7 MB) engage, ViT-H (~21 MB) falls back to
        # the qkv kernel until measured (UVLTRACK_FUSED_VMEM_MB to retune).
        from .quant import is_quantized

        wbytes = 1 if is_quantized(w_qkv) else jnp.dtype(compute_dtype).itemsize
        vmem_est = (3 * c * c * wbytes + n * 3 * c * 4 + n * n * 4
                    + 3 * n * c * 4)
        vmem_cap = int(os.environ.get("UVLTRACK_FUSED_VMEM_MB", "17"))
        if (os.environ.get("UVLTRACK_FUSED_PREFIX", "1") == "1"
                and vmem_est < vmem_cap * 1024 * 1024):
            if is_quantized(w_qkv):
                # inference-only int8 path: the kernel reads the int8
                # payload (half the HBM stream) and scales the fp32
                # accumulator (ops/quant.py); no custom VJP — training
                # keeps fp master weights
                return pa.fused_ln_qkv_attention_q8(
                    x, ln_scale, ln_bias, w_qkv.q, w_qkv.scale, b_qkv,
                    key_bias, heads, eps=eps)
            return pa.ln_qkv_attention_trainable(
                heads, eps, x, ln_scale, ln_bias,
                w_qkv.astype(compute_dtype), b_qkv, key_bias)
        # UVLTRACK_FUSED_PREFIX=0 reverts to step 3 (TPU_DESIGN.md): LN +
        # qkv Dense composed in XLA, attention still in the qkv-native
        # pallas kernel — so the knob A/Bs ONLY the prefix fusion, not the
        # whole pallas backend
        qkv = pa._xla_ln_qkv(x, ln_scale, ln_bias,
                             w_qkv.astype(compute_dtype), b_qkv, eps=eps)
        return attention_qkv_core(qkv, heads, bias)
    # XLA fallback (CPU tests / non-TPU runs): the SAME composition the
    # kernel's custom-VJP backward recomputes, so forward, gradient and
    # parity math never drift apart
    if key_bias is not None:
        return pa._xla_ln_qkv_attention(
            x, ln_scale, ln_bias, w_qkv.astype(compute_dtype), b_qkv,
            key_bias, heads, eps=eps)
    # generic (non-key-padding) bias: same shared LN+qkv math, attention
    # handles the arbitrary bias shape
    qkv = pa._xla_ln_qkv(x, ln_scale, ln_bias, w_qkv.astype(compute_dtype),
                         b_qkv, eps=eps)
    return attention_qkv_core(qkv, heads, bias)


def attn_proj_core(attn: jnp.ndarray, w_proj, b_proj,
                   compute_dtype=None) -> jnp.ndarray:
    """Attention output projection from raw params (same math as the
    nn.Dense it replaced: compute-dtype matmul with fp32 accumulation +
    bias). Shared with the fused kernel's epilogue/backward so the two
    paths cannot drift."""
    compute_dtype = compute_dtype or attn.dtype
    from . import pallas_attention as pa

    return pa._xla_proj(attn, w_proj.astype(compute_dtype), b_proj)


def attention_block_core(x: jnp.ndarray, ln_scale, ln_bias, w_qkv, b_qkv,
                         w_proj, b_proj, heads: int,
                         bias: jnp.ndarray | None = None,
                         compute_dtype=None, eps: float = 1e-6) -> jnp.ndarray:
    """Whole-attention-branch entry: returns x + proj(attn(qkv(LN(x)))) —
    the full first half of VitBlock when the residual branch carries no
    LayerScale/DropPath (the shipped configs; vit.py falls back to the
    composed path otherwise).

    On the Pallas backend with UVLTRACK_FUSED_PROJ=1 this runs as ONE
    kernel (fused_ln_qkv_attn_proj): the (N, C) pre-proj attention output
    never round-trips HBM and the residual add rides in the epilogue.
    Default is the measured prefix kernel + composed proj (flip the default
    only on a measured end-to-end win — scripts/bench_fused_proj_ab.py)."""
    compute_dtype = compute_dtype or x.dtype
    from . import pallas_attention as pa

    b, n, c = x.shape
    key_bias = _as_key_bias(bias, b, n)
    if (_BACKEND == "pallas" and key_bias is not None and pa._HAS_PALLAS
            and pa._on_tpu() and n >= pa.min_seq_len()):
        import os

        # VMEM estimate: qkv+proj weights at compute width (int8 when
        # quantized) + the fp32 (N, 3C) qkv transient + one (N, N) score +
        # two (N, C) fp32 buffers — same over-counting model (and the same
        # cap knob) as the prefix gate in attention_ln_qkv_core; geometries
        # above the cap fall back to the prefix kernel below
        from .quant import is_quantized

        quant_pair = is_quantized(w_qkv) and is_quantized(w_proj)
        wbytes = 1 if quant_pair else jnp.dtype(compute_dtype).itemsize
        vmem_est = (4 * c * c * wbytes + n * 3 * c * 4 + n * n * 4
                    + 2 * n * c * 4)
        vmem_cap = int(os.environ.get("UVLTRACK_FUSED_VMEM_MB", "17"))
        if (os.environ.get("UVLTRACK_FUSED_PROJ", "0") == "1"
                and os.environ.get("UVLTRACK_FUSED_PREFIX", "1") == "1"
                and (quant_pair or not (is_quantized(w_qkv)
                                        or is_quantized(w_proj)))
                and vmem_est < vmem_cap * 1024 * 1024):
            if quant_pair:
                return pa.fused_ln_qkv_attn_proj_q8(
                    x, ln_scale, ln_bias, w_qkv.q, w_qkv.scale, b_qkv,
                    w_proj.q, w_proj.scale, b_proj, key_bias, heads,
                    eps=eps)
            return pa.ln_qkv_attn_proj_trainable(
                heads, eps, x, ln_scale, ln_bias,
                w_qkv.astype(compute_dtype), b_qkv,
                w_proj.astype(compute_dtype), b_proj, key_bias)
    # composed: prefix core (fused kernel / qkv kernel / XLA per its own
    # gates) + shared proj math + residual
    attn = attention_ln_qkv_core(x, ln_scale, ln_bias, w_qkv, b_qkv, heads,
                                 bias, compute_dtype=compute_dtype, eps=eps)
    return x + attn_proj_core(attn, w_proj, b_proj,
                              compute_dtype=compute_dtype).astype(x.dtype)


def ln_mlp_core(x: jnp.ndarray, ln_scale, ln_bias, w1, b1, w2, b2,
                compute_dtype=None, eps: float = 1e-6) -> jnp.ndarray:
    """Block-suffix MLP entry: pre-LN LayerNorm + fc1 + exact gelu + fc2
    from the raw residual stream x (B, N, C). Returns (B, N, C) pre-residual
    MLP output. One pallas program on the TPU pallas backend (both weight
    matrices VMEM-resident; ViT-B width only — ~9.4 MB bf16; ViT-L's 16.8 MB
    doesn't fit the ~16 MB VMEM), XLA composition elsewhere."""
    compute_dtype = compute_dtype or x.dtype
    from . import pallas_attention as pa

    if _BACKEND == "pallas":
        b, n, c = x.shape
        import os

        # VMEM budget: weights 2*C*F at the COMPUTE dtype's width (fp32
        # compute doubles the footprint) + (N, F) f32 hidden
        f = w1.shape[1]
        wbytes = jnp.dtype(compute_dtype).itemsize
        vmem_est = 2 * c * f * wbytes + n * f * 4 + 3 * n * c * 4
        # default OFF: measured a 33% end-to-end LOSS at bs=1 (657 vs 975
        # FPS) — XLA pipelines the two MXU matmuls across tiles/layers and
        # hides the 9.4 MB weight stream, which one monolithic program
        # cannot; kept as an opt-in experiment (UVLTRACK_FUSED_MLP=1)
        from .quant import is_quantized

        if (pa._HAS_PALLAS and pa._on_tpu()
                and os.environ.get("UVLTRACK_FUSED_MLP", "0") == "1"
                and n >= pa.min_seq_len()
                and not (is_quantized(w1) or is_quantized(w2))
                and vmem_est < 14 * 1024 * 1024):
            return pa.ln_mlp_trainable(
                eps, x, ln_scale, ln_bias, w1.astype(compute_dtype),
                b1, w2.astype(compute_dtype), b2)
    # XLA fallback: the kernel's backward-recompute twin (no math drift)
    return pa._xla_ln_mlp(x, ln_scale, ln_bias, w1.astype(compute_dtype),
                          b1, w2.astype(compute_dtype), b2, eps=eps)


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
