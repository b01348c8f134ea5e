"""Weight-only int8 quantization for inference.

bs=1 tracking is weight-read bound (TPU_DESIGN.md: the ViT-B forward sits at
~1.8x the HBM weight-read floor), so halving the bytes of the big ViT matmul
kernels is the largest single-chip lever left. This module implements
symmetric per-output-channel int8 weight quantization:

    q[i, j] = round(w[i, j] / scale[j]),  scale[j] = max_i |w[i, j]| / 127

applied ONLY to the large 2-D matmul kernels the vit shared-math functions
consume (qkv / proj / mlp.fc1 / mlp.fc2 — the bulk of per-frame weight
traffic at ViT-B; convs, norms, biases and the BERT stack stay fp).

Dequantization never materializes a dense weight: every consumer computes
    (y @ q.astype(compute)) * scale
— the per-output-column scale factors out of the contraction exactly, so the
MXU reads the int8 payload converted in-registers and the fp32 scale touches
only the (N, out) result. int8 payloads in [-127, 127] are exactly
representable in bf16. The fused Pallas kernels take (q, scale) as separate
operands and do the same inside VMEM, halving both the HBM weight stream and
the kernel's resident footprint.

Accuracy: weight-only symmetric per-channel int8 is the mildest quantization
regime (activations stay bf16/fp32); tests/test_quant.py bounds the model-
output drift against the fp forward. Opt-in via cfg.TPU.WEIGHT_QUANT='int8'
(inference builds only — training keeps fp master weights; no reference
equivalent, the reference serves fp32/AMP).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """int8 payload + fp32 per-output-channel scale standing in for a 2-D
    (in, out) matmul kernel inside a param tree. Registered as a pytree so
    it rides through jit/device_put/flax param retrieval like the array it
    replaces; `dtype` tracks the COMPUTE dtype consumers contract in (an
    aux field, so astype() is structure-stable under jit)."""

    __slots__ = ("q", "scale", "_dtype")

    def __init__(self, q, scale, dtype=jnp.float32):
        self.q = q          # (in, out) int8
        self.scale = scale  # (out,) float32
        self._dtype = jnp.dtype(dtype)

    def tree_flatten(self):
        return (self.q, self.scale), self._dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, dtype=aux)

    # --- array-ish surface the shared-math call sites rely on ------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self._dtype

    def astype(self, dtype):
        return QuantizedTensor(self.q, self.scale, dtype=dtype)

    def materialize(self, dtype=None) -> jnp.ndarray:
        """Dense w = q * scale (fp32 mul, cast to the compute dtype). Used
        only where a dense array is unavoidable; the hot paths use
        quant_dot instead."""
        w = self.q.astype(jnp.float32) * self.scale.astype(jnp.float32)
        return w.astype(dtype or self._dtype)


def quantize_weight(w: jnp.ndarray) -> QuantizedTensor:
    """Symmetric per-output-channel int8 of a matmul/conv kernel whose LAST
    axis is the output channel ((in, out) Dense or (H, W, in, out) HWIO
    conv — both are linear in the kernel, so the per-out-channel scale
    factors out of the contraction exactly)."""
    assert w.ndim >= 2, f"need a kernel with an out-channel axis, got {w.shape}"
    red = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w).astype(jnp.float32), axis=red)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return QuantizedTensor(q.astype(jnp.int8), scale)


def quant_dot(y: jnp.ndarray, w: Any) -> jnp.ndarray:
    """fp32-accumulated y @ w for a dense array OR a QuantizedTensor.
    Quantized: contract against the int8 payload (converted to y's dtype —
    exact for [-127, 127]) and scale the fp32 result per output column:
    bit-for-bit the same contraction as dot(y, q*scale) with the scale
    lifted out, but the HBM stream is int8. Returns fp32."""
    if isinstance(w, QuantizedTensor):
        out = jnp.dot(y, w.q.astype(y.dtype),
                      preferred_element_type=jnp.float32)
        return out * w.scale.astype(jnp.float32)
    return jnp.dot(y, w, preferred_element_type=jnp.float32)


def materialize_weight(w: Any, dtype) -> jnp.ndarray:
    """Pass-through for plain arrays, dense dequant for QuantizedTensor."""
    if isinstance(w, QuantizedTensor):
        return w.materialize(dtype)
    return w.astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, QuantizedTensor)


# param-tree paths quantized at ViT widths: the four big matmul kernels of
# every VitBlock (vit.py holds them as raw _DenseParams so the shared math
# — and the fused kernels — consume them directly)
_VIT_KERNEL_TAILS = (
    ("qkv", "kernel"),
    ("proj", "kernel"),
    ("fc1", "kernel"),
    ("fc2", "kernel"),
)


def quantize_vit_params(params: dict, min_dim: int = 128) -> dict:
    """Return a copy of the param tree with every ViT-block matmul kernel
    (backbone.block_*.{qkv,proj,mlp/fc1,mlp/fc2}.kernel) replaced by a
    QuantizedTensor. min_dim skips toy-model kernels whose tiny shapes
    would lose more accuracy than bytes (tests pass min_dim explicitly)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def names_of(kp):
        return tuple(getattr(k, "key", getattr(k, "name", None)) for k in kp)

    leaves = []
    for kp, leaf in flat:
        names = names_of(kp)
        is_vit_kernel = (
            len(names) >= 3 and names[0] == "backbone"
            and isinstance(names[1], str) and names[1].startswith("block_")
            and any(names[-len(t):] == t for t in _VIT_KERNEL_TAILS)
            and getattr(leaf, "ndim", 0) == 2 and min(leaf.shape) >= min_dim)
        # head tower 3x3 convs (models/head.py QConv holds them as
        # {conv: {kernel, bias}}): HWIO, quantized per out channel when the
        # channel count is worth it (stage 0/1 at the shipped 256-channel
        # head; the tail stages shrink below min_dim and stay fp)
        is_head_conv = (
            len(names) >= 4 and names[0] == "head"
            and isinstance(names[1], str) and names[1].startswith("conv_")
            and names[-2:] == ("conv", "kernel")
            and getattr(leaf, "ndim", 0) == 4
            and leaf.shape[-1] >= min_dim)
        if is_vit_kernel or is_head_conv:
            leaves.append(quantize_weight(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def count_quantized(params: dict) -> int:
    return sum(isinstance(x, QuantizedTensor)
               for x in jax.tree_util.tree_leaves(
                   params, is_leaf=is_quantized))


def quantized_bytes_saved(params: dict) -> int:
    """Diagnostic: HBM bytes saved per full bf16 weight read (bf16 stream
    -> int8 payload + fp32 scale), for logs/bench output."""
    saved = 0
    for leaf in jax.tree_util.tree_leaves(params, is_leaf=is_quantized):
        if isinstance(leaf, QuantizedTensor):
            n = 1
            for s in leaf.q.shape:
                n *= int(s)
            saved += n - int(leaf.scale.size) * 4
    return saved
