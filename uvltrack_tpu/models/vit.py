"""MAE-style ViT pieces for the modality-unified extractor.

Capability parity with the reference ViT (lib/models/backbones/mae_vit.py):
rectangular input as two patch streams (template z, search x) through one
shared patch embed, separate fixed 2D sin-cos positional embeddings, a CLS
token, a 2-entry modal embedding used in joint (fusion) layers, and pre-LN
transformer blocks with additive key masking (-1e10). The layer loop itself
lives in mufe.py; this file provides the per-layer building blocks.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (attention_block_core, attention_ln_qkv_core,
                             attn_proj_core, key_padding_bias, ln_mlp_core)


class _MlpParams(nn.Module):
    """Param holder matching Mlp's tree ({fc1: {kernel, bias},
    fc2: {kernel, bias}})."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return w1, b1, w2, b2


class _LnParams(nn.Module):
    """Param holder matching nn.LayerNorm's tree ({scale, bias}) so the
    block can hand the raw weights to the fused LN+qkv+attention kernel
    while checkpoints/converters see an unchanged structure."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """Param holder matching nn.Dense's tree ({kernel, bias})."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.xavier_uniform(),
                           (self.in_dim, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) [sin | cos] embedding."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid*grid, embed_dim); first half encodes column idx, second half row.

    Matches the reference generator (mae_vit.py:52-78): w-coordinate goes
    into the first D/2 channels, token order is row-major.
    """
    assert embed_dim % 2 == 0
    rows = np.repeat(np.arange(grid_size, dtype=np.float64), grid_size)  # h idx
    cols = np.tile(np.arange(grid_size, dtype=np.float64), grid_size)  # w idx
    emb_w = sincos_1d(embed_dim // 2, cols)
    emb_h = sincos_1d(embed_dim // 2, rows)
    return np.concatenate([emb_w, emb_h], axis=1)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.xavier_uniform(), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.xavier_uniform(), name="fc2")(x)
        return x


class VitBlock(nn.Module):
    """Pre-LN transformer block with additive key-padding masking.

    drop_path > 0 enables stochastic depth on both residual branches
    (reference: DropPath in backbones/utils.py, scheduled linearly over depth
    by drop_path_rate); it requires a 'dropout' rng and deterministic=False.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    drop_path: float = 0.0
    # LayerScale (backbones/utils.py:24-31; block.py:21,26): per-channel
    # residual-branch scaling, enabled when init_values is set. The shipped
    # configs leave it off (block.py passes init_values=None -> Identity).
    init_values: Optional[float] = None

    def _layer_scale(self, delta: jnp.ndarray, name: str) -> jnp.ndarray:
        if self.init_values is None:
            return delta
        gamma = self.param(name, nn.initializers.constant(self.init_values),
                           (self.dim,))
        return delta * gamma.astype(delta.dtype)

    def _drop_path(self, delta: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.drop_path <= 0.0 or deterministic:
            return delta
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (delta.shape[0], 1, 1))
        return delta * mask.astype(delta.dtype) / keep

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_masked: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        b, n, c = x.shape
        h, d = self.num_heads, self.dim // self.num_heads

        # norm1 + qkv + proj live as raw params (same tree names as
        # nn.LayerNorm/nn.Dense) so the whole pre-LN -> qkv -> attention
        # [-> proj -> +x] chain can run as ONE pallas program on TPU; the
        # XLA fallbacks in ops/attention.py compose identical math
        ln_scale, ln_bias = _LnParams(self.dim, name="norm1")()
        w_qkv, b_qkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        w_proj, b_proj = _DenseParams(self.dim, self.dim, name="proj")()
        bias = key_padding_bias(key_masked) if key_masked is not None else None
        if self.init_values is None and (self.drop_path <= 0.0
                                         or deterministic):
            # plain residual branch (the shipped configs at inference, and
            # training with drop_path 0): proj + residual are fusable into
            # the kernel epilogue (attention_block_core dispatches)
            x = attention_block_core(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                     w_proj, b_proj, h, bias,
                                     compute_dtype=self.dtype)
        else:
            # LayerScale/DropPath need the pre-residual branch value
            attn = attention_ln_qkv_core(x, ln_scale, ln_bias, w_qkv, b_qkv,
                                         h, bias, compute_dtype=self.dtype)
            attn = attn_proj_core(attn, w_proj, b_proj,
                                  compute_dtype=self.dtype)
            x = x + self._drop_path(
                self._layer_scale(attn.astype(x.dtype), 'ls1_gamma'),
                deterministic)

        # norm2 + MLP as raw params for the same reason: on TPU the whole
        # LN -> fc1 -> gelu -> fc2 suffix is one pallas program (ViT-B
        # width; larger variants fall back to the composed XLA path)
        ln2_scale, ln2_bias = _LnParams(self.dim, name="norm2")()
        w1, b1, w2, b2 = _MlpParams(self.dim, int(self.dim * self.mlp_ratio),
                                    name="mlp")()
        mlp_out = ln_mlp_core(x, ln2_scale, ln2_bias, w1, b1, w2, b2,
                              compute_dtype=self.dtype)
        x = x + self._drop_path(self._layer_scale(mlp_out, 'ls2_gamma'), deterministic)
        return x


class PatchEmbed(nn.Module):
    """16x16 conv patch embedding shared by template and search streams."""

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        # img: (B, H, W, 3) NHWC -> (B, H/p * W/p, C) row-major tokens
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.xavier_uniform(), name="proj")(img)
        b, gh, gw, c = x.shape
        return x.reshape(b, gh * gw, c)


VIT_VARIANTS = {
    # embed_dim, depth, num_heads  (mae_vit.py:218-242)
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "huge": dict(embed_dim=1280, depth=32, num_heads=16),
}


def vit_variant_from_path(pretrained_path: str) -> str:
    if "large" in pretrained_path:
        return "large"
    if "huge" in pretrained_path:
        return "huge"
    return "base"
