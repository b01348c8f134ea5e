"""BERT text encoder pieces (embeddings + post-LN transformer layers).

Capability parity with the vendored BERT (lib/models/backbones/bert_backbone.py):
word+position+type embeddings with LayerNorm(eps=1e-12), post-LN encoder
layers with erf-GELU intermediate, and the additive (1-mask)*-10000 attention
bias (`embedding`, bert_backbone.py:740-751). Only the pieces the tracker
uses are implemented — the MUFE drives the per-layer loop itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import attention_core


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2

    @staticmethod
    def base() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def large() -> "BertConfig":
        return BertConfig(hidden_size=1024, num_layers=24, num_heads=16,
                          intermediate_size=4096)


def bert_config_from_type(type_str: str) -> BertConfig:
    return BertConfig.large() if "large" in type_str else BertConfig.base()


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        seq = input_ids.shape[1]
        words = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                         param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(seq)[None, :]
        pos = nn.Embed(c.max_position, c.hidden_size, dtype=self.dtype,
                       param_dtype=jnp.float32, name="position_embeddings")(pos_ids)
        types = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                         param_dtype=jnp.float32, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = words + pos + types
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="LayerNorm")(x)


class BertLayer(nn.Module):
    """Post-LN BERT encoder layer taking an additive attention bias."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray | None) -> jnp.ndarray:
        c = self.cfg
        b, n, _ = x.shape
        h, d = c.num_heads, c.hidden_size // c.num_heads

        q = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="value")(x)
        q = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        ctx = attention_core(q, k, v, attn_bias)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, c.hidden_size)

        ctx = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                       name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="attn_norm")(ctx + x)

        y = nn.Dense(c.intermediate_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="output")(y)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="out_norm")(y + x)


def bert_attention_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N) {0,1} mask -> (B, 1, 1, N) additive bias: 0 keep, -10000 drop."""
    return ((1.0 - attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
