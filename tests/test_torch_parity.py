"""Numerical parity of the transformer block math against a hand-written
torch implementation of the same equations (pre-LN ViT block with -1e10 key
masking; post-LN BERT layer with additive bias). Guards the exact op ordering
that the PyTorch-checkpoint converter relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from uvltrack_tpu.models.bert import BertConfig, BertLayer, bert_attention_bias  # noqa: E402
from uvltrack_tpu.models.vit import VitBlock  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`

DIM, HEADS, N, B = 32, 4, 12, 2


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def torch_vit_block(p, x, key_masked):
    """Reference equations: x += proj(attn(LN1 x)); x += mlp(LN2 x)."""
    ln1 = F.layer_norm(x, (DIM,), _t(p["norm1"]["scale"]), _t(p["norm1"]["bias"]), eps=1e-6)
    qkv = ln1 @ _t(p["qkv"]["kernel"]) + _t(p["qkv"]["bias"])
    q, k, v = qkv.split(DIM, dim=-1)
    d = DIM // HEADS

    def heads(t):
        return t.reshape(B, N, HEADS, d).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = (q @ k.transpose(-2, -1)) * d ** -0.5
    mask = torch.tensor(np.asarray(key_masked))[:, None, None, :]
    scores = scores.masked_fill(mask, -1e10)
    attn = scores.softmax(-1) @ v
    attn = attn.permute(0, 2, 1, 3).reshape(B, N, DIM)
    x = x + attn @ _t(p["proj"]["kernel"]) + _t(p["proj"]["bias"])

    ln2 = F.layer_norm(x, (DIM,), _t(p["norm2"]["scale"]), _t(p["norm2"]["bias"]), eps=1e-6)
    h = F.gelu(ln2 @ _t(p["mlp"]["fc1"]["kernel"]) + _t(p["mlp"]["fc1"]["bias"]))
    x = x + h @ _t(p["mlp"]["fc2"]["kernel"]) + _t(p["mlp"]["fc2"]["bias"])
    return x.numpy()


def test_vit_block_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, N, DIM)).astype(np.float32)
    key_masked = rng.random((B, N)) > 0.7
    key_masked[:, 0] = False  # keep at least one key
    block = VitBlock(DIM, HEADS)
    variables = jax.jit(lambda r: block.init(r, jnp.asarray(x), jnp.asarray(key_masked)))(
        jax.random.PRNGKey(0))
    out_j = jax.jit(lambda v, a, m: block.apply(v, a, m))(
        variables, jnp.asarray(x), jnp.asarray(key_masked))
    with torch.no_grad():
        out_t = torch_vit_block(variables["params"], _t(x), key_masked)
    assert np.allclose(np.asarray(out_j), out_t, atol=2e-5), np.abs(np.asarray(out_j) - out_t).max()


def torch_bert_layer(p, x, attention_mask):
    """Reference equations: post-LN self-attention + FFN, bias=(1-m)*-1e4."""
    cfg_heads, d = 4, DIM // 4
    q = x @ _t(p["query"]["kernel"]) + _t(p["query"]["bias"])
    k = x @ _t(p["key"]["kernel"]) + _t(p["key"]["bias"])
    v = x @ _t(p["value"]["kernel"]) + _t(p["value"]["bias"])

    def heads(t):
        return t.reshape(B, N, cfg_heads, d).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = (q @ k.transpose(-2, -1)) / d ** 0.5
    bias = (1.0 - _t(attention_mask))[:, None, None, :] * -10000.0
    ctx = (scores + bias).softmax(-1) @ v
    ctx = ctx.permute(0, 2, 1, 3).reshape(B, N, DIM)
    ctx = ctx @ _t(p["attn_out"]["kernel"]) + _t(p["attn_out"]["bias"])
    x = F.layer_norm(ctx + x, (DIM,), _t(p["attn_norm"]["scale"]),
                     _t(p["attn_norm"]["bias"]), eps=1e-12)
    h = F.gelu(x @ _t(p["intermediate"]["kernel"]) + _t(p["intermediate"]["bias"]))
    h = h @ _t(p["output"]["kernel"]) + _t(p["output"]["bias"])
    return F.layer_norm(h + x, (DIM,), _t(p["out_norm"]["scale"]),
                        _t(p["out_norm"]["bias"]), eps=1e-12).numpy()


def test_bert_layer_matches_torch():
    cfg = BertConfig(vocab_size=50, hidden_size=DIM, num_layers=1, num_heads=4,
                     intermediate_size=64, max_position=16)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, N, DIM)).astype(np.float32)
    attn_mask = (rng.random((B, N)) > 0.3).astype(np.float32)
    attn_mask[:, 0] = 1.0
    layer = BertLayer(cfg)
    bias = bert_attention_bias(jnp.asarray(attn_mask))
    variables = jax.jit(lambda r: layer.init(r, jnp.asarray(x), bias))(jax.random.PRNGKey(0))
    out_j = jax.jit(lambda v, a, b_: layer.apply(v, a, b_))(variables, jnp.asarray(x), bias)
    with torch.no_grad():
        out_t = torch_bert_layer(variables["params"], _t(x), attn_mask)
    assert np.allclose(np.asarray(out_j), out_t, atol=2e-5), np.abs(np.asarray(out_j) - out_t).max()
