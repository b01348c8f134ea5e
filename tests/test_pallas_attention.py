"""Kernel-level tests for the fused Pallas attention (interpret mode, CPU).

The production path only engages on TPU (pallas_attention gates on platform);
here the same kernel body runs under the Pallas interpreter so the math —
clamp-instead-of-max softmax, late division, key-padding bias — is locked on
every backend. Perf evidence lives in scripts/bench_attention.py (real chip).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.ops.attention import xla_attention
from uvltrack_tpu.ops.pallas_attention import _HAS_PALLAS, fused_attention

pytestmark = pytest.mark.skipif(not _HAS_PALLAS, reason="no pallas")


def _case(b, h, n, d, seed=0, mask_frac=0.3):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    masked = rng.random((b, n)) < mask_frac
    masked[:, 0] = False  # never mask every key
    key_bias = jnp.asarray(np.where(masked, -1e10, 0.0), jnp.float32)
    return q, k, v, key_bias


# 48: generic small; 361: tracking joint sequence (256 search); 681:
# grounding-pretrain joint sequence (384 search -> 576 search tokens + 64
# template + 40 text + 1 cls, baseline_base_grounding.yaml:12) — N is the
# only shape axis the kernel's block specs depend on, so both shipped
# training geometries are locked here.
@pytest.mark.parametrize("n", [48, 361, 681])
def test_kernel_matches_xla_masked(n):
    q, k, v, key_bias = _case(2, 2 if n > 64 else 3, n, 16)
    out = fused_attention(q, k, v, key_bias, interpret=True)
    ref = xla_attention(q, k, v, key_bias[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # masked keys receive (numerically) zero attention: perturbing their
    # values must not change the output
    v2 = v + jnp.where(key_bias[:, None, :, None] < 0, 100.0, 0.0)
    out2 = fused_attention(q, k, v2, key_bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               atol=2e-5, rtol=1e-4)


def test_kernel_no_mask_and_large_logits():
    q, k, v, key_bias = _case(1, 2, 32, 8, mask_frac=0.0)
    # large-but-unclamped logits: exp() without max-subtraction reaches ~e^60
    # and the late division must still reproduce the exact softmax. (Beyond
    # the ±80 clamp the kernel saturates — trained attention logits are O(10),
    # and the clamp exists only so the -1e10 mask bias survives exp.)
    q = q * 15.0
    logits = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    assert np.abs(logits).max() < 80.0  # stays in the exact region
    out = np.asarray(fused_attention(q, k, v, key_bias, interpret=True))
    assert np.isfinite(out).all()
    ref = np.asarray(xla_attention(q, k, v, key_bias[:, None, None, :]))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("n", [48, 681])
def test_qkv_native_kernel_matches_classic(n):
    """The layout-native kernel (raw (B,N,3HD) fused-Dense input, head
    slices inside VMEM) must equal the classic (B,H,N,D) kernel and XLA —
    at the generic size and at the grounding-pretrain joint length."""
    from uvltrack_tpu.ops.pallas_attention import fused_attention_qkv

    b, h, d = (2, 4, 16) if n < 64 else (1, 2, 64)
    q, k, v, key_bias = _case(b, h, n, d, seed=3)
    # pack [q|k|v] x head x dim the way the Dense + reshape produces it
    qkv = jnp.concatenate([
        q.transpose(0, 2, 1, 3).reshape(b, n, h * d),
        k.transpose(0, 2, 1, 3).reshape(b, n, h * d),
        v.transpose(0, 2, 1, 3).reshape(b, n, h * d),
    ], axis=-1)
    out = fused_attention_qkv(qkv, key_bias, heads=h, interpret=True)
    ref = xla_attention(q, k, v, key_bias[:, None, None, :])
    ref = jnp.transpose(ref, (0, 2, 1, 3)).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_attention_qkv_core_xla_fallback_matches():
    """attention_qkv_core on the XLA backend must reproduce the classic
    reshape/transpose path bit-for-bit (it IS that path)."""
    from uvltrack_tpu.ops.attention import attention_qkv_core

    b, h, n, d = 2, 3, 40, 8
    q, k, v, key_bias = _case(b, h, n, d, seed=4)
    qkv = jnp.concatenate([
        q.transpose(0, 2, 1, 3).reshape(b, n, h * d),
        k.transpose(0, 2, 1, 3).reshape(b, n, h * d),
        v.transpose(0, 2, 1, 3).reshape(b, n, h * d),
    ], axis=-1)
    out = attention_qkv_core(qkv, h, key_bias[:, None, None, :])
    ref = xla_attention(q, k, v, key_bias[:, None, None, :])
    ref = jnp.transpose(ref, (0, 2, 1, 3)).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_qkv_attention_custom_vjp_gradients():
    """Training differentiates through the kernel: the custom VJP recomputes
    the backward with XLA math — its gradients must match grad of the pure
    einsum path."""
    import jax

    from uvltrack_tpu.ops import pallas_attention as pa

    b, h, n, d = 1, 2, 32, 8
    q, k, v, key_bias = _case(b, h, n, d, seed=5)
    qkv = jnp.concatenate([
        q.transpose(0, 2, 1, 3).reshape(b, n, h * d),
        k.transpose(0, 2, 1, 3).reshape(b, n, h * d),
        v.transpose(0, 2, 1, 3).reshape(b, n, h * d),
    ], axis=-1)

    def loss_kernel(x):
        return (pa._qkv_attention_trainable(h, x, key_bias) ** 2).sum()

    def loss_xla(x):
        return (pa._xla_qkv_attention(x, key_bias, h) ** 2).sum()

    pa._FORCE_INTERPRET = True
    try:
        g_kernel = jax.grad(loss_kernel)(qkv)
        g_xla = jax.grad(loss_xla)(qkv)
    finally:
        pa._FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_xla),
                               atol=2e-4, rtol=1e-3)


def test_custom_vjp_backward_is_clamp_consistent():
    """Where the kernel's ±80 clamp saturates, the backward must describe
    the clamped function (zero grad through saturated scores), not the exact
    softmax — otherwise forward and backward disagree."""
    import jax

    from uvltrack_tpu.ops import pallas_attention as pa

    b, h, n, d = 1, 1, 8, 8
    rng = np.random.default_rng(9)
    # huge q pushes some scores beyond +80 -> clamp active
    q = jnp.asarray(rng.normal(size=(b, h, n, d)) * 60.0, jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    kb = jnp.zeros((b, n), jnp.float32)
    qkv = jnp.concatenate([
        x.transpose(0, 2, 1, 3).reshape(b, n, h * d) for x in (q, k, v)], -1)
    s = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k)) / np.sqrt(d)
    assert (np.abs(s) > 80).any()  # clamp genuinely active

    def loss_kernel(x):
        return (pa._qkv_attention_trainable(h, x, kb) ** 2).sum()

    def loss_clamped(x):
        return (pa._xla_qkv_attention(x, kb, h, clamp=True) ** 2).sum()

    pa._FORCE_INTERPRET = True
    try:
        out_kernel = jax.jit(lambda x: pa._qkv_attention_trainable(h, x, kb))(qkv)
        g_kernel = jax.jit(jax.grad(loss_kernel))(qkv)
    finally:
        pa._FORCE_INTERPRET = False
    out_clamped = jax.jit(lambda x: pa._xla_qkv_attention(x, kb, h, clamp=True))(qkv)
    g_clamped = jax.jit(jax.grad(loss_clamped))(qkv)
    # forward agrees with the clamped reference...
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_clamped),
                               rtol=1e-4, atol=1e-5)
    # ...and so does the gradient
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_clamped),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n", [48, 361])
def test_fused_ln_qkv_attention_matches_xla(n):
    """Prologue-folded kernel (LN + qkv matmul + bias + attention in one
    program) vs the composed reference math."""
    import jax

    from uvltrack_tpu.ops.pallas_attention import (_xla_ln_qkv_attention,
                                                   fused_ln_qkv_attention)

    b, h, c = 1, 4, 64
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / np.sqrt(c), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    masked = rng.random((b, n)) < 0.3
    masked[:, 0] = False
    kb = jnp.asarray(np.where(masked, -1e10, 0.0), jnp.float32)

    out = fused_ln_qkv_attention(x, g, be, w, wb, kb, heads=h,
                                 interpret=True)
    ref = _xla_ln_qkv_attention(x, g, be, w, wb, kb, heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)

    # flax-LayerNorm consistency: the composed reference equals
    # nn.LayerNorm(fp32) -> Dense -> attention on the same weights
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    y = ln.apply({"params": {"scale": g, "bias": be}}, x)
    qkv = y @ w + wb
    from uvltrack_tpu.ops.attention import attention_qkv_core

    ref2 = attention_qkv_core(qkv, h, kb[:, None, None, :])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ref2),
                               atol=5e-5, rtol=5e-4)


def test_ln_qkv_attention_custom_vjp_gradients():
    """Backward of the folded kernel recomputes in XLA math: gradients wrt
    every input match grad of the pure composed function."""
    import jax

    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, h, c = 1, 32, 2, 16
    rng = np.random.default_rng(8)
    args = (
        jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32),
        jnp.zeros((b, n), jnp.float32),
    )

    def loss_kernel(*a):
        return (pa.ln_qkv_attention_trainable(h, 1e-6, *a) ** 2).sum()

    def loss_xla(*a):
        return (pa._xla_ln_qkv_attention(*a, heads=h, clamp=True) ** 2).sum()

    pa._FORCE_INTERPRET = True
    try:
        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(*args)
    finally:
        pa._FORCE_INTERPRET = False
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for gk, gx in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   atol=5e-4, rtol=2e-3)


@pytest.mark.parametrize("n", [48, 361])
def test_fused_ln_mlp_matches_xla(n):
    """MLP-suffix kernel (LN + fc1 + exact gelu + fc2 in one program) vs
    the composed reference math and flax LayerNorm+Mlp."""
    from uvltrack_tpu.ops.pallas_attention import _xla_ln_mlp, fused_ln_mlp

    b, c, f = 1, 64, 256
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, f)) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, c)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)

    out = fused_ln_mlp(x, g, be, w1, b1, w2, b2, interpret=True)
    ref = _xla_ln_mlp(x, g, be, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)

    # flax-consistency: LayerNorm(fp32) -> Mlp on the same weights
    import flax.linen as nn

    from uvltrack_tpu.models.vit import Mlp

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    y = ln.apply({"params": {"scale": g, "bias": be}}, x)
    mlp = Mlp(f, c, jnp.float32)
    ref2 = mlp.apply({"params": {"fc1": {"kernel": w1, "bias": b1},
                                 "fc2": {"kernel": w2, "bias": b2}}}, y)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ref2),
                               atol=5e-5, rtol=5e-4)


def test_ln_mlp_custom_vjp_gradients():
    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, c, f = 1, 32, 16, 64
    rng = np.random.default_rng(13)
    args = tuple(jnp.asarray(a, jnp.float32) for a in (
        rng.normal(size=(b, n, c)),
        rng.normal(size=(c,)) * 0.1 + 1.0,
        rng.normal(size=(c,)) * 0.1,
        rng.normal(size=(c, f)) / 4.0,
        rng.normal(size=(f,)) * 0.02,
        rng.normal(size=(f, c)) / 8.0,
        rng.normal(size=(c,)) * 0.02,
    ))
    import jax

    def loss_kernel(*a):
        return (pa.ln_mlp_trainable(1e-6, *a) ** 2).sum()

    def loss_xla(*a):
        return (pa._xla_ln_mlp(*a) ** 2).sum()

    pa._FORCE_INTERPRET = True
    try:
        g_kernel = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    finally:
        pa._FORCE_INTERPRET = False
    g_xla = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    for gk, gx in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   atol=5e-4, rtol=2e-3)


@pytest.mark.parametrize("n", [48, 361])
def test_fused_ln_qkv_attn_proj_matches_xla(n):
    """Full-branch kernel (LN + qkv + attention + proj + residual in one
    program) vs the composed reference math and the flax module chain."""
    from uvltrack_tpu.ops.pallas_attention import (_xla_ln_qkv_attn_proj,
                                                   fused_ln_qkv_attn_proj)

    b, h, c = 1, 4, 64
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / np.sqrt(c), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(c, c)) / np.sqrt(c), jnp.float32)
    bp = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    masked = rng.random((b, n)) < 0.3
    masked[:, 0] = False
    kb = jnp.asarray(np.where(masked, -1e10, 0.0), jnp.float32)

    out = fused_ln_qkv_attn_proj(x, g, be, w, wb, wp, bp, kb, heads=h,
                                 interpret=True)
    ref = _xla_ln_qkv_attn_proj(x, g, be, w, wb, wp, bp, kb, heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)

    # flax-consistency: LayerNorm(fp32) -> Dense(qkv) -> attention ->
    # Dense(proj) -> +x on the same weights
    import flax.linen as nn

    from uvltrack_tpu.ops.attention import attention_qkv_core

    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    y = ln.apply({"params": {"scale": g, "bias": be}}, x)
    attn = attention_qkv_core(y @ w + wb, h, kb[:, None, None, :])
    ref2 = x + (attn @ wp + bp)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ref2),
                               atol=5e-5, rtol=5e-4)


def test_ln_qkv_attn_proj_custom_vjp_gradients():
    """Backward of the full-branch kernel recomputes in XLA math: gradients
    wrt every input (incl. the proj weights and the residual stream) match
    grad of the pure composed function."""
    import jax

    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, h, c = 1, 32, 2, 16
    rng = np.random.default_rng(32)
    args = (
        jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32),
        jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32),
        jnp.asarray(rng.normal(size=(c, c)) / 4.0, jnp.float32),
        jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32),
        jnp.zeros((b, n), jnp.float32),
    )

    def loss_kernel(*a):
        return (pa.ln_qkv_attn_proj_trainable(h, 1e-6, *a) ** 2).sum()

    def loss_xla(*a):
        return (pa._xla_ln_qkv_attn_proj(*a, heads=h, clamp=True) ** 2).sum()

    pa._FORCE_INTERPRET = True
    try:
        g_kernel = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    finally:
        pa._FORCE_INTERPRET = False
    g_xla = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    for gk, gx in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   atol=5e-4, rtol=2e-3)


def test_fused_proj_dispatch_and_default_off(monkeypatch):
    """attention_block_core: UVLTRACK_FUSED_PROJ=1 on the pallas backend
    takes the full-branch kernel; the default (unset) composes the prefix
    path + shared proj math — and both agree numerically."""
    from uvltrack_tpu.ops import attention as att
    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, h, c = 1, 160, 2, 16  # n >= min_seq_len so the gates are live
    rng = np.random.default_rng(33)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(c, c)) / 4.0, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    bias = jnp.zeros((b, 1, 1, n), jnp.float32)

    calls = {"proj_kernel": 0}
    real = pa.ln_qkv_attn_proj_trainable

    def spy(heads, eps, *a):
        calls["proj_kernel"] += 1
        return real(heads, eps, *a)

    monkeypatch.setattr(pa, "ln_qkv_attn_proj_trainable", spy)
    monkeypatch.setattr(pa, "_on_tpu", lambda: True)
    monkeypatch.setattr(pa, "_FORCE_INTERPRET", True)
    monkeypatch.delenv("UVLTRACK_FUSED_PROJ", raising=False)
    att.set_backend("pallas")
    try:
        out_default = att.attention_block_core(x, g, be, w, wb, wp, bp, h,
                                               bias)
        assert calls["proj_kernel"] == 0  # default off until measured
        monkeypatch.setenv("UVLTRACK_FUSED_PROJ", "1")
        out_fused = att.attention_block_core(x, g, be, w, wb, wp, bp, h,
                                             bias)
        assert calls["proj_kernel"] == 1
    finally:
        att.set_backend("xla")
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_default),
                               atol=2e-5, rtol=2e-4)
    # XLA-backend composition (the CPU/parity path) agrees too
    out_xla = att.attention_block_core(x, g, be, w, wb, wp, bp, h, bias)
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_default),
                               atol=2e-5, rtol=2e-4)


def test_vitblock_matches_flax_composition():
    """VitBlock with raw param holders (post proj-refactor) must reproduce
    the hand-composed flax chain (LayerNorm -> Dense qkv -> attention ->
    Dense proj -> +x -> LayerNorm -> Mlp -> +x) on the same weights."""
    import flax.linen as nn
    import jax

    from uvltrack_tpu.models.vit import Mlp, VitBlock
    from uvltrack_tpu.ops.attention import attention_qkv_core

    b, n, h, c = 2, 48, 4, 32
    rng = np.random.default_rng(34)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    masked = rng.random((b, n)) < 0.25
    masked[:, 0] = False
    key_masked = jnp.asarray(masked)

    block = VitBlock(dim=c, num_heads=h, dtype=jnp.float32)
    variables = jax.jit(block.init)(jax.random.PRNGKey(0), x, key_masked)
    out = jax.jit(block.apply)(variables, x, key_masked)

    p = variables["params"]
    ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    y = ln.apply({"params": p["norm1"]}, x)
    qkv = y @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    kb = jnp.where(key_masked, -1e10, 0.0).astype(jnp.float32)
    attn = attention_qkv_core(qkv, h, kb[:, None, None, :])
    x1 = x + (attn @ p["proj"]["kernel"] + p["proj"]["bias"])
    y2 = ln.apply({"params": p["norm2"]}, x1)
    mlp = Mlp(4 * c, c, jnp.float32)
    ref = x1 + mlp.apply({"params": p["mlp"]}, y2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=5e-5)


def test_fused_prefix_zero_reverts_to_qkv_kernel(monkeypatch):
    """UVLTRACK_FUSED_PREFIX=0 on the pallas backend must revert to step 3
    (LN + qkv Dense in XLA, attention still in the qkv-native kernel) so the
    knob A/Bs ONLY the prefix fusion — not silently disable the whole pallas
    backend. And the eps argument must thread into every path."""
    import jax

    from uvltrack_tpu.ops import attention as att
    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, h, c = 1, 160, 2, 16  # n >= min_seq_len so the gates are live
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    bias = jnp.zeros((b, 1, 1, n), jnp.float32)

    calls = {"qkv_kernel": 0, "fused": 0}
    real_qkv = pa._qkv_attention_trainable
    real_fused = pa.ln_qkv_attention_trainable

    def spy_qkv(heads, qkv, kb):
        calls["qkv_kernel"] += 1
        return real_qkv(heads, qkv, kb)

    def spy_fused(heads, eps, *a):
        calls["fused"] += 1
        return real_fused(heads, eps, *a)

    monkeypatch.setattr(pa, "_qkv_attention_trainable", spy_qkv)
    monkeypatch.setattr(pa, "ln_qkv_attention_trainable", spy_fused)
    monkeypatch.setattr(pa, "_on_tpu", lambda: True)
    monkeypatch.setattr(pa, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("UVLTRACK_FUSED_PREFIX", "0")
    att.set_backend("pallas")
    try:
        out = att.attention_ln_qkv_core(x, g, be, w, wb, h, bias)
    finally:
        att.set_backend("xla")
    assert calls["qkv_kernel"] == 1 and calls["fused"] == 0
    ref = pa._xla_ln_qkv_attention(x, g, be, w, wb,
                                   jnp.zeros((b, n), jnp.float32), h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)

    # FUSED_PREFIX=1 takes the fused kernel, with eps threaded through
    monkeypatch.setenv("UVLTRACK_FUSED_PREFIX", "1")
    att.set_backend("pallas")
    try:
        out2 = att.attention_ln_qkv_core(x, g, be, w, wb, h, bias, eps=1e-2)
    finally:
        att.set_backend("xla")
    assert calls["fused"] == 1
    ref2 = pa._xla_ln_qkv_attention(x, g, be, w, wb,
                                    jnp.zeros((b, n), jnp.float32), h,
                                    eps=1e-2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-4)
    # a non-default eps visibly changes the output (the old code dropped it)
    assert not np.allclose(np.asarray(out2), np.asarray(out), atol=1e-4)


def test_fused_vmem_cap_falls_back_to_qkv_kernel(monkeypatch):
    """Geometries whose VMEM estimate exceeds UVLTRACK_FUSED_VMEM_MB must
    fall through to the qkv-native kernel (step 3), not attempt a fused
    program that might not compile (ViT-H-class widths)."""
    from uvltrack_tpu.ops import attention as att
    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, h, c = 1, 160, 2, 16
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    bias = jnp.zeros((b, 1, 1, n), jnp.float32)

    calls = {"qkv": 0, "fused": 0}
    real_qkv = pa._qkv_attention_trainable
    real_fused = pa.ln_qkv_attention_trainable
    monkeypatch.setattr(pa, "_qkv_attention_trainable",
                        lambda *a: (calls.__setitem__("qkv", calls["qkv"] + 1),
                                    real_qkv(*a))[1])
    monkeypatch.setattr(pa, "ln_qkv_attention_trainable",
                        lambda *a: (calls.__setitem__("fused", calls["fused"] + 1),
                                    real_fused(*a))[1])
    monkeypatch.setattr(pa, "_on_tpu", lambda: True)
    monkeypatch.setattr(pa, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("UVLTRACK_FUSED_VMEM_MB", "0")  # force over-cap
    att.set_backend("pallas")
    try:
        out = att.attention_ln_qkv_core(x, g, be, w, wb, h, bias)
    finally:
        att.set_backend("xla")
    assert calls["qkv"] == 1 and calls["fused"] == 0
    ref = pa._xla_ln_qkv_attention(x, g, be, w, wb,
                                   jnp.zeros((b, n), jnp.float32), h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_generic_bias_path_matches_key_padding_numerics():
    """A non-key-padding bias shape must go through the SAME shared LN+qkv
    math (fp32-accumulated matmul, fp32 bias add) as the key-padding path —
    identical inputs may not produce different activations purely because
    the bias was reshaped."""
    from uvltrack_tpu.ops import attention as att
    from uvltrack_tpu.ops import pallas_attention as pa

    b, n, h, c = 1, 48, 2, 16
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    kb_row = jnp.zeros((n,), jnp.float32).at[-5:].set(-1e10)
    key_pad = jnp.tile(kb_row[None, None, None, :], (b, 1, 1, 1))
    generic = jnp.tile(kb_row[None, None, None, :], (b, 1, n, 1))  # (B,1,N,N)

    out_kp = att.attention_ln_qkv_core(x, g, be, w, wb, h, key_pad)
    out_gen = att.attention_ln_qkv_core(x, g, be, w, wb, h, generic)
    np.testing.assert_allclose(np.asarray(out_gen), np.asarray(out_kp),
                               atol=2e-5, rtol=2e-4)
