"""Weight-only int8 quantization (ops/quant.py): scale math, lazy dequant,
the q8 Pallas kernels (interpret mode), tree surgery and model-level drift.

The perf claim (halving the weight-read stream at bs=1) is chip-side —
UVLTRACK_BENCH_QUANT=int8 in bench.py; here the MATH is locked on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.ops import pallas_attention as pa
from uvltrack_tpu.ops.quant import (QuantizedTensor, count_quantized,
                                    materialize_weight, quant_dot,
                                    quantize_vit_params, quantize_weight)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not pa._HAS_PALLAS, reason="no pallas")]


def test_quantize_weight_error_bound_and_layout():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.3, jnp.float32)
    qt = quantize_weight(w)
    assert qt.q.dtype == jnp.int8 and qt.q.shape == w.shape
    assert qt.scale.shape == (96,)
    # symmetric per-channel: |w - q*scale| <= scale/2 everywhere
    err = np.abs(np.asarray(qt.materialize(jnp.float32)) - np.asarray(w))
    bound = np.asarray(qt.scale)[None, :] * 0.5 + 1e-8
    assert (err <= bound).all()
    # astype changes only the logical compute dtype; the payload stays int8
    qb = qt.astype(jnp.bfloat16)
    assert qb.dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(qb)[0].dtype == jnp.int8
    assert qb.materialize().dtype == jnp.bfloat16


def test_quant_dot_equals_materialized_dot():
    """quant_dot contracts the int8 payload and lifts the per-column scale
    out — must equal dot against the dense dequantized weight exactly (the
    scale factors out of the contraction)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(48, 80)) * 0.2, jnp.float32)
    y = jnp.asarray(rng.normal(size=(10, 48)), jnp.float32)
    qt = quantize_weight(w)
    out_q = jax.jit(quant_dot)(y, qt)
    out_d = jnp.dot(y, qt.materialize(jnp.float32),
                    preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               atol=1e-4, rtol=1e-5)


def test_shared_math_handles_quantized_weights():
    """_xla_ln_qkv / _xla_proj / _xla_ln_mlp accept QuantizedTensor weights
    and match themselves on the materialized dense weights."""
    rng = np.random.default_rng(2)
    b, n, c = 1, 24, 32
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    qt = quantize_weight(w)
    out_q = jax.jit(pa._xla_ln_qkv)(x, g, be, qt, wb)
    out_d = jax.jit(pa._xla_ln_qkv)(x, g, be, qt.materialize(jnp.float32), wb)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               atol=1e-5, rtol=1e-5)

    wp = jnp.asarray(rng.normal(size=(c, c)) / 4.0, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    attn = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    qp = quantize_weight(wp)
    np.testing.assert_allclose(
        np.asarray(jax.jit(pa._xla_proj)(attn, qp, bp)),
        np.asarray(jax.jit(pa._xla_proj)(attn, qp.materialize(jnp.float32), bp)),
        atol=1e-5, rtol=1e-5)

    f = 4 * c
    w1 = jnp.asarray(rng.normal(size=(c, f)) / 4.0, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, c)) / 8.0, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    q1, q2 = quantize_weight(w1), quantize_weight(w2)
    out_q = jax.jit(pa._xla_ln_mlp)(x, g, be, q1, b1, q2, b2)
    out_d = jax.jit(pa._xla_ln_mlp)(x, g, be, q1.materialize(jnp.float32),
                                    b1, q2.materialize(jnp.float32), b2)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n", [48, 361])
def test_q8_prefix_kernel_matches_xla_quant_path(n):
    """fused_ln_qkv_attention_q8 (int8 payload + scale as kernel operands,
    interpret mode) vs the XLA quant composition."""
    rng = np.random.default_rng(3)
    b, h, c = 1, 4, 64
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / np.sqrt(c), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    masked = rng.random((b, n)) < 0.3
    masked[:, 0] = False
    kb = jnp.asarray(np.where(masked, -1e10, 0.0), jnp.float32)
    qt = quantize_weight(w)

    out = pa.fused_ln_qkv_attention_q8(x, g, be, qt.q, qt.scale, wb, kb,
                                       heads=h, interpret=True)
    ref = pa._xla_ln_qkv_attention(x, g, be, qt, wb, kb, heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_q8_proj_kernel_matches_xla_quant_path():
    rng = np.random.default_rng(4)
    b, n, h, c = 1, 48, 4, 64
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / np.sqrt(c), jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(c, c)) / np.sqrt(c), jnp.float32)
    bp = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    kb = jnp.zeros((b, n), jnp.float32)
    qt, qp = quantize_weight(w), quantize_weight(wp)

    out = pa.fused_ln_qkv_attn_proj_q8(x, g, be, qt.q, qt.scale, wb,
                                       qp.q, qp.scale, bp, kb, heads=h,
                                       interpret=True)
    ref = pa._xla_ln_qkv_attn_proj(x, g, be, qt, wb, qp, bp, kb, heads=h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_qconv_matches_nn_conv_and_quantizes():
    """QConv's fp path reproduces nn.Conv bit-for-bit on the same weights
    (it replaced it in ConvBnRelu); the quantized path matches the dense
    dequantized conv (scale factors out of the contraction)."""
    import flax.linen as nn

    from uvltrack_tpu.models.head import QConv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    qc = QConv(24)
    v = qc.init(jax.random.PRNGKey(0), x)
    out = jax.jit(qc.apply)(v, x)
    ref_conv = nn.Conv(24, (3, 3), padding=1, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    ref = jax.jit(ref_conv.apply)(
        {"params": {"kernel": v["params"]["kernel"],
                    "bias": v["params"]["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)

    qt = quantize_weight(v["params"]["kernel"])
    assert qt.scale.shape == (24,)
    vq = {"params": {"kernel": qt, "bias": v["params"]["bias"]}}
    out_q = jax.jit(qc.apply)(vq, x)
    dense = {"params": {"kernel": qt.materialize(jnp.float32),
                        "bias": v["params"]["bias"]}}
    out_d = jax.jit(qc.apply)(dense, x)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               atol=1e-4, rtol=1e-4)


def test_quant_dispatch_selects_q8_kernels(monkeypatch):
    """attention_ln_qkv_core / attention_block_core with QuantizedTensor
    weights on the pallas backend must take the q8 kernels."""
    from uvltrack_tpu.ops import attention as att

    b, n, h, c = 1, 160, 2, 16
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, 3 * c)) / 4.0, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(3 * c,)) * 0.02, jnp.float32)
    wp = jnp.asarray(rng.normal(size=(c, c)) / 4.0, jnp.float32)
    bp = jnp.asarray(rng.normal(size=(c,)) * 0.02, jnp.float32)
    bias = jnp.zeros((b, 1, 1, n), jnp.float32)
    qt, qp = quantize_weight(w), quantize_weight(wp)

    calls = {"q8": 0, "q8proj": 0}
    real_q8 = pa.fused_ln_qkv_attention_q8
    real_q8p = pa.fused_ln_qkv_attn_proj_q8
    monkeypatch.setattr(pa, "fused_ln_qkv_attention_q8",
                        lambda *a, **k: (calls.__setitem__("q8", calls["q8"] + 1),
                                         real_q8(*a, **k))[1])
    monkeypatch.setattr(pa, "fused_ln_qkv_attn_proj_q8",
                        lambda *a, **k: (calls.__setitem__("q8proj", calls["q8proj"] + 1),
                                         real_q8p(*a, **k))[1])
    monkeypatch.setattr(pa, "_on_tpu", lambda: True)
    monkeypatch.setattr(pa, "_FORCE_INTERPRET", True)
    att.set_backend("pallas")
    try:
        out1 = att.attention_ln_qkv_core(x, g, be, qt, wb, h, bias)
        monkeypatch.setenv("UVLTRACK_FUSED_PROJ", "1")
        out2 = att.attention_block_core(x, g, be, qt, wb, qp, bp, h, bias)
    finally:
        att.set_backend("xla")
    assert calls["q8"] == 1 and calls["q8proj"] == 1
    ref1 = pa._xla_ln_qkv_attention(x, g, be, qt, wb,
                                    jnp.zeros((b, n), jnp.float32), h)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=2e-5, rtol=2e-4)
    ref2 = pa._xla_ln_qkv_attn_proj(x, g, be, qt, wb, qp, bp,
                                    jnp.zeros((b, n), jnp.float32), h)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-4)


def test_quantize_vit_params_tree_surgery_and_model_drift():
    """quantize_vit_params replaces exactly the block matmul kernels (4 per
    VitBlock) and the quantized model's forward_test stays close to fp."""
    from tests.test_model import tiny_inputs, tiny_model
    from uvltrack_tpu.models.uvltrack import UVLTrack

    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    params_q = quantize_vit_params(variables["params"], min_dim=1)
    depth = 4  # TINY depth
    # 4 matmul kernels per VitBlock + 4 tower convs x 4 stages in the head
    assert count_quantized(params_q) == 4 * depth + 16
    assert isinstance(params_q["head"]["conv_cls"]["stage_0"]["conv"]["kernel"],
                      QuantizedTensor)
    # non-block leaves untouched
    assert not isinstance(params_q["backbone"]["patch_embed"]["proj"]["kernel"],
                          QuantizedTensor)
    assert not isinstance(params_q["head"]["conv_cls"]["final"]["kernel"],
                          QuantizedTensor)

    template, search, text_ids, text_mask, *_ = inp
    b = template.shape[0]
    prompt = jnp.asarray(np.random.default_rng(7).normal(size=(b, 3, 32)),
                         jnp.float32)
    flag = jnp.full((b,), 2, jnp.int32)
    fwd = jax.jit(lambda v, *a: model.apply(
        v, *a, method=UVLTrack.forward_test))
    out_fp = fwd(variables, template, search, text_ids, text_mask, prompt,
                 flag)
    out_q = fwd(dict(variables, params=params_q), template, search,
                text_ids, text_mask, prompt, flag)
    # weight-only per-channel int8 on random fp32 weights: small relative
    # drift on every output head
    for k in ("bbox_map", "cls_score_test"):
        a, bq = np.asarray(out_fp[k]), np.asarray(out_q[k])
        denom = np.abs(a).max() + 1e-6
        assert np.abs(a - bq).max() / denom < 0.05, k


def test_quantized_tracker_tracks_close_to_fp(monkeypatch):
    """End-to-end: a bf16 Tracker with WEIGHT_QUANT='int8' follows the fp
    tracker's boxes on synthetic frames (the shipped serving configuration:
    bf16 compute + int8 weights)."""
    from uvltrack_tpu.config import default_cfg
    from uvltrack_tpu.ops import quant as quant_mod
    from uvltrack_tpu.track.tracker import Tracker
    from tests.test_model import NT, tiny_inputs, tiny_model

    def cfgmk(quant):
        c = default_cfg()
        c.DATA.TEMPLATE.SIZE = 32
        c.DATA.SEARCH.SIZE = 64
        c.TEST.TEMPLATE_SIZE = 32
        c.TEST.SEARCH_SIZE = 64
        c.TEST.TEMPLATE_FACTOR = 2.0
        c.TEST.SEARCH_FACTOR = 4.0
        c.TEST.MODE = "BBOX"
        c.TEST.UPDATE_INTERVAL = 100
        c.TEST.THRESHOLD = 2.0  # no prompt refresh: deterministic compare
        c.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN = NT
        c.TPU.WEIGHT_QUANT = "int8" if quant else ""
        return c

    real = quant_mod.quantize_vit_params
    monkeypatch.setattr(quant_mod, "quantize_vit_params",
                        lambda p, min_dim=128: real(p, min_dim=1))
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(4)]
    boxes = {}
    for name, quant in (("fp", False), ("q8", True)):
        t = Tracker(cfgmk(quant), model, variables, tokenizer=None)
        t.initialize(frames[0], {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
        boxes[name] = [t.track(f)["target_bbox"] for f in frames[1:]]
    # closeness criterion: per-frame IoU, not per-coordinate atol. The box
    # comes off a heatmap ARGMAX, so int8 noise on a tiny random model can
    # legitimately move the peak by one cell (several px) without meaning
    # the quantized tracker diverged — a per-coordinate atol=2.0 rode on
    # argmax luck and flipped when the r4 crop-parity change perturbed the
    # inputs. IoU >= 0.7 still fails hard if q8 actually loses the target.
    from uvltrack_tpu.core.box_ops import box_iou, box_xywh_to_xyxy

    for bf, bq in zip(boxes["fp"], boxes["q8"]):
        iou, _ = box_iou(
            box_xywh_to_xyxy(jnp.asarray([bf], jnp.float32)),
            box_xywh_to_xyxy(jnp.asarray([bq], jnp.float32)))
        assert float(iou.reshape(-1)[0]) >= 0.7, (bf, bq, np.asarray(iou))

    # the scan-chunked path (what bench.py measures) must carry the
    # QuantizedTensor leaves through lax.scan too
    t = Tracker(cfgmk(True), model, variables, tokenizer=None)
    t.initialize(frames[0], {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    packed = t.track_many(frames[1:], chunk=3)
    assert np.isfinite(np.asarray(packed)).all()
    np.testing.assert_allclose(np.asarray(packed)[:, :4],
                               np.stack([np.asarray(b) for b in boxes["q8"]]),
                               atol=1e-3)


def test_tracker_build_applies_weight_quant(monkeypatch):
    """cfg.TPU.WEIGHT_QUANT='int8' quantizes the JitTracker's variables at
    build (min_dim gate keeps toy models fp — patch it down for the test)."""
    from uvltrack_tpu.config import default_cfg
    from uvltrack_tpu.ops import quant as quant_mod
    from uvltrack_tpu.track.tracker import JitTracker
    from tests.test_model import tiny_inputs, tiny_model

    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.WEIGHT_QUANT = "int8"
    cfg.TEST.SEARCH_SIZE = 64
    cfg.TEST.TEMPLATE_SIZE = 32
    real = quant_mod.quantize_vit_params
    monkeypatch.setattr(quant_mod, "quantize_vit_params",
                        lambda p, min_dim=128: real(p, min_dim=1))
    jt = JitTracker(model, variables, cfg)
    assert count_quantized(jt.variables["params"]) == 32  # 16 vit + 16 conv

    cfg2 = default_cfg()
    cfg2.TPU.COMPUTE_DTYPE = "float32"
    cfg2.TPU.WEIGHT_QUANT = "nope"
    cfg2.TEST.SEARCH_SIZE = 64
    cfg2.TEST.TEMPLATE_SIZE = 32
    with pytest.raises(ValueError, match="WEIGHT_QUANT"):
        JitTracker(model, variables, cfg2)

    # the batched (lockstep/serving) tracker shares the same prep
    from uvltrack_tpu.track.batch import BatchTracker

    cfg3 = default_cfg()
    cfg3.TPU.COMPUTE_DTYPE = "float32"
    cfg3.TPU.WEIGHT_QUANT = "int8"
    cfg3.TEST.SEARCH_SIZE = 64
    cfg3.TEST.TEMPLATE_SIZE = 32
    cfg3.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN = 8
    bt = BatchTracker(cfg3, model, variables, num_streams=2)
    assert count_quantized(bt.variables["params"]) == 32

    # ...and the quantized batched step actually runs (QuantizedTensor
    # leaves ride through the vmapped jit): one lockstep round, boxes
    # close to the fp pool's
    rng2 = np.random.default_rng(12)
    frames0 = rng2.integers(0, 255, size=(2, 60, 80, 3)).astype(np.uint8)
    frames1 = rng2.integers(0, 255, size=(2, 60, 80, 3)).astype(np.uint8)
    boxes0 = np.asarray([[20.0, 15.0, 20.0, 18.0],
                         [30.0, 20.0, 16.0, 16.0]], np.float32)
    cfg_fp = default_cfg()
    cfg_fp.TPU.COMPUTE_DTYPE = "float32"
    cfg_fp.TEST.SEARCH_SIZE = 64
    cfg_fp.TEST.TEMPLATE_SIZE = 32
    cfg_fp.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN = 8
    boxes = {}
    for name, c in (("fp", cfg_fp), ("q8", cfg3)):
        t = BatchTracker(c, model, variables, num_streams=2)
        t.initialize(list(frames0), boxes0)
        packed = t.step(list(frames1))  # (S, 5) boxes+scores
        boxes[name] = packed[:, :4]
    np.testing.assert_allclose(boxes["q8"], boxes["fp"], atol=2.0)
