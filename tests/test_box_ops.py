import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.core import box_ops as B

# jitted wrappers — CLAUDE.md: no eager jax in tests
_j = jax.jit


def test_conversion_roundtrip():
    b = jnp.array([[10.0, 20.0, 30.0, 40.0], [0.0, 0.0, 5.0, 5.0]])
    assert np.allclose(_j(B.box_xyxy_to_xywh)(_j(B.box_xywh_to_xyxy)(b)), b)
    assert np.allclose(_j(B.box_cxcywh_to_xywh)(_j(B.box_xywh_to_cxcywh)(b)), b)
    assert np.allclose(_j(B.box_xyxy_to_cxcywh)(_j(B.box_xywh_to_xyxy)(b)), _j(B.box_xywh_to_cxcywh)(b))


def test_cxcywh_scale():
    b = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    s = _j(lambda x: B.box_xywh_to_cxcywh_scale(x, 0.5))(b)
    assert np.allclose(s, [[25.0, 40.0, 15.0, 20.0]])


def test_iou_identical_and_disjoint():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    iou, union = _j(B.box_iou)(a, a)
    assert np.allclose(iou, 1.0) and np.allclose(union, 100.0)
    c = jnp.array([[20.0, 20.0, 30.0, 30.0]])
    iou, _ = _j(B.box_iou)(a, c)
    assert np.allclose(iou, 0.0)


def test_giou_known_value():
    # Two unit boxes side by side: IoU=0, enclosing area=2, union=2 -> GIoU=0
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[1.0, 0.0, 2.0, 1.0]])
    giou, iou = _j(B.generalized_box_iou)(a, b)
    assert np.allclose(iou, 0.0)
    assert np.allclose(giou, 0.0, atol=1e-6)
    # Diagonal unit boxes: enclosing 4, union 2 -> GIoU = 0 - 2/4 = -0.5
    c = jnp.array([[1.0, 1.0, 2.0, 2.0]])
    giou, _ = _j(B.generalized_box_iou)(a, c)
    assert np.allclose(giou, -0.5, atol=1e-6)


def test_giou_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x1y1 = rng.uniform(0, 50, size=(64, 2))
    wh = rng.uniform(1, 50, size=(64, 2))
    a = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float64)
    x1y1 = rng.uniform(0, 50, size=(64, 2))
    wh = rng.uniform(1, 50, size=(64, 2))
    b = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float64)

    inter_w = np.maximum(np.minimum(a[:, 2], b[:, 2]) - np.maximum(a[:, 0], b[:, 0]), 0)
    inter_h = np.maximum(np.minimum(a[:, 3], b[:, 3]) - np.maximum(a[:, 1], b[:, 1]), 0)
    inter = inter_w * inter_h
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a + area_b - inter
    iou_o = inter / union
    enc_w = np.maximum(a[:, 2], b[:, 2]) - np.minimum(a[:, 0], b[:, 0])
    enc_h = np.maximum(a[:, 3], b[:, 3]) - np.minimum(a[:, 1], b[:, 1])
    enc = enc_w * enc_h
    giou_o = iou_o - (enc - union) / enc

    giou_j, iou_j = _j(B.generalized_box_iou)(jnp.asarray(a, dtype=jnp.float32), jnp.asarray(b, dtype=jnp.float32))
    assert np.allclose(np.asarray(giou_j), giou_o, atol=1e-4)
    assert np.allclose(np.asarray(iou_j), iou_o, atol=1e-4)


_clip = jax.jit(lambda b: B.clip_box_xywh(b, 100, 200, margin=10))


def test_clip_box_margin():
    box = jnp.array([-5.0, -5.0, 3.0, 3.0])  # fully outside top-left
    out = np.asarray(_clip(box))
    x1, y1, w, h = out
    assert x1 >= 0 and y1 >= 0
    assert w >= 10 and h >= 10
    box2 = jnp.array([50.0, 60.0, 20.0, 30.0])  # inside: unchanged
    assert np.allclose(_clip(box2), box2)
