import functools

import jax
import jax.numpy as jnp
import numpy as np

from uvltrack_tpu.core import hann as H
from uvltrack_tpu.core import heatmap as HM


def _draw_gaussian_oracle(box, out_size, dynamic, gaussian_iou):
    """Numpy oracle implementing the CenterNet draw semantics."""
    x, y, w, h = box * out_size
    cx, cy = int(x + w / 2), int(y + h / 2)
    if dynamic:
        a1, b1 = 1, (h + w)
        c1 = w * h * (1 - gaussian_iou) / (1 + gaussian_iou)
        r1 = (b1 - np.sqrt(b1**2 - 4 * a1 * c1)) / (2 * a1)
        a2, b2, c2 = 4, 2 * (h + w), (1 - gaussian_iou) * w * h
        r2 = (b2 - np.sqrt(b2**2 - 4 * a2 * c2)) / (2 * a2)
        a3, b3 = 4 * gaussian_iou, -2 * gaussian_iou * (h + w)
        c3 = (gaussian_iou - 1) * w * h
        r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / (2 * a3)
        radius = max(0, int(min(r1, r2, r3)))
    else:
        radius = 2
    diameter = 2 * radius + 1
    sigma = diameter / 6
    m = (diameter - 1) / 2
    yy, xx = np.ogrid[-m : m + 1, -m : m + 1]
    g = np.exp(-(xx * xx + yy * yy) / (2 * sigma * sigma))
    g[g < np.finfo(g.dtype).eps * g.max()] = 0
    heat = np.zeros((out_size, out_size))
    left, right = min(cx, radius), min(out_size - cx, radius + 1)
    top, bottom = min(cy, radius), min(out_size - cy, radius + 1)
    if right > -left and bottom > -top:
        heat[cy - top : cy + bottom, cx - left : cx + right] = np.maximum(
            heat[cy - top : cy + bottom, cx - left : cx + right],
            g[radius - top : radius + bottom, radius - left : radius + right],
        )
    return heat


def test_cls_label_fixed_radius_matches_oracle():
    boxes = np.array([[0.25, 0.25, 0.5, 0.5], [0.7, 0.1, 0.2, 0.3]], np.float32)
    got = np.asarray(jax.jit(functools.partial(
        HM.generate_cls_label, out_size=16, dynamic=False))(jnp.asarray(boxes)))
    for k in range(len(boxes)):
        want = _draw_gaussian_oracle(boxes[k], 16, False, 0.7)
        assert np.allclose(got[k], want, atol=1e-6), k


def test_cls_label_dynamic_radius_matches_oracle():
    boxes = np.array([[0.1, 0.1, 0.8, 0.8], [0.4, 0.4, 0.2, 0.1]], np.float32)
    got = np.asarray(jax.jit(functools.partial(
        HM.generate_cls_label, out_size=16, gaussian_iou=0.7,
        dynamic=True))(jnp.asarray(boxes)))
    for k in range(len(boxes)):
        want = _draw_gaussian_oracle(boxes[k], 16, True, 0.7)
        assert np.allclose(got[k], want, atol=1e-6), k


def test_cls_label_peak_at_center():
    boxes = jnp.asarray(np.array([[0.25, 0.25, 0.5, 0.5]], np.float32))
    m = np.asarray(jax.jit(functools.partial(HM.generate_cls_label, out_size=16))(boxes))
    assert m[0].max() == 1.0
    assert m[0, 8, 8] == 1.0


def test_hanning_matches_numpy():
    for sz in (8, 16, 24):
        assert np.allclose(np.asarray(H.hanning(sz)), np.hanning(sz), atol=1e-6)
        w = np.asarray(H.hanning2d_flat(sz))
        want = np.outer(np.hanning(sz), np.hanning(sz)).flatten()
        assert np.allclose(w, want, atol=1e-6)


def test_hann1d_centered_positive_interior():
    w = np.asarray(H.hann1d(16, centered=True))
    assert (w > 0).all()
    assert np.argmax(w) in (7, 8)
