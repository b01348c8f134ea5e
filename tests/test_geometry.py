import functools

import jax
import jax.numpy as jnp
import numpy as np

from uvltrack_tpu.core import geometry as G


def _mask_oracle(box, size):
    """Straightforward numpy oracle for anno2mask semantics."""
    x, y, w, h = box
    x1, y1, x2, y2 = np.array([x, y, x + w, y + h]) * size
    m = np.zeros((size, size), bool)
    for i in range(size):
        for j in range(size):
            cyy, cxx = i + 0.5, j + 0.5
            m[i, j] = (cxx > x1) and (cxx < x2) and (cyy > y1) and (cyy < y2)
    cx = int(np.floor((x1 + x2) / 2))
    cy = int(np.floor((y1 + y2) / 2))
    m[np.clip(cy, 0, size - 1), np.clip(cx, 0, size - 1)] = True
    return m.reshape(-1)


def test_anno2mask_matches_oracle():
    boxes = np.array(
        [
            [0.25, 0.25, 0.5, 0.5],
            [0.4, 0.4, 0.05, 0.05],  # tiny box: only center cell
            [0.0, 0.0, 1.0, 1.0],
            [0.9, 0.9, 0.3, 0.3],  # spills past the edge
        ],
        np.float32,
    )
    got = np.asarray(jax.jit(functools.partial(G.anno2mask, size=16))(jnp.asarray(boxes)))
    for k in range(len(boxes)):
        want = _mask_oracle(boxes[k], 16)
        assert (got[k] == want).all(), k


def test_anno2mask_center_always_set():
    boxes = jnp.asarray(np.array([[0.5, 0.5, 0.001, 0.001]], np.float32))
    m = np.asarray(jax.jit(functools.partial(G.anno2mask, size=8))(boxes))
    assert m.sum() == 1


def test_cont_gt_three_way_labels():
    boxes = jnp.asarray(np.array([[0.25, 0.25, 0.5, 0.5]], np.float32))
    t = np.asarray(jax.jit(functools.partial(G.cont_gt, size=16, ctr_ratio=0.75))(boxes)).reshape(16, 16)
    assert set(np.unique(t)) <= {-1, 0, 1}
    # center cell is class 0
    assert t[8, 8] == 0
    # far corner is background
    assert t[0, 0] == 1
    # ring between ctr box (0.75 scale: 6..12 in grid units) and full box (4..12)
    assert t[4, 8] == -1  # row 4 center-col: inside box, outside shrunk region


def test_rotate_half_batch():
    x = jnp.arange(6).reshape(6, 1)
    out = np.asarray(jax.jit(G.rotate_half_batch)(x)).reshape(-1)
    assert (out == np.array([3, 4, 5, 0, 1, 2])).all()


def test_crop_params_matches_reference_rounding():
    import math

    boxes = np.array(
        [[100.3, 50.7, 33.3, 44.4], [0.0, 0.0, 10.0, 10.0], [5.5, 7.7, 3.1, 9.9]],
        np.float32,
    )
    factor, out_sz = 4.0, 256
    x1j, y1j, cszj, rfj = jax.jit(
        functools.partial(G.crop_params, search_area_factor=factor,
                          output_sz=out_sz))(jnp.asarray(boxes))
    for k, (x, y, w, h) in enumerate(boxes):
        crop_sz = math.ceil(math.sqrt(w * h) * factor)
        x1 = int(round(x + 0.5 * w - crop_sz * 0.5))
        y1 = int(round(y + 0.5 * h - crop_sz * 0.5))
        assert int(cszj[k]) == crop_sz
        # note: python round() is banker's rounding, jnp.round matches (rint)
        assert int(x1j[k]) == x1
        assert int(y1j[k]) == y1
        assert np.isclose(float(rfj[k]), out_sz / crop_sz)


def test_map_box_back():
    prev = jnp.array([100.0, 200.0, 40.0, 40.0])
    rf = jnp.array(2.0)
    search_size = 256
    # prediction exactly at crop center with same size should keep the center
    pred = jnp.array([64.0, 64.0, 40.0, 40.0])  # cxcywh in crop px = 128/rf
    out = np.asarray(jax.jit(
        functools.partial(G.map_box_back, search_size=search_size))(
        pred, prev, rf))
    assert np.allclose(out, [100.0, 200.0, 40.0, 40.0])


def test_crop_params_degenerate_box_is_finite():
    """Zero-area boxes clamp crop_sz to 1 (device-safe stand-in for the
    reference's 'Too small bounding box.' exception) — no inf/NaN resize
    factor inside the jitted tracker step."""
    x1, y1, csz, rf = jax.jit(functools.partial(
        G.crop_params, search_area_factor=4.0, output_sz=64))(
        jnp.asarray([5.0, 5.0, 0.0, 0.0]))
    assert int(csz) == 1 and np.isfinite(float(rf))
