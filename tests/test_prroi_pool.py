"""PrRoIPool tests mirroring the vendored library's validation strategy
(avg_pool2d equivalence + numeric integration golden + coordinate gradients,
cf. PreciseRoIPooling/pytorch/tests/test_prroi_pooling2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.ops.prroi_pool import _hat_cumint, prroi_pool, prroi_pool_one

# jitted wrappers (pooled dims static) — CLAUDE.md: no eager jax in tests
_pool_2x2 = jax.jit(lambda f, r: prroi_pool(f, r, 2, 2))
_pool_one_2x3 = jax.jit(lambda f, r: prroi_pool_one(f, r, 2, 3))


def test_hat_cumint_values():
    t = jnp.asarray([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    got = np.asarray(jax.jit(_hat_cumint)(t))
    want = [0.0, 0.0, 0.125, 0.5, 0.875, 1.0, 1.0]
    assert np.allclose(got, want)


def test_matches_average_pooling_on_aligned_rois():
    """Integer-aligned RoI covering whole cells: PrRoIPool == box average of
    the bilinear surface — for a bilinear (i.e. piecewise-linear) surface the
    cell integral equals the average of its 4 corners."""
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    # roi [x1,y1,x2,y2] = [1,1,5,5], pooled 2x2 -> bins of 2x2 cells
    rois = jnp.asarray([[0, 1.0, 1.0, 5.0, 5.0]], jnp.float32)
    out = np.asarray(_pool_2x2(jnp.asarray(feat), rois))
    f = feat[0]

    def cell_integral(y, x, c):
        # integral of the bilinear surface over cell [y,y+1]x[x,x+1]
        return (f[y, x, c] + f[y, x + 1, c] + f[y + 1, x, c] + f[y + 1, x + 1, c]) / 4

    for py in range(2):
        for px in range(2):
            for c in range(2):
                want = np.mean([
                    cell_integral(1 + 2 * py + dy, 1 + 2 * px + dx, c)
                    for dy in range(2) for dx in range(2)
                ])
                assert np.isclose(out[0, py, px, c], want, atol=1e-5), (py, px, c)


def test_matches_numeric_integration():
    """Golden check against dense numerical integration of the bilinear surface."""
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(6, 7, 1)).astype(np.float32)
    roi = np.array([0.7, 1.3, 5.2, 4.1], np.float32)
    out = np.asarray(_pool_one_2x3(jnp.asarray(feat), jnp.asarray(roi)))

    def bilinear(y, x):
        # no index clamping: the hat-basis surface is zero outside the
        # grid, which px() already encodes — clamping would snap border
        # samples to the wrong cell (and the old bounds had H/W swapped)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = x0 + 1, y0 + 1
        wx, wy = x - x0, y - y0

        def px(yy, xx):
            if 0 <= yy < 6 and 0 <= xx < 7:
                return feat[yy, xx, 0]
            return 0.0

        return (px(y0, x0) * (1 - wx) * (1 - wy) + px(y0, x1) * wx * (1 - wy)
                + px(y1, x0) * (1 - wx) * wy + px(y1, x1) * wx * wy)

    bw = (roi[2] - roi[0]) / 3
    bh = (roi[3] - roi[1]) / 2
    n = 80
    for py in range(2):
        for px_ in range(3):
            ys = roi[1] + bh * (py + (np.arange(n) + 0.5) / n)
            xs = roi[0] + bw * (px_ + (np.arange(n) + 0.5) / n)
            vals = np.array([[bilinear(y, x) for x in xs] for y in ys])
            want = vals.mean()
            assert np.isclose(out[py, px_, 0], want, atol=2e-3), (py, px_)


def test_gradients_wrt_coords_and_features():
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))

    def loss(roi_coords, f):
        rois = jnp.concatenate([jnp.zeros((1, 1)), roi_coords[None]], axis=-1)
        return prroi_pool(f, rois, 2, 2).sum()

    roi = jnp.asarray([1.2, 1.5, 6.3, 6.1], jnp.float32)
    g_roi, g_feat = jax.jit(jax.grad(loss, argnums=(0, 1)))(roi, feat)
    assert np.isfinite(np.asarray(g_roi)).all() and np.abs(np.asarray(g_roi)).sum() > 0
    assert np.isfinite(np.asarray(g_feat)).all() and np.abs(np.asarray(g_feat)).sum() > 0
    # numeric check of one coordinate gradient
    eps = 1e-3

    loss_j = jax.jit(loss)

    def f_at(v):
        return float(loss_j(roi.at[0].set(v), feat))

    num = (f_at(float(roi[0]) + eps) - f_at(float(roi[0]) - eps)) / (2 * eps)
    assert np.isclose(float(g_roi[0]), num, atol=5e-2)


def test_zero_area_roi_is_zero():
    feat = jnp.ones((1, 8, 8, 1))
    rois = jnp.asarray([[0, 3.0, 3.0, 3.0, 5.0]], jnp.float32)  # zero width
    out = np.asarray(_pool_2x2(feat, rois))
    assert np.allclose(out, 0.0)


def test_doubly_inverted_roi_is_zero_like_cuda():
    """x2<x1 AND y2<y1: the CUDA kernel clamps width/height per axis BEFORE
    the area product (prroi_pooling_gpu_impl.cu:175-176), so a fully
    reversed box pools to 0 with zero coordinate gradients — not the
    average over the reversed box (neg*neg would be a positive area)."""
    import jax

    feat = jnp.ones((1, 8, 8, 1))
    rois = jnp.asarray([[0, 5.0, 6.0, 2.0, 3.0]], jnp.float32)  # reversed
    out = np.asarray(_pool_2x2(feat, rois))
    assert np.allclose(out, 0.0)

    def pooled_sum(coords):
        r = jnp.concatenate([jnp.zeros((1, 1)), coords[None]], axis=1)
        return prroi_pool(feat, r, 2, 2).sum()

    g = np.asarray(jax.jit(jax.grad(pooled_sum))(
        jnp.asarray([5.0, 6.0, 2.0, 3.0])))
    assert np.allclose(g, 0.0)


REF_FIXTURES = (
    "/root/reference/lib/utils/PreciseRoIPooling/tensorflow/tests/"
    "test_binaries/2_2_0.5"
)


@pytest.mark.skipif(not __import__("os").path.isdir(REF_FIXTURES),
                    reason="reference golden fixtures not on disk")
def test_golden_fixtures_from_reference():
    """Forward + both gradients against the vendored CUDA-produced binaries
    (SURVEY §2.9; PreciseRoIPooling/tensorflow/tests/precise_roi_pooling_ops_test.py:45-77:
    pooled 2x2, spatial_scale 0.5, loss = sum(outputs), channels_first)."""
    import os

    load = lambda n: np.load(os.path.join(REF_FIXTURES, n + ".npy"))
    features_cf = load("features")          # (N, C, H, W)
    rois = load("rois")                     # (R, 5) [batch, x1, y1, x2, y2]
    want_out_cf = load("real_outputs")      # (R, C, ph, pw)
    want_gfeat_cf = load("gradients0")      # (N, C, H, W)
    want_groi = load("gradients1")          # (R, 5)

    features = jnp.asarray(features_cf.transpose(0, 2, 3, 1))  # NHWC

    @jax.jit
    def fwd_and_grads(f, r):
        def loss(f_, r_):
            return prroi_pool(f_, r_, 2, 2, spatial_scale=0.5).sum()

        out = prroi_pool(f, r, 2, 2, spatial_scale=0.5)
        g_f, g_r = jax.grad(loss, argnums=(0, 1))(f, r)
        return out, g_f, g_r

    out, g_feat, g_roi = fwd_and_grads(features, jnp.asarray(rois))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), want_out_cf, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_feat).transpose(0, 3, 1, 2), want_gfeat_cf, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_roi), want_groi, rtol=1e-4, atol=1e-5)
