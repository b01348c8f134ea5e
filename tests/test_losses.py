import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.core.geometry import cont_gt
from uvltrack_tpu.train import losses as L

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_gauss_focal_matches_torch_formula():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 0.99, size=(4, 16, 16)).astype(np.float32)
    gt = np.zeros((4, 16, 16), np.float32)
    gt[:, 8, 8] = 1.0
    gt[:, 8, 9] = 0.6
    gt[:, 7, 8] = 0.3

    p = torch.tensor(pred)
    g = torch.tensor(gt)
    pos = g.eq(1)
    neg = g.lt(1)
    pos_loss = (torch.log(p[pos]) * (1 - p[pos]) ** 2).sum()
    neg_loss = (torch.log(1 - p[neg]) * p[neg] ** 2 * (1 - g[neg]) ** 4).sum()
    want_sum = -(pos_loss + neg_loss).item()
    want_mean = want_sum / pred.size

    got_sum = float(jax.jit(functools.partial(
        L.gauss_weighted_focal_loss, reduction="sum"))(
        jnp.asarray(pred), jnp.asarray(gt)))
    got_mean = float(jax.jit(functools.partial(
        L.gauss_weighted_focal_loss, reduction="mean"))(
        jnp.asarray(pred), jnp.asarray(gt)))
    assert np.isclose(got_sum, want_sum, rtol=1e-5)
    assert np.isclose(got_mean, want_mean, rtol=1e-5)


def test_weighted_ce_ignore_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(64, 2)).astype(np.float32)
    targets = rng.integers(-1, 2, size=(64,)).astype(np.int64)  # {-1,0,1}
    w = np.array([0.96, 0.04], np.float32)

    want = torch.nn.CrossEntropyLoss(weight=torch.tensor(w), ignore_index=-1)(
        torch.tensor(logits), torch.tensor(targets)).item()
    got = float(jax.jit(L.weighted_ce_ignore)(
        jnp.asarray(logits), jnp.asarray(targets.astype(np.int32)),
        jnp.asarray(w)))
    assert np.isclose(got, want, rtol=1e-5)


def test_bilinear_sample_matches_torch_grid_sample():
    rng = np.random.default_rng(2)
    maps = rng.normal(size=(8, 16, 16)).astype(np.float32)
    xy = rng.uniform(-1.2, 1.2, size=(8, 2)).astype(np.float32)  # incl. border

    got = np.asarray(jax.jit(L._bilinear_sample_border)(
        jnp.asarray(maps), jnp.asarray(xy)))
    want = F.grid_sample(torch.tensor(maps)[:, None],
                         torch.tensor(xy).reshape(8, 1, 1, 2),
                         padding_mode="border", align_corners=True)
    want = want.reshape(8).numpy()
    assert np.allclose(got, want, atol=1e-5)


def test_aux_loss_positive_beats_negative():
    """If the map peaks exactly at the gt center and is low elsewhere, the aux
    CE should be near zero; a map peaking outside should give a large loss."""
    sz = 16
    gt = jnp.asarray(np.array([[0.25, 0.25, 0.5, 0.5]], np.float32))
    # gt center (0.5, 0.5) samples at grid coord 7.5 (align_corners=True), so
    # peak the whole 2x2 bilinear neighborhood
    good = np.full((1, 1, sz, sz), -5.0, np.float32)
    good[0, 0, 7:9, 7:9] = 10.0
    bad = np.full((1, 1, sz, sz), -5.0, np.float32)
    bad[0, 0, 0, 0] = 10.0
    l_good = float(jax.jit(L.aux_contrastive_loss)(jnp.asarray(good), gt))
    l_bad = float(jax.jit(L.aux_contrastive_loss)(jnp.asarray(bad), gt))
    assert l_good < 0.01
    assert l_bad > 1.0


def test_box_losses_perfect_prediction():
    gt = jnp.asarray(np.array([[0.25, 0.25, 0.5, 0.5]], np.float32))
    # bbox_map where every position predicts the gt box (cxcywh)
    bmap = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5, 0.5]]), (1, 16, 1))[None][0]
    bmap = bmap.reshape(1, 16, 4)
    gl, l1, iou = jax.jit(L.box_losses)(bmap, gt)
    assert float(iou) > 0.999
    assert float(gl) < 1e-4
    assert float(l1) < 1e-6


def test_cont_gt_cross_check_with_loss():
    gt = jnp.asarray(np.array([[0.25, 0.25, 0.5, 0.5]], np.float32))
    t = jax.jit(functools.partial(cont_gt, size=16))(gt)
    # logits that put all mass on class 0 where target==0 and class 1 where 1
    tt = np.asarray(t).reshape(-1)
    logits = np.zeros((256, 2), np.float32)
    logits[tt == 0, 0] = 10.0
    logits[tt == 1, 1] = 10.0
    w = jnp.asarray([0.5, 0.5])
    loss = float(jax.jit(L.weighted_ce_ignore)(
        jnp.asarray(logits), jnp.asarray(tt), w))
    assert loss < 1e-3
