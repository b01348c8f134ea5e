"""Device-side preprocessing vs cv2 host parity (SURVEY.md hard part (b)):
the fused jnp crop/resize must reproduce sample_target's cv2 output within
interpolation tolerance, or benchmark AUC drifts from the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from uvltrack_tpu.data.processing_utils import grounding_resize_np, sample_target_np
from uvltrack_tpu.track.pipeline import (IMAGENET_MEAN, IMAGENET_STD,
                                         grounding_letterbox,
                                         sample_target_device)


def _smooth_image(h, w, seed=0):
    """Bilinear-friendly test image: random low-res field upsampled."""
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 255, size=(h // 8, w // 8, 3)).astype(np.uint8)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)


@pytest.mark.parametrize("h,w", [(240, 320), (320, 240)])
@pytest.mark.parametrize("box,factor,out_sz", [
    ([100.0, 50.0, 60.0, 40.0], 2.0, 128),
    ([10.0, 10.0, 30.0, 30.0], 4.0, 256),   # crop spills past top-left
    ([150.0, 150.0, 60.0, 70.0], 4.0, 256),  # spills past bottom-right
    ([33.3, 41.7, 25.5, 52.1], 5.0, 256),    # fractional box
])
def test_sample_target_device_matches_cv2(box, factor, out_sz, h, w):
    # both orientations: the bottom-right-spill case must hit the far-edge
    # pad quirk on each axis (x2_pad = max(x2 - W + 1, 0) drops the last
    # in-image row/col; sample_target, processing_utils.py:188-192)
    img = _smooth_image(h, w)
    crop_cv, rf_cv, _ = sample_target_np(img, box, factor, output_sz=out_sz)
    want = (crop_cv.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    got, rf_j = jax.jit(
        lambda f, b: sample_target_device(f, b, factor, out_sz)
    )(jnp.asarray(img, jnp.float32), jnp.asarray(np.asarray(box, np.float32)))
    got = np.asarray(got[0])

    assert np.isclose(float(rf_j), rf_cv, rtol=1e-6)
    # normalized units: 1/255 pixel ~ 0.017 after /std; allow ~1.5 pixel steps
    diff = np.abs(got - want)
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.05, np.quantile(diff, 0.99)


def test_grounding_letterbox_matches_cv2():
    for h, w, seed in ((240, 320, 1), (320, 200, 2)):
        img = _smooth_image(h, w, seed)
        padded_cv, box_cv, _ = grounding_resize_np(img, 256, [10, 10, 50, 40])
        want = (padded_cv.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        got = np.asarray(jax.jit(
            lambda f: grounding_letterbox(f, 256))(jnp.asarray(img, jnp.float32))[0])
        diff = np.abs(got - want)
        assert diff.mean() < 0.02, (h, w, diff.mean())
        assert np.quantile(diff, 0.99) < 0.15, (h, w, np.quantile(diff, 0.99))
