"""Actor batch-layout tests: frame-major flattening, template repetition, and
half-batch context-mask rotation match the reference actor's layout
(lib/train/actors/uvltrack.py:58-109)."""

import jax.numpy as jnp
import numpy as np

from uvltrack_tpu.core.geometry import anno2mask, rotate_half_batch
from uvltrack_tpu.train.actor import cont_class_weights, flatten_batch, loss_weights
from uvltrack_tpu.config import default_cfg


def _batch(n=2, b=4):
    rng = np.random.default_rng(0)
    return {
        "template_images": jnp.asarray(rng.normal(size=(1, b, 8, 8, 3)), jnp.float32),
        "template_anno": jnp.asarray(rng.uniform(0.2, 0.4, size=(1, b, 4)), jnp.float32),
        "search_images": jnp.asarray(rng.normal(size=(n, b, 16, 16, 3)), jnp.float32),
        "search_anno": jnp.asarray(rng.uniform(0.2, 0.4, size=(n, b, 4)), jnp.float32),
        "search_cls": jnp.asarray(rng.normal(size=(n, b, 1, 1)), jnp.float32),
        "text": jnp.asarray(rng.integers(0, 50, size=(n, b, 6)), jnp.int32),
        "text_mask": jnp.ones((n, b, 6), jnp.int32),
        "flag": jnp.asarray([0, 1, 2, 0], jnp.int32),
    }


def test_flatten_is_frame_major_with_template_repeat():
    n, b = 2, 4
    batch = _batch(n, b)
    fb = {k: np.asarray(v) for k, v in flatten_batch(batch).items()}
    raw = {k: np.asarray(v) for k, v in batch.items()}
    assert fb["search_images"].shape == (n * b, 16, 16, 3)
    assert fb["template_images"].shape == (n * b, 8, 8, 3)
    # frame-major: row i = frame*(b) + sample
    for f in range(n):
        for s in range(b):
            assert np.allclose(fb["search_images"][f * b + s],
                               raw["search_images"][f, s])
            # template repeated per frame
            assert np.allclose(fb["template_images"][f * b + s],
                               raw["template_images"][0, s])
            assert np.allclose(fb["search_anno"][f * b + s],
                               raw["search_anno"][f, s])
            assert np.allclose(fb["text"][f * b + s], raw["text"][f, s])
    # flag tiled frame-major
    assert fb["flag"].tolist() == [0, 1, 2, 0, 0, 1, 2, 0]


def test_context_mask_rotation_pairs_halves():
    """The context mask for sample i must come from sample i+B/2 (mod B) —
    the same rotation the head applies to the search features."""
    boxes = jnp.asarray(np.array([
        [0.0, 0.0, 0.3, 0.3],
        [0.6, 0.6, 0.3, 0.3],
        [0.1, 0.6, 0.2, 0.2],
        [0.6, 0.1, 0.2, 0.2],
    ], np.float32))
    m = anno2mask(boxes, 8)
    rot = rotate_half_batch(m)
    assert np.allclose(rot[0], m[2]) and np.allclose(rot[1], m[3])
    assert np.allclose(rot[2], m[0]) and np.allclose(rot[3], m[1])


def test_loss_weights_and_cont_class_weights():
    cfg = default_cfg()
    cfg.TRAIN.GIOU_WEIGHT = 2.0
    cfg.TRAIN.L1_WEIGHT = 5.0
    cfg.TRAIN.AUX_WEIGHT = 0.1
    cfg.TRAIN.CONT_WEIGHT = 1.0
    w = loss_weights(cfg)
    assert w == {"giou": 2.0, "l1": 5.0, "cls": 1.0, "aux": 0.1, "cont": 1.0}
    cfg.DATA.SEARCH.FACTOR = 4.0
    cfg.TRAIN.CTR_RATIO = 0.75
    cw = np.asarray(cont_class_weights(cfg))
    want = np.array([16.0, 0.5625])
    want = want / want.sum()
    assert np.allclose(cw, want)
