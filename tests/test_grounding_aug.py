"""Grounding augmentation invariants against the reference semantics
(processing_utils_grounding2.py + processing.py:191-309).

Covers: PIL-ImageEnhance parity of the ColorJitter enhancers, the IoU-0.9
retention contract of RandomSizeCrop, direction-word behavior (geometry
pinned to the plain menu resize; flip still allowed with left<->right phrase
rewrite; grounding frame substitutes the search crops), letterbox geometry,
and the full grounding_process layout."""

import numpy as np
import pytest

from uvltrack_tpu.data.grounding_aug import (_blend, _pil_l_channel,
                                             color_jitter, flip_phrase,
                                             grounding_resize_train,
                                             has_directions,
                                             random_horizontal_flip,
                                             random_resize, random_size_crop,
                                             random_translate_letterbox,
                                             size_menus)


def _painted(h, w, box):
    """uint8 image, gray background, red target rectangle."""
    im = np.full((h, w, 3), 120, np.uint8)
    x, y, bw, bh = [int(v) for v in box]
    im[y:y + bh, x:x + bw] = (250, 30, 30)
    return im


def _red_extent(canvas):
    """xyxy extent of the painted target in a (possibly resized) image.
    Detected by R-G dominance so it survives color jitter (background is
    gray, i.e. R==G)."""
    red = canvas[..., 0].astype(int) - canvas[..., 1].astype(int) > 40
    ys, xs = np.nonzero(red)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float64)


# ------------------------------------------------------------- ColorJitter
@pytest.mark.parametrize("which,factor", [
    ("brightness", 0.7), ("brightness", 1.3),
    ("contrast", 0.7), ("contrast", 1.3),
    ("saturation", 0.6), ("saturation", 1.4),
])
def test_enhancer_matches_pil(which, factor):
    """Each enhancer blend must match PIL ImageEnhance within rounding
    (grounding2.py:156-216 uses PIL directly)."""
    from PIL import Image, ImageEnhance

    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, size=(40, 50, 3)).astype(np.uint8)
    pil = Image.fromarray(im)
    if which == "brightness":
        want = np.asarray(ImageEnhance.Brightness(pil).enhance(factor))
        got = _blend(np.zeros_like(im, np.float64), im, factor)
    elif which == "contrast":
        want = np.asarray(ImageEnhance.Contrast(pil).enhance(factor))
        mean = np.floor(_pil_l_channel(im).mean() + 0.5)
        got = _blend(np.full_like(im, mean, np.float64), im, factor)
    else:
        want = np.asarray(ImageEnhance.Color(pil).enhance(factor))
        gray = _pil_l_channel(im)[..., None].repeat(3, axis=2)
        got = _blend(gray, im, factor)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_color_jitter_applies_with_prob():
    rng = np.random.default_rng(1)
    im = np.full((20, 20, 3), 100, np.uint8)
    changed = sum((color_jitter(im, rng) != im).any() for _ in range(100))
    assert 60 < changed < 95  # p=0.8 to jitter at all


# ---------------------------------------------------------- RandomSizeCrop
def test_random_size_crop_iou_retention():
    """Accepted crops keep IoU(clamped box, original) >= 0.9
    (grounding2.py:112-138 with check_method iou/0.9)."""
    rng = np.random.default_rng(2)
    im = np.zeros((200, 240, 3), np.uint8)
    box = np.array([80.0, 60.0, 150.0, 130.0])  # xyxy
    n_cropped = 0
    for _ in range(50):
        crop, nb = random_size_crop(im, box, rng, min_size=120, max_size=220)
        if crop.shape[:2] != im.shape[:2]:
            n_cropped += 1
            area = (nb[2] - nb[0]) * (nb[3] - nb[1])
            orig = (box[2] - box[0]) * (box[3] - box[1])
            assert area / orig >= 0.9 - 1e-9  # clamped box is inside original
            assert nb[0] >= 0 and nb[1] >= 0
            assert nb[2] <= crop.shape[1] and nb[3] <= crop.shape[0]
    assert n_cropped > 10  # crops do get accepted


def test_random_size_crop_falls_back_when_target_dominates():
    """A target covering the whole frame can never retain IoU 0.9 under a
    smaller crop -> after max_cnt tries the image returns unchanged."""
    rng = np.random.default_rng(3)
    im = np.zeros((100, 100, 3), np.uint8)
    box = np.array([2.0, 2.0, 98.0, 98.0])
    crop, nb = random_size_crop(im, box, rng, min_size=50, max_size=70)
    assert crop.shape == im.shape and np.allclose(nb, box)


# ------------------------------------------------------------ RandomResize
def test_random_resize_long_and_short_side():
    rng = np.random.default_rng(4)
    im = np.zeros((100, 200, 3), np.uint8)
    box = np.array([20.0, 10.0, 60.0, 50.0])
    out, nb = random_resize([150], im, box, rng, resize_long_side=True)
    assert max(out.shape[:2]) == 150
    assert np.isclose(nb[0], 20.0 * out.shape[1] / 200)
    out, nb = random_resize([150], im, box, rng, resize_long_side=False)
    assert min(out.shape[:2]) == 150


# ------------------------------------------------------------------- flip
def test_flip_rewrites_phrase_and_mirrors_box():
    rng = np.random.default_rng(5)
    im = _painted(60, 100, [10, 20, 30, 20])
    box = np.array([10.0, 20.0, 40.0, 40.0])  # xyxy
    flipped = 0
    for _ in range(40):
        out, phrase, nb = random_horizontal_flip(
            im, "cat to the left of the dog", box, rng)
        if phrase != "cat to the left of the dog":
            flipped += 1
            assert phrase == "cat to the right of the dog"
            assert np.allclose(nb, [100 - 40, 20, 100 - 10, 40])
            assert np.allclose(_red_extent(out), [60, 20, 90, 40])
    assert 10 < flipped < 30


def test_flip_phrase_round_trip():
    assert flip_phrase("left of the right hand") == "right of the left hand"
    # capitalized direction words must still swap (IGNORECASE match)
    assert flip_phrase("Left person in white") == "right person in white"
    assert flip_phrase("the RIGHT one") == "the left one"
    # 'lefty'/'rights' are not direction words
    assert flip_phrase("lefty rights") == "lefty rights"
    assert has_directions("the top shelf") and not has_directions("a red car")


# --------------------------------------------------- grounding_resize_train
def test_direction_words_pin_geometry_to_menu_resize():
    """With direction words the chain is RandomResize(sizes1, long side) only
    (grounding2.py:398-402): content aspect ratio is preserved and the long
    side lands exactly on a menu entry."""
    sizes1, _, _ = size_menus(256)
    for seed in range(12):
        rng = np.random.default_rng(seed)
        im = _painted(120, 200, [50, 30, 60, 40])
        canvas, nb, att, phrase = grounding_resize_train(
            im, 256, np.array([50.0, 30.0, 60.0, 40.0]),
            "the ball in the middle", rng)
        content_h = int((1 - att).sum(0).max())
        content_w = int((1 - att).sum(1).max())
        assert content_w in sizes1  # long side == a menu entry
        assert abs(content_h - content_w * 120 / 200) <= 2  # aspect kept
        assert phrase in ("the ball in the middle",)  # no left/right to swap


def test_grounding_resize_train_box_tracks_target():
    """Over random seeds the normalized box must cover the painted target on
    the canvas (geometry consistency through resize/crop/flip/letterbox)."""
    for seed in range(20):
        rng = np.random.default_rng(100 + seed)
        im = _painted(90, 160, [50, 20, 40, 40])
        canvas, nb, att, _ = grounding_resize_train(
            im, 256, np.array([50.0, 20.0, 40.0, 40.0]), "a red box", rng)
        assert canvas.shape == (256, 256, 3)
        assert (nb >= -1e-6).all() and (nb[:2] + nb[2:] <= 1.0 + 1e-6).all()
        ext = _red_extent(canvas) / 256.0  # xyxy normalized
        got = np.array([nb[0], nb[1], nb[0] + nb[2], nb[1] + nb[3]])
        assert np.abs(got - ext).max() < 0.03, (seed, got, ext)


def test_letterbox_att_marks_padding():
    im = np.full((60, 120, 3), 200, np.uint8)
    box = np.array([30.0, 15.0, 70.0, 45.0])  # xyxy
    canvas, nb, att = random_translate_letterbox(im, box, 128,
                                                 np.random.default_rng(6))
    assert canvas.shape == (128, 128, 3)
    assert att.sum() == 128 * 128 - 60 * 120
    x1 = int(nb[0] * 128) + 1
    y1 = int(nb[1] * 128) + 1
    assert att[y1, x1] == 0


# -------------------------------------------------------- grounding_process
def _proc(seed=0):
    from test_data_pipeline import small_cfg
    from uvltrack_tpu.data.processing import TrackProcessing

    return TrackProcessing(small_cfg(), rng=np.random.default_rng(seed))


def _frames(rng, n, h=90, w=160):
    return [rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            for _ in range(n)]


def test_grounding_process_mixes_grounding_and_search_frames():
    rng = np.random.default_rng(7)
    proc = _proc(7)
    g = _frames(rng, 1)
    s = _frames(rng, 1)
    out = proc.grounding_process(g, [np.array([40.0, 20, 50, 40])],
                                 s, [np.array([30.0, 25, 45, 35])],
                                 "a running dog", 2)
    assert out is not None
    assert out["search_images"].shape[0] == 2
    assert np.allclose(out["template_images"], 0)
    # frame 0 (letterboxed grounding) and frame 1 (jittered crop) differ
    assert not np.allclose(out["search_images"][0], out["search_images"][1])


def test_direction_words_substitute_grounding_for_search():
    """processing.py:285-291: with direction words in the phrase the search
    crop is replaced by the grounding frame."""
    rng = np.random.default_rng(8)
    proc = _proc(8)
    g = _frames(rng, 1)
    s = _frames(rng, 1)
    out = proc.grounding_process(g, [np.array([40.0, 20, 50, 40])],
                                 s, [np.array([30.0, 25, 45, 35])],
                                 "the dog on the left", 2)
    assert out is not None
    assert np.allclose(out["search_images"][0], out["search_images"][1])
    assert np.allclose(out["search_anno"][0], out["search_anno"][1])


def test_grounding_process_flip_rewrites_language():
    seen = set()
    for seed in range(20):
        proc = _proc(200 + seed)
        rng = np.random.default_rng(seed)
        out = proc.grounding_process(_frames(rng, 1),
                                     [np.array([40.0, 20, 50, 40])],
                                     [], [], "cat on the left", 2)
        if out is not None:
            seen.add(out["language"])
    assert seen == {"cat on the left", "cat on the right"}


def test_grounding_test_mode_plain_letterbox():
    """Validation grounding (mode='grounding_test', sampler.py:496-522):
    frame [0], plain letterbox, no flip/crop — deterministic geometry."""
    from test_data_pipeline import FakeTok, FakeVideoDataset, small_cfg
    from uvltrack_tpu.data.processing import TrackProcessing
    from uvltrack_tpu.data.sampler import GroundingAndTrackingSampler

    cfg = small_cfg()
    proc = TrackProcessing(cfg, rng=np.random.default_rng(0))
    ds = FakeVideoDataset()
    s = GroundingAndTrackingSampler(
        [ds], [1.0], samples_per_epoch=50, max_gap=10, processing=proc,
        num_search_frames=2, mode="grounding_test", tokenizer=FakeTok(),
        max_query_len=12, seed=1)
    assert len(s) == ds.get_num_sequences()
    out = s.sample()
    assert int(out["flag"]) == 1
    assert np.allclose(out["template_images"], 0)
    # both search frames are the SAME letterboxed grounding frame
    assert np.allclose(out["search_images"][0], out["search_images"][1])
    assert np.allclose(out["search_anno"][0], out["search_anno"][1])


def test_grounding_test_index_iterates_sequences_once():
    """The loader's draw index maps 1:1 to sequence ids (the reference's
    sample_grounding_test(i) consumes the DataLoader index), so one epoch
    scores every sequence exactly once instead of a with-replacement
    multiset."""
    from test_data_pipeline import FakeTok, FakeVideoDataset, small_cfg
    from uvltrack_tpu.data.processing import TrackProcessing
    from uvltrack_tpu.data.sampler import GroundingAndTrackingSampler

    cfg = small_cfg()
    proc = TrackProcessing(cfg, rng=np.random.default_rng(0))
    ds = FakeVideoDataset()
    s = GroundingAndTrackingSampler(
        [ds], [1.0], samples_per_epoch=50, max_gap=10, processing=proc,
        num_search_frames=2, mode="grounding_test", tokenizer=FakeTok(),
        max_query_len=12, seed=1)
    n = ds.get_num_sequences()
    seen = []
    orig = ds.get_sequence_info

    def spy(seq_id):
        seen.append(seq_id)
        return orig(seq_id)

    ds.get_sequence_info = spy
    for i in range(n):
        s.sample(index=i)
    assert seen == list(range(n))
