import os

import cv2
import numpy as np
import pytest

from uvltrack_tpu.config import default_cfg
from uvltrack_tpu.data.loader import SamplerLoader, collate_frame_major
from uvltrack_tpu.data.processing import TrackProcessing, flip_phrase, has_directions
from uvltrack_tpu.data.processing_utils import (generate_cls_label_np,
                                                grounding_resize_np,
                                                sample_target_np,
                                                transform_image_to_crop)
from uvltrack_tpu.data.sampler import GroundingAndTrackingSampler


def small_cfg():
    c = default_cfg()
    c.DATA.TEMPLATE.SIZE = 64
    c.DATA.SEARCH.SIZE = 128
    c.DATA.SEARCH.FACTOR = 4.0
    c.DATA.SEARCH.NUMBER = 2
    c.TRAIN.GROUNDING_RATIO = 0.3
    c.TRAIN.VL_RATIO = 0.3
    c.TRAIN.MODE = "joint"
    return c


class FakeVideoDataset:
    """In-memory video dataset following the BaseVideoDataset contract."""

    def __init__(self, n_seq=3, n_frames=30, size=(240, 320), language="a red car"):
        self.rng = np.random.default_rng(0)
        self.n_frames = n_frames
        self.size = size
        self.language = language
        self.seqs = []
        for _ in range(n_seq):
            boxes = np.stack([
                np.linspace(40, 120, n_frames),
                np.linspace(30, 80, n_frames),
                np.full(n_frames, 50.0),
                np.full(n_frames, 40.0),
            ], -1)
            self.seqs.append(boxes)

    def get_name(self):
        return "fake"

    def is_video_sequence(self):
        return True

    def is_tracking_sequence(self):
        return True

    def is_grounding_sequence(self):
        return True

    def is_vl_sequence(self):
        return True

    def get_num_sequences(self):
        return len(self.seqs)

    def get_sequence_info(self, seq_id):
        bbox = self.seqs[seq_id]
        valid = np.ones(len(bbox), bool)
        return {"bbox": bbox, "valid": valid, "visible": valid.copy()}

    def get_frames(self, seq_id, frame_ids, anno=None):
        h, w = self.size
        frames = [self.rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
                  for _ in frame_ids]
        anno = anno or self.get_sequence_info(seq_id)
        frame_annos = {k: [v[i] for i in frame_ids] for k, v in anno.items()}
        return frames, frame_annos, {"language": self.language}


class FakeTok:
    def encode_query(self, text, n):
        ids = [101] + [hash(w) % 1000 + 10 for w in text.split()][: n - 2] + [102]
        mask = [1] * len(ids)
        while len(ids) < n:
            ids.append(0)
            mask.append(0)
        return ids, mask


@pytest.fixture(scope="module")
def sampler():
    cfg = small_cfg()
    proc = TrackProcessing(cfg, rng=np.random.default_rng(1))
    return GroundingAndTrackingSampler(
        [FakeVideoDataset()], [1.0], samples_per_epoch=100, max_gap=10,
        processing=proc, num_search_frames=2, mode="joint",
        grounding_ratio=0.3, vl_ratio=0.3, tokenizer=FakeTok(),
        max_query_len=12, seed=0)


def test_sampler_produces_valid_samples(sampler):
    flags = set()
    for _ in range(20):
        s = sampler.sample()
        assert s["template_images"].shape == (1, 64, 64, 3)
        assert s["search_images"].shape == (2, 128, 128, 3)
        assert s["search_anno"].shape == (2, 4)
        assert s["search_cls"].shape == (2, 8, 8)
        assert s["text"].shape == (2, 12)
        assert s["flag"] in (0, 1, 2)
        flags.add(int(s["flag"]))
        # boxes normalized, overlapping the crop (heavy jitter can push gt
        # partially outside — validity only requires positive intersection)
        assert (s["search_anno"] >= -1.0).all() and (s["search_anno"] <= 2.0).all()
        x1, y1, w_, h_ = s["search_anno"][0]
        assert min(x1 + w_, 1) - max(x1, 0) > 0 and min(y1 + h_, 1) - max(y1, 0) > 0
        # cls peak where the box is (when the center lands inside the crop)
        for i in range(2):
            b = s["search_anno"][i]
            bcx, bcy = b[0] + b[2] / 2, b[1] + b[3] / 2
            if not (0.05 < bcx < 0.95 and 0.05 < bcy < 0.95):
                continue
            cy, cx = np.unravel_index(s["search_cls"][i].argmax(), (8, 8))
            assert abs(bcx * 8 - (cx + 0.5)) < 2.0
            assert abs(bcy * 8 - (cy + 0.5)) < 2.0
        if s["flag"] == 1:
            assert np.allclose(s["template_images"], 0)  # zero template
        # every task carries the tokenized caption (reference sampler.py:205-216);
        # flag 0 gates text inside the model via cat_mask, not in the batch
        assert s["text_mask"].sum() > 0
    assert flags == {0, 1, 2}


def _trident_sampler(mode, max_gap, visible=None, num_template=3):
    cfg = small_cfg()
    proc = TrackProcessing(cfg, rng=np.random.default_rng(1))
    ds = FakeVideoDataset()
    if visible is not None:
        vis = np.asarray(visible, bool)
        orig = ds.get_sequence_info

        def info(seq_id):
            d = orig(seq_id)
            n = len(d["visible"])
            d["visible"] = vis[:n].copy()
            return d

        ds.get_sequence_info = info
    return GroundingAndTrackingSampler(
        [ds], [1.0], samples_per_epoch=100, max_gap=max_gap, processing=proc,
        num_search_frames=1, num_template_frames=num_template, mode="tracking",
        tokenizer=FakeTok(), max_query_len=12, seed=3,
        frame_sample_mode=mode)


def test_trident_gap_list_one_extra_template_per_entry():
    """sampler.py:580: `for max_gap in self.max_gap` — a 2-entry gap list
    yields 1 anchor + 2 dynamic template frame ids."""
    s = _trident_sampler("trident", max_gap=[5, 40], num_template=3)
    seq_id, info, visible = s._sample_seq(s.datasets[0])
    for _ in range(10):
        tids, sids = s._trident_frames(visible, None)
        assert len(tids) == 3 and len(sids) == 1
        assert all(visible[t] for t in tids)


def test_trident_pro_allows_invisible_dynamic_templates():
    """trident_pro samples dynamic templates with allow_invisible=True
    (sampler.py:586-588): with every frame near the search invisible, plain
    trident can never finish its gap loop but trident_pro succeeds."""
    n = 40
    vis = np.zeros(n, bool)
    vis[0] = vis[n - 1] = True  # only the two extremes visible
    s = _trident_sampler("trident_pro", max_gap=[3], visible=vis, num_template=2)
    rng = np.random.default_rng(0)
    hit_invisible = False
    for _ in range(20):
        out = s._trident_frames(np.concatenate([vis, np.ones(60, bool)])[:100], None)
        assert out is not None
        tids, _ = out
        if not all(np.concatenate([vis, np.ones(60, bool)])[:100][t] for t in tids[1:]):
            hit_invisible = True
    assert hit_invisible


def test_causal_mode_accepts_list_max_gap():
    """trident configs carry a list MAX_SAMPLE_INTERVAL; causal sampling
    collapses it to the widest entry (like _sample_grounding) instead of
    TypeError-ing on `gap += 5`."""
    s = _trident_sampler("causal", max_gap=[5, 40], num_template=1)
    out = s.sample_track(s.datasets[0])
    assert out is not None and int(out["flag"]) == 0


def test_grounding_test_pins_first_dataset():
    """The reference pins grounding validation to datasets[0]
    (sampler.py:504) so __len__'s sequence count and the index->sequence
    map agree; ratio-weighted picking across datasets would break both."""
    cfg = small_cfg()
    proc = TrackProcessing(cfg, rng=np.random.default_rng(1))
    ds0, ds1 = FakeVideoDataset(n_seq=3), FakeVideoDataset(n_seq=5)
    calls = {"ds0": 0, "ds1": 0}
    for name, d in (("ds0", ds0), ("ds1", ds1)):
        orig = d.get_frames

        def counted(seq_id, frame_ids, anno=None, _n=name, _o=orig):
            calls[_n] += 1
            return _o(seq_id, frame_ids, anno)

        d.get_frames = counted
    s = GroundingAndTrackingSampler(
        [ds0, ds1], [0.1, 0.9], samples_per_epoch=100, max_gap=10,
        processing=proc, num_search_frames=1, mode="grounding_test",
        tokenizer=FakeTok(), max_query_len=12, seed=3)
    assert len(s) == 3
    for i in range(6):
        out = s.sample(i)
        assert out is not None and int(out["flag"]) == 1
    assert calls["ds0"] > 0 and calls["ds1"] == 0


def test_sample_vl_distinct_path():
    s = _trident_sampler("causal", max_gap=10, num_template=1)
    out = s.sample_vl(s.datasets[0])
    assert out is not None and int(out["flag"]) == 2
    out0 = s.sample_track(s.datasets[0])
    assert out0 is not None and int(out0["flag"]) == 0
    # both carry real text tokens
    assert out["text_mask"].sum() > 0 and out0["text_mask"].sum() > 0


def test_loader_collates_frame_major(sampler):
    loader = SamplerLoader(sampler, batch_size=4, steps_per_epoch=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["template_images"].shape == (1, 4, 64, 64, 3)
    assert b["search_images"].shape == (2, 4, 128, 128, 3)
    assert b["search_cls"].shape == (2, 4, 8, 8)
    assert b["text"].shape == (2, 4, 12)
    assert b["flag"].shape == (4,)


def test_sample_target_np_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    img[40:60, 90:110] = 255  # white square target
    crop, rf, att = sample_target_np(img, [90, 40, 20, 20], 2.0, output_sz=80)
    assert crop.shape == (80, 80, 3)
    # target occupies the central half of the crop
    assert crop[40, 40, 0] == 255
    assert crop[5, 5, 0] == 0
    assert np.isclose(rf, 80 / 40)


def test_transform_image_to_crop_roundtrip():
    box_extract = np.array([90.0, 40.0, 20.0, 20.0])
    out = transform_image_to_crop(box_extract, box_extract, 2.0, 80.0, normalize=True)
    # centered box: (80-1)/2 maps to ~0.5 center
    cx = out[0] + out[2] / 2
    assert abs(cx - 0.49375) < 1e-6  # (79/2)/80


def test_grounding_resize_letterbox():
    img = np.full((100, 200, 3), 128, np.uint8)
    padded, box, att = grounding_resize_np(img, 128, [50, 25, 100, 50])
    assert padded.shape == (128, 128, 3)
    # letterbox: 200x100 -> 128x64, pad 32 top/bottom
    assert (padded[:32] == 0).all() and (padded[-32:] == 0).all()
    assert att[:32].all() and not att[64].any()
    # box remapped: x=50/200*128/128, y=(25/100*64+32)/128
    assert np.isclose(box[0], 50 / 200 * 128 / 128, atol=1e-6)
    assert np.isclose(box[1], (25 / 100 * 64 + 32) / 128, atol=1e-6)


def test_flip_phrase_and_directions():
    assert flip_phrase("the car on the left side") == "the car on the right side"
    assert flip_phrase("right of the left tree") == "left of the right tree"
    assert has_directions("the top shelf")
    assert not has_directions("a lefty pitcher")  # whole-word match only


def test_cls_label_np_matches_jnp():
    import jax.numpy as jnp

    from uvltrack_tpu.core.heatmap import generate_cls_label

    boxes = np.array([[0.25, 0.25, 0.5, 0.5], [0.6, 0.1, 0.2, 0.3]], np.float32)
    for dyn in (False, True):
        a = np.stack([generate_cls_label_np(b, 16, 0.7, dyn) for b in boxes])
        b = np.asarray(generate_cls_label(jnp.asarray(boxes), 16, 0.7, dyn))
        assert np.allclose(a, b, atol=1e-6), dyn
