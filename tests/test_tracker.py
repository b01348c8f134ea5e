import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.config import default_cfg
from uvltrack_tpu.track.tracker import Tracker
from test_model import tiny_model, tiny_inputs, NT


def tiny_cfg():
    c = default_cfg()
    c.DATA.TEMPLATE.SIZE = 32
    c.DATA.SEARCH.SIZE = 64
    c.TEST.TEMPLATE_SIZE = 32
    c.TEST.SEARCH_SIZE = 64
    c.TEST.TEMPLATE_FACTOR = 2.0
    c.TEST.SEARCH_FACTOR = 4.0
    c.TEST.MODE = "BBOX"
    c.TEST.UPDATE_INTERVAL = 2
    c.TEST.THRESHOLD = -1.0  # force the prompt-refresh path
    c.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN = NT
    return c


@pytest.fixture(scope="module")
def tracker():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(jax.random.PRNGKey(0))
    return Tracker(tiny_cfg(), model, variables, tokenizer=None)


def test_bbox_mode_tracks(tracker):
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    tracker.initialize(frame, {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    assert int(tracker.flag[0]) == 0
    boxes = []
    for i in range(5):
        frame = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
        out = tracker.track(frame)
        box = out["target_bbox"]
        assert len(box) == 4
        x, y, w, h = box
        assert 0 <= x <= 100 and 0 <= y <= 80
        assert w >= 10 and h >= 10  # margin clip
        assert np.isfinite(out["score"])
        boxes.append(box)
    assert int(tracker.state.frame_id) == 5
    # the update path ran at frames 2 and 4 (interval=2, threshold=-1):
    # max_score was reset at frame 4, then frame 5 set it again
    assert float(tracker.state.max_score) >= 0


def test_prompt_refresh_changes_prompt(tracker):
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    tracker.initialize(frame, {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    p0 = np.asarray(tracker.state.prompt, np.float32).copy()
    tracker.track(rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8))
    p1 = np.asarray(tracker.state.prompt, np.float32).copy()
    # frame 1: no refresh yet (1 % 2 != 0)
    assert np.allclose(p0, p1)
    tracker.track(rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8))
    p2 = np.asarray(tracker.state.prompt, np.float32).copy()
    # frame 2: refresh fired (threshold=-1 guarantees max_score > threshold)
    assert not np.allclose(p1, p2)
    assert float(tracker.state.max_score) == 0.0


def test_nlbbox_mode_uses_flag2(tracker, monkeypatch):
    # monkeypatch restores the module-scoped fixture's mode even when an
    # assertion fails mid-test (a trailing reset would be skipped and every
    # later test would inherit the wrong mode)
    monkeypatch.setitem(tracker.cfg.TEST, "MODE", "NLBBOX")
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    tracker.initialize(frame, {"init_bbox": [10, 10, 30, 30], "language": "a red box"})
    assert int(tracker.flag[0]) == 2
    out = tracker.track(rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8))
    assert len(out["target_bbox"]) == 4


def test_nl_mode_grounding_init(tracker, monkeypatch):
    monkeypatch.setitem(tracker.cfg.TEST, "MODE", "NL")
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
    out = tracker.initialize(frame, {"language": "the thing"})
    box = out["target_bbox"]
    assert len(box) == 4 and all(np.isfinite(box))
    assert int(tracker.flag[0]) == 2  # after grounding, tracking runs NLBBOX-style


def test_track_many_mixed_resolution_keeps_frame_alignment(tracker):
    """A mid-chunk resolution change must split the chunk at the mismatch,
    not filter it out (a filter skipped the odd frame and re-tracked frames
    after it, silently misaligning every later box with its frame)."""
    rng = np.random.default_rng(11)
    first = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(3)]
    frames.insert(1, rng.integers(0, 255, size=(96, 120, 3)).astype(np.uint8))

    tracker.initialize(first, {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    many = tracker.track_many(frames, chunk=4)

    tracker.initialize(first, {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    seq = np.stack([np.asarray(tracker.track_async(f), np.float64)
                    for f in frames])

    assert many.shape == (4, 5)
    np.testing.assert_allclose(many, seq, rtol=1e-5, atol=1e-4)


def test_track_debug_matches_track_and_exposes_maps(tracker):
    """track_debug shares the step math with track() (same _step_core); its
    box/score must match a replayed track() bit for bit, and the response
    maps must be (fsz, fsz) with merged = cls * hann * cont at the argmax."""
    rng = np.random.default_rng(7)
    first = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(3)]

    tracker.initialize(first, {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    dbg = [tracker.track_debug(f) for f in frames]

    tracker.initialize(first, {"init_bbox": [30.0, 20.0, 20.0, 24.0]})
    plain = [tracker.track(f) for f in frames]

    fsz = tracker.jt.map_size
    for d, p in zip(dbg, plain):
        assert d["target_bbox"] == p["target_bbox"]
        assert d["score"] == p["score"]
        for key in ("cls_map", "cont_map", "merged_map"):
            assert d[key].shape == (fsz, fsz)
            assert np.isfinite(d[key]).all()
        window = np.asarray(tracker.jt.window, np.float32).reshape(fsz, fsz)
        np.testing.assert_allclose(
            d["merged_map"], d["cls_map"] * window * d["cont_map"],
            rtol=1e-5, atol=1e-6)


def test_step_cost_reports_compiled_flops(tracker):
    """MFU accounting surface (bench.py): XLA cost analysis of the exact
    compiled per-frame step must yield positive flops/bytes."""
    shape = (64, 80, 3)
    img = np.random.default_rng(3).integers(
        0, 255, size=shape).astype(np.uint8)
    tracker.initialize(img, {"init_bbox": [10.0, 10.0, 20.0, 24.0]})
    cost = tracker.step_cost(shape)
    assert cost["flops"] > 0 and cost["bytes"] > 0


def test_cost_analysis_counts_scan_body_once():
    """Divisor contract for the batched MFU line: XLA cost analysis counts
    a lax.scan body ONCE regardless of trip count, so
    BatchTracker.step_many_cost callers divide by S, not T*S (bench.py
    under-read mfu_b_s16 4x before this was pinned down). If a jax upgrade
    starts multiplying by trip count, this fails and the divisors in
    bench.py/bench_capacity must gain the T factor back."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((64, 64))
    flops = []
    for n in (1, 4):
        f = jax.jit(
            lambda x, n=n: lax.scan(lambda c, _: (c @ c, None), x, None,
                                    length=n)[0])
        ca = f.lower(x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops.append(float(ca["flops"]))
    assert flops[0] > 0
    # length=4 adds a few flops of loop control (observed +2); a
    # trip-count-multiplied body would be ~4x
    assert flops[1] < 1.5 * flops[0], flops
