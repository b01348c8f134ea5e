import jax
import numpy as np
import pytest

from uvltrack_tpu.track.batch import BatchTracker
from test_model import tiny_model, tiny_inputs
from test_tracker import tiny_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


@pytest.fixture(scope="module")
def bt():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(jax.random.PRNGKey(0))
    return BatchTracker(tiny_cfg(), model, variables, num_streams=4, tokenizer=None)


def test_batch_tracking_lockstep(bt):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(4)]
    boxes = np.array([[30, 20, 20, 24], [10, 10, 30, 30],
                      [50, 40, 20, 20], [5, 5, 15, 15]], np.float32)
    bt.initialize(frames, boxes)
    for t in range(4):
        batch = np.stack([rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                          for _ in range(4)])
        out = bt.step(batch)
        assert out.shape == (4, 5)
        assert np.isfinite(out).all()
        x, y, w, h = out[:, 0], out[:, 1], out[:, 2], out[:, 3]
        assert (x >= 0).all() and (y >= 0).all()
        assert (w >= 10).all() and (h >= 10).all()
    assert np.asarray(bt.state.frame_id).tolist() == [4, 4, 4, 4]


def test_batch_inactive_streams_frozen(bt):
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(4)]
    boxes = np.array([[30, 20, 20, 24]] * 4, np.float32)
    bt.initialize(frames, boxes)
    bt.set_active(np.array([True, True, False, False]))
    batch = np.stack([rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                      for _ in range(4)])
    out = bt.step(batch)
    state_boxes = np.asarray(bt.state.box)
    # inactive streams keep the init box; frame counter doesn't advance
    assert np.allclose(state_boxes[2], boxes[2])
    assert np.allclose(state_boxes[3], boxes[3])
    assert np.asarray(bt.state.frame_id).tolist() == [1, 1, 0, 0]


def test_batch_tracker_sharded_over_mesh_matches_single_chip():
    """mesh=Mesh(8 devices): streams shard over "data"; per-frame outputs
    must match the unsharded tracker bit-for-near (pure data parallelism —
    no cross-stream math in the step)."""
    from uvltrack_tpu.parallel.mesh import make_mesh

    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    S = 8
    mesh = make_mesh(data=8, model=1)
    bt_m = BatchTracker(tiny_cfg(), model, variables, num_streams=S, mesh=mesh)
    bt_1 = BatchTracker(tiny_cfg(), model, variables, num_streams=S)

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(S)]
    boxes = np.tile([30.0, 20, 20, 24], (S, 1)).astype(np.float32)
    boxes[:, 0] += np.arange(S)
    bt_m.initialize(frames, boxes)
    bt_1.initialize(frames, boxes)

    # state is actually sharded over the mesh
    assert not bt_m.state.box.sharding.is_fully_replicated
    assert "data" in str(bt_m.state.box.sharding.spec)
    for t in range(3):
        batch = np.stack([rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                          for _ in range(S)])
        out_m = bt_m.step(batch)
        out_1 = bt_1.step(batch)
        np.testing.assert_allclose(out_m, out_1, rtol=1e-5, atol=1e-4)
    assert np.asarray(bt_m.state.frame_id).tolist() == [3] * S


def test_batch_tracker_mesh_pads_non_divisible_streams():
    """run_dataset_batched buckets sequences by resolution, so remainder
    groups are any size — a 5-stream group on an 8-device mesh must pad
    internally (replayed streams, outputs sliced off) and match the
    unsharded tracker."""
    from uvltrack_tpu.parallel.mesh import make_mesh

    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    S = 5
    mesh = make_mesh(data=8, model=1)
    bt_m = BatchTracker(tiny_cfg(), model, variables, num_streams=S, mesh=mesh)
    bt_1 = BatchTracker(tiny_cfg(), model, variables, num_streams=S)
    assert bt_m.S_pad == 8 and bt_m.S == 5 and bt_1.S_pad == 5

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(S)]
    boxes = np.tile([30.0, 20, 20, 24], (S, 1)).astype(np.float32)
    boxes[:, 0] += np.arange(S)
    bt_m.initialize(frames, boxes)
    bt_1.initialize(frames, boxes)
    bt_m.set_active(np.array([True] * 4 + [False]))
    bt_1.set_active(np.array([True] * 4 + [False]))

    for t in range(2):
        batch = np.stack([rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
                          for _ in range(S)])
        out_m = bt_m.step(batch)
        out_1 = bt_1.step(batch)
        assert out_m.shape == (S, 5)
        np.testing.assert_allclose(out_m, out_1, rtol=1e-5, atol=1e-4)
    # the frozen stream plus the pad streams never advance
    assert np.asarray(bt_m.state.frame_id).tolist() == [2] * 4 + [0] * 4


def test_step_many_matches_sequential_steps(bt):
    """Scan-chunked stepping (one dispatch for T frames) must produce the
    same per-frame outputs and final state as T sequential step() calls."""
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(4)]
    boxes = np.array([[30, 20, 20, 24], [10, 10, 30, 30],
                      [50, 40, 20, 20], [5, 5, 15, 15]], np.float32)
    T = 3
    blocks = np.stack([np.stack([
        rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
        for _ in range(4)]) for _ in range(T)])

    bt.initialize(frames, boxes)
    seq = np.stack([bt.step(blocks[t]) for t in range(T)])
    seq_state = jax.tree_util.tree_map(np.asarray, bt.state)

    bt.initialize(frames, boxes)
    many = bt.step_many(blocks)
    many_state = jax.tree_util.tree_map(np.asarray, bt.state)

    np.testing.assert_allclose(many, seq, atol=1e-4, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(many_state),
                    jax.tree_util.tree_leaves(seq_state)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   atol=1e-4, rtol=1e-5)


def test_nl_mode_grounds_instead_of_using_gt_box():
    """NL-mode streams derive frame-0 from the grounding forward — the
    placeholder boxes the runner passes must be IGNORED (GT leaking into
    the grounding protocol would inflate NL benchmark numbers), and the
    grounded boxes must match the single Tracker's per stream."""
    from uvltrack_tpu.track.tracker import Tracker

    cfg = tiny_cfg()
    cfg.TEST.MODE = "NL"
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    # portrait frames (h > w): exercises the letterbox x-offset branch of
    # the map-back (min(0, (iw-ih)/2) is 0 for landscape, negative here)
    frames = [rng.integers(0, 255, size=(96, 64, 3)).astype(np.uint8)
              for _ in range(2)]
    gt = np.array([[5, 5, 10, 10], [40, 30, 12, 12]], np.float32)

    bt = BatchTracker(cfg, model, variables, num_streams=2, tokenizer=None)
    init_boxes = bt.initialize(frames, gt, languages=["a thing", "the dog"])
    assert init_boxes.shape == (2, 4)
    # the GT placeholder was NOT used as the initial box...
    assert not np.allclose(init_boxes, gt)
    assert np.allclose(np.asarray(bt.state.box), init_boxes, atol=1e-4)

    # ...and each grounded box matches the single tracker's NL init
    for i in range(2):
        single = Tracker(cfg, model, variables, tokenizer=None)
        out = single.initialize(frames[i], {"language": ["a thing",
                                                         "the dog"][i]})
        np.testing.assert_allclose(init_boxes[i],
                                   np.asarray(out["target_bbox"]),
                                   rtol=1e-3, atol=1e-3)


def test_cond_remine_matches_unconditional(monkeypatch):
    """The cond-gated prompt re-mine (UVLTRACK_BATCH_COND_REMINE=1, the
    default) must be bit-equivalent to the unconditional where-select:
    tiny_cfg refreshes every 2 frames (THRESHOLD=-1), so steps 1/3 take the
    skip branch and steps 2/4 the remine branch."""
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(3)]
    boxes = np.array([[30, 20, 20, 24], [10, 10, 30, 30],
                      [50, 40, 20, 20]], np.float32)
    batches = [np.stack([rng.integers(0, 255, size=(80, 100, 3))
                         .astype(np.uint8) for _ in range(3)])
               for _ in range(4)]

    outs = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("UVLTRACK_BATCH_COND_REMINE", knob)
        bt = BatchTracker(tiny_cfg(), model, variables, num_streams=3,
                          tokenizer=None)  # fresh _step_cache: knob read at trace
        bt.initialize(frames, boxes)
        outs[knob] = [np.asarray(bt.step(b)) for b in batches]
        outs[knob].append(np.asarray(bt.state.prompt))

    for a, b in zip(outs["1"], outs["0"]):
        np.testing.assert_array_equal(a, b)


def test_step_many_cost_reports_compiled_flops(bt):
    """Batched MFU accounting surface (bench.py's s16 sweep leg): cost
    analysis of the exact compiled lockstep chunk program."""
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
              for _ in range(4)]
    boxes = np.array([[30, 20, 20, 24], [10, 10, 30, 30],
                      [50, 40, 20, 20], [5, 5, 15, 15]], np.float32)
    bt.initialize(frames, boxes)
    block = np.stack([np.stack(frames)] * 2)  # (T=2, S=4, H, W, 3)
    cost = bt.step_many_cost(block)
    assert cost["flops"] > 0 and cost["bytes"] > 0
    # per-frame division uses the DEVICE stream count (S_pad under a mesh)
    assert cost["streams"] == bt.S_pad
