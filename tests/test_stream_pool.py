"""StreamPool: continuous batching — dynamic join/leave on one lockstep step.

Locks the pool against standalone Trackers fed the identical frames: slots
that join mid-flight, slots frozen for a round, and slots reused after a
close must each reproduce the single-stream trajectory (same tolerance as
the BatchTracker-vs-Tracker parity in test_batch_tracker.py).
"""

import jax
import numpy as np
import pytest

from uvltrack_tpu.track.pool import StreamPool
from uvltrack_tpu.track.tracker import Tracker
from test_model import tiny_model, tiny_inputs
from test_tracker import tiny_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`

TOL = dict(rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def built():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    return tiny_cfg(), model, variables


def _frames(seed, n, hw=(80, 100)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, size=hw + (3,)).astype(np.uint8)
            for _ in range(n)]


def _standalone(built, frames, box):
    cfg, model, variables = built
    t = Tracker(cfg, model, variables)
    t.initialize(frames[0], {"init_bbox": list(box)})
    return [t.track(f) for f in frames[1:]]


def test_dynamic_join_freeze_and_slot_reuse(built):
    cfg, model, variables = built
    pool = StreamPool(cfg, model, variables, capacity=2)

    fa = _frames(1, 5)   # stream A: init + 4 tracked
    fb = _frames(2, 5)   # stream B: joins two rounds later
    fc = _frames(3, 2)   # stream C: reuses A's slot after close
    box_a, box_b, box_c = [30, 20, 20, 24], [10, 10, 30, 30], [40, 30, 25, 20]

    got_a, got_b, got_c = [], [], []
    assert pool.open("A", fa[0], {"init_bbox": box_a}) == [float(v) for v in box_a]
    got_a.append(pool.submit({"A": fa[1]})["A"])
    got_a.append(pool.submit({"A": fa[2]})["A"])
    pool.open("B", fb[0], {"init_bbox": box_b})          # joins mid-flight
    out = pool.submit({"A": fa[3], "B": fb[1]})
    got_a.append(out["A"]); got_b.append(out["B"])
    got_b.append(pool.submit({"B": fb[2]})["B"])         # A frozen this round
    out = pool.submit({"A": fa[4], "B": fb[3]})
    got_a.append(out["A"]); got_b.append(out["B"])
    pool.close("A")
    pool.open("C", fc[0], {"init_bbox": box_c})          # reuses A's slot
    assert pool.open_streams == ["B", "C"]
    out = pool.submit({"B": fb[4], "C": fc[1]})
    got_b.append(out["B"]); got_c.append(out["C"])

    for got, frames, box in ((got_a, fa, box_a), (got_b, fb, box_b),
                             (got_c, fc, box_c)):
        want = _standalone(built, frames, box)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g["bbox"], w["target_bbox"], **TOL)
            np.testing.assert_allclose(g["score"], w["score"], **TOL)


def test_pool_full_unknown_and_mixed_resolution(built):
    cfg, model, variables = built
    pool = StreamPool(cfg, model, variables, capacity=1)
    f = _frames(7, 2)
    pool.open("A", f[0], {"init_bbox": [5, 5, 20, 20]})
    with pytest.raises(RuntimeError, match="pool full"):
        pool.open("B", f[0], {"init_bbox": [5, 5, 20, 20]})
    with pytest.raises(LookupError, match="not open"):
        pool.submit({"ghost": f[1]})
    with pytest.raises(LookupError, match="not open"):
        pool.close("ghost")
    assert pool.submit({}) == {}
    # re-open of a live stream re-initializes in place (no second slot)
    pool.open("A", f[1], {"init_bbox": [8, 8, 22, 22]})
    assert pool.open_streams == ["A"]
    pool.close("A")
    pool.open("B", f[0], {"init_bbox": [5, 5, 20, 20]})  # freed slot reused

    pool2 = StreamPool(cfg, model, variables, capacity=2)
    g = _frames(8, 1, hw=(64, 96))
    pool2.open("A", f[0], {"init_bbox": [5, 5, 20, 20]})
    pool2.open("B", g[0], {"init_bbox": [5, 5, 20, 20]})
    with pytest.raises(ValueError, match="one resolution"):
        pool2.submit({"A": f[0], "B": g[0]})


def test_nl_mode_open_grounds_like_single_tracker():
    """NL-mode open(): the slot's initial box comes from the grounding
    forward (a supplied bbox must be ignored), matching Tracker's NL init —
    incl. the portrait letterbox offset branch."""
    cfg = tiny_cfg()
    cfg.TEST.MODE = "NL"
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 255, size=(96, 64, 3)).astype(np.uint8)

    pool = StreamPool(cfg, model, variables, capacity=2)
    got = pool.open("A", frame, {"language": "a thing",
                                 "init_bbox": [1, 1, 2, 2]})  # ignored

    single = Tracker(cfg, model, variables)
    want = single.initialize(frame, {"language": "a thing"})["target_bbox"]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    assert not np.allclose(got, [1, 1, 2, 2])

    # and the tracked trajectory after a grounded init matches too
    nxt = rng.integers(0, 255, size=(96, 64, 3)).astype(np.uint8)
    out = pool.submit({"A": nxt})["A"]
    want2 = single.track(nxt)
    np.testing.assert_allclose(out["bbox"], want2["target_bbox"],
                               rtol=1e-5, atol=1e-4)


def test_pool_sharded_over_mesh_matches_unsharded():
    """mesh mode: slots shard over the 8-device virtual "data" axis
    (capacity 5 -> padded device arrays of 8); dynamic joins, a frozen
    round, and a slot reuse must reproduce the unsharded pool exactly."""
    from uvltrack_tpu.parallel.mesh import make_mesh

    cfg, model, _ = None, None, None
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    cfg = tiny_cfg()
    mesh = make_mesh(data=8, model=1)
    pm = StreamPool(cfg, model, variables, capacity=5, mesh=mesh)
    p1 = StreamPool(cfg, model, variables, capacity=5)
    assert pm.bt.S_pad == 8

    f = {s: _frames(ord(s), 3) for s in "abc"}
    boxes = {"a": [30, 20, 20, 24], "b": [10, 10, 30, 30],
             "c": [40, 30, 25, 20]}
    for pool in (pm, p1):
        pool.open("a", f["a"][0], {"init_bbox": boxes["a"]})
        pool.open("b", f["b"][0], {"init_bbox": boxes["b"]})
    # state is actually sharded over the mesh
    assert not pm.bt.state.box.sharding.is_fully_replicated
    assert "data" in str(pm.bt.state.box.sharding.spec)

    out_m = pm.submit({"a": f["a"][1], "b": f["b"][1]})
    out_1 = p1.submit({"a": f["a"][1], "b": f["b"][1]})
    for s in ("a", "b"):
        np.testing.assert_allclose(out_m[s]["bbox"], out_1[s]["bbox"],
                                   rtol=1e-5, atol=1e-4)
    # frozen round for a, then slot churn
    for pool in (pm, p1):
        pool.submit({"b": f["b"][2]})
        pool.close("a")
        pool.open("c", f["c"][0], {"init_bbox": boxes["c"]})
    out_m = pm.submit({"c": f["c"][1], "b": f["b"][1]})
    out_1 = p1.submit({"c": f["c"][1], "b": f["b"][1]})
    for s in ("c", "b"):
        np.testing.assert_allclose(out_m[s]["bbox"], out_1[s]["bbox"],
                                   rtol=1e-5, atol=1e-4)
    # sharding survived the row writes
    assert "data" in str(pm.bt.state.box.sharding.spec)
