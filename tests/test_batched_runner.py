import os

import jax
import numpy as np
import pytest

from uvltrack_tpu.eval.data import Sequence, SequenceList
from uvltrack_tpu.eval.metrics import evaluate_results_dir
from uvltrack_tpu.eval.running_batched import run_dataset_batched
from uvltrack_tpu.track.batch import BatchTracker
from test_model import tiny_model, tiny_inputs
from test_tracker import tiny_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


def _dataset(tmp_path, lengths=(4, 6, 3)):
    rng = np.random.default_rng(0)
    seqs = []
    for k, n in enumerate(lengths):
        frames = []
        for i in range(n):
            p = tmp_path / f"s{k}_f{i}.npy"
            np.save(p, rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8))
            frames.append(str(p))
        gt = np.tile(np.array([[10.0 + k, 12.0, 20.0, 18.0]]), (n, 1))
        seqs.append(Sequence(f"s{k}", frames, "otb99", gt))
    return SequenceList(seqs)


def test_batched_runner_outputs_match_contract(tmp_path):
    ds = _dataset(tmp_path)
    model = tiny_model()
    variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
        jax.random.PRNGKey(0))
    cfg = tiny_cfg()
    cfg.TEST.MODE = "BBOX"

    rdir = str(tmp_path / "results")
    stats = run_dataset_batched(
        lambda S: BatchTracker(cfg, model, variables, num_streams=S),
        ds, rdir, num_streams=2, image_loader=np.load, verbose=False)
    assert stats["sequences"] == 3
    for k, n in enumerate((4, 6, 3)):
        pred = np.loadtxt(os.path.join(rdir, f"s{k}.txt"), delimiter="\t")
        assert pred.shape == (n, 4)
        # first row is the init gt box
        assert np.allclose(pred[0], [10 + k, 12, 20, 18], atol=1.0)
    scores = evaluate_results_dir(rdir, ds, report=False)
    assert scores["n_missing"] == 0
    # resumable
    stats2 = run_dataset_batched(
        lambda S: BatchTracker(cfg, model, variables, num_streams=S),
        ds, rdir, num_streams=2, image_loader=np.load, verbose=False)
    assert stats2["sequences"] == 0


def test_batched_runner_dispatches_lmdb_frame_refs(tmp_path):
    """(db_path, key) frame refs must decode through lmdb_utils in the
    batched runner too (shared dispatching_loader)."""
    import cv2

    from uvltrack_tpu.utils.lmdb_native import write_lmdb

    rng = np.random.default_rng(1)
    env = str(tmp_path / "env")
    n = 4
    entries = {}
    frames = []
    for i in range(n):
        img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img[..., ::-1])
        assert ok
        key = f"seq/{i:08d}.jpg"
        entries[key] = bytes(buf)
        frames.append((env, key))
    write_lmdb(env, entries.items())

    gt = np.tile(np.array([[10.0, 12.0, 20.0, 18.0]]), (n, 1))
    ds = SequenceList([Sequence("lm0", frames, "otb99", gt)])

    model = tiny_model()
    variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
        jax.random.PRNGKey(0))
    cfg = tiny_cfg()
    cfg.TEST.MODE = "BBOX"
    rdir = str(tmp_path / "results")
    stats = run_dataset_batched(
        lambda S: BatchTracker(cfg, model, variables, num_streams=S),
        ds, rdir, num_streams=1, verbose=False)
    assert stats["sequences"] == 1
    pred = np.loadtxt(os.path.join(rdir, "lm0.txt"), delimiter="\t")
    assert pred.shape == (n, 4)


def test_batched_runner_isolates_failing_stream(tmp_path, capsys):
    """A corrupt frame mid-sequence must fail ONLY its stream — the rest of
    the group and the remaining groups keep tracking and save results
    (per-sequence analogue of the sequential runner's try/except). A
    frame-0 failure (init-time) is isolated at the group level."""
    ds = _dataset(tmp_path, lengths=(4, 5, 3))
    # corrupt a mid-sequence frame of s0 (group 1 is [s0, s1] at streams=2)
    bad = str(tmp_path / "s0_f2.npy")
    with open(bad, "wb") as f:
        f.write(b"not a numpy file")

    model = tiny_model()
    variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
        jax.random.PRNGKey(0))
    cfg = tiny_cfg()
    cfg.TEST.MODE = "BBOX"
    rdir = str(tmp_path / "results")
    stats = run_dataset_batched(
        lambda S: BatchTracker(cfg, model, variables, num_streams=S),
        ds, rdir, num_streams=2, image_loader=np.load, verbose=False)
    out = capsys.readouterr().out
    assert "s0 failed" in out and "re-run" in out
    # s1 (same group as the corrupt s0) AND s2 completed and saved
    assert stats["sequences"] == 2
    assert os.path.isfile(os.path.join(rdir, "s1.txt"))
    assert os.path.isfile(os.path.join(rdir, "s2.txt"))
    assert not os.path.isfile(os.path.join(rdir, "s0.txt"))
    pred = np.loadtxt(os.path.join(rdir, "s1.txt"), delimiter="\t")
    assert pred.shape == (5, 4)  # s1 tracked to ITS full length


def test_batched_runner_freezes_stream_on_resolution_change(tmp_path, capsys):
    """Bucketing only checks frame 0: a mid-sequence resolution change must
    freeze that stream (no stacked-shape crash), not kill the group."""
    ds = _dataset(tmp_path, lengths=(4, 4))
    rng = np.random.default_rng(3)
    np.save(tmp_path / "s0_f2.npy",
            rng.integers(0, 255, size=(32, 48, 3)).astype(np.uint8))

    model = tiny_model()
    variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
        jax.random.PRNGKey(0))
    cfg = tiny_cfg()
    cfg.TEST.MODE = "BBOX"
    rdir = str(tmp_path / "results")
    stats = run_dataset_batched(
        lambda S: BatchTracker(cfg, model, variables, num_streams=S),
        ds, rdir, num_streams=2, image_loader=np.load, verbose=False)
    out = capsys.readouterr().out
    assert "shape change" in out
    assert stats["sequences"] == 1
    assert os.path.isfile(os.path.join(rdir, "s1.txt"))
    assert not os.path.isfile(os.path.join(rdir, "s0.txt"))
