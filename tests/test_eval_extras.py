import os
import zipfile

import numpy as np
import pytest

from uvltrack_tpu.eval.packagers import transform_got10k, transform_trackingnet


def _fake_results(tmp_path, n_seq=2, n_frames=5):
    rdir = tmp_path / "results"
    rdir.mkdir()
    rng = np.random.default_rng(0)
    for k in range(n_seq):
        boxes = rng.uniform(10, 100, size=(n_frames, 4))
        np.savetxt(rdir / f"seq{k}.txt", np.round(boxes), delimiter="\t", fmt="%d")
        np.savetxt(rdir / f"seq{k}_time.txt", rng.uniform(0.01, 0.02, n_frames))
    return str(rdir)


def test_got10k_packager(tmp_path):
    rdir = _fake_results(tmp_path)
    zpath = transform_got10k(rdir, str(tmp_path / "out"))
    assert os.path.exists(zpath)
    with zipfile.ZipFile(zpath) as z:
        names = z.namelist()
        assert any(n.endswith("seq0/seq0_001.txt") or n == "seq0/seq0_001.txt"
                   for n in names)
        assert any("seq0_time.txt" in n for n in names)
        with z.open([n for n in names if n.endswith("seq0_001.txt")][0]) as f:
            line = f.readline().decode()
            assert "," in line  # comma-separated for the server


def test_trackingnet_packager(tmp_path):
    rdir = _fake_results(tmp_path)
    zpath = transform_trackingnet(rdir, str(tmp_path / "out"))
    with zipfile.ZipFile(zpath) as z:
        names = z.namelist()
        assert "seq0.txt" in names and "seq1.txt" in names
        assert not any("time" in n for n in names)


def test_plot_curves(tmp_path):
    from uvltrack_tpu.eval.metrics import sequence_curves
    from uvltrack_tpu.eval.plots import plot_curves

    anno = np.tile(np.array([[10.0, 10.0, 20.0, 20.0]]), (30, 1))
    good = [sequence_curves(anno.copy(), anno, "otb99")]
    bad = [sequence_curves(anno + np.array([15.0, 0, 0, 0]), anno, "otb99")]
    paths = plot_curves({"mine": good, "other": bad}, str(tmp_path))
    assert len(paths) == 6
    assert all(os.path.exists(p) for p in paths)


def test_per_sequence_results_and_filters(tmp_path):
    """Per-sequence AO table + ao_min/delta_ao filters
    (plot_results.py:442-505)."""
    from uvltrack_tpu.eval.data import Sequence, SequenceList
    from uvltrack_tpu.eval.metrics import per_sequence_results

    anno = np.tile([10.0, 10, 20, 20], (5, 1))
    ds = SequenceList([Sequence("good", [], "otb99", anno.copy()),
                       Sequence("bad", [], "otb99", anno.copy())])
    good_dir = tmp_path / "trk"
    good_dir.mkdir()
    np.savetxt(good_dir / "good.txt", anno, delimiter="\t", fmt="%d")
    np.savetxt(good_dir / "bad.txt", anno + np.array([18.0, 0, 0, 0]),
               delimiter="\t", fmt="%d")
    text = per_sequence_results({"mine": str(good_dir)}, ds, report=False)
    assert "good" in text and "bad" in text and "100.00" in text
    # ao_min < 50 keeps only the bad sequence
    text = per_sequence_results({"mine": str(good_dir)}, ds,
                                {"mode": "ao_min", "threshold": 50.0},
                                report=False)
    assert "bad" in text and "good" not in text
    # delta_ao across two identical trackers filters everything out
    text = per_sequence_results({"a": str(good_dir), "b": str(good_dir)}, ds,
                                {"mode": "delta_ao", "threshold": 5.0},
                                report=False)
    assert "bad" not in text and "good" not in text


def test_plot_got_success(tmp_path):
    import json

    from uvltrack_tpu.eval.plots import plot_got_success

    curve = list(np.linspace(1.0, 0.0, 101))
    (tmp_path / "a.json").write_text(json.dumps(
        {"TrackerA": {"succ_curve": curve, "ao": 0.5}}))
    (tmp_path / "b.json").write_text(json.dumps(
        {"TrackerB": {"overall": {"succ_curve": curve, "ao": 0.6}}}))
    paths = plot_got_success({"A": str(tmp_path / "a.json"),
                              "B": str(tmp_path / "b.json")},
                             str(tmp_path / "plots"))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_extract_results_cache_and_merge(tmp_path):
    """extract_results -> eval_data.pkl cache -> merge_multiple_runs flow
    (plot_results.py:45-88,170-197): cache is reused when valid (results
    deleted after first call), invalidated when the tracker set changes,
    and merging two runs averages their curves."""
    from uvltrack_tpu.eval.data import Sequence, SequenceList
    from uvltrack_tpu.eval.metrics import (aggregate_scores,
                                           check_and_load_precomputed_results,
                                           eval_data_scores,
                                           merge_multiple_runs)

    anno = np.tile([10.0, 10, 20, 20], (6, 1))
    ds = SequenceList([Sequence("s1", [], "otb99", anno.copy()),
                       Sequence("s2", [], "otb99", anno.copy())])
    runs = []
    for r, shift in ((0, 0.0), (1, 6.0)):
        d = tmp_path / f"run{r}"
        d.mkdir()
        for s in ds:
            np.savetxt(d / f"{s.name}.txt",
                       anno + np.array([shift, 0, 0, 0]), delimiter="\t",
                       fmt="%d")
        runs.append({"name": "uvltrack", "param": "base", "run_id": r,
                     "results_dir": str(d)})

    plot_dir = str(tmp_path / "plots")
    data = check_and_load_precomputed_results(runs, ds, plot_dir)
    assert (tmp_path / "plots" / "eval_data.pkl").exists()
    succ = np.asarray(data["ave_success_rate_plot_overlap"])
    assert succ.shape == (2, 2, 21)

    # cache hit: delete the result files; the scores must still come back
    for r in (0, 1):
        for s in ds:
            (tmp_path / f"run{r}" / f"{s.name}.txt").unlink()
    data2 = check_and_load_precomputed_results(runs, ds, plot_dir)
    np.testing.assert_allclose(
        np.asarray(data2["ave_success_rate_plot_overlap"]), succ)

    # invalidation: different tracker set must recompute -> missing files
    other = [dict(runs[0], run_id=7)]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        check_and_load_precomputed_results(other, ds, plot_dir)

    # merge: two runs of the same param -> one entry, curves averaged
    merged = merge_multiple_runs(data2)
    assert len(merged["trackers"]) == 1
    np.testing.assert_allclose(
        np.asarray(merged["ave_success_rate_plot_overlap"])[:, 0],
        succ.mean(1))
    scores = eval_data_scores(merged)
    assert scores["AUC"].shape == (1,)
    # run0 is perfect (AUC from IoU=1 frames), run1 shifted; the merged AUC
    # sits strictly between the two per-run AUCs
    per_run = eval_data_scores(data2)["AUC"]
    assert per_run[0] > per_run[1]
    assert per_run[1] < scores["AUC"][0] < per_run[0]
