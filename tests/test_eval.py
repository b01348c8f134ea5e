import os

import numpy as np
import pytest

from uvltrack_tpu.eval import metrics as M
from uvltrack_tpu.eval.data import Sequence, SequenceList
from uvltrack_tpu.eval.running import run_dataset, save_results


def test_iou_overlap_plus_one_convention():
    # reference IoU uses the legacy +1 pixel convention
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    iou = M.calc_iou_overlap(a, a)
    assert np.allclose(iou, 1.0)
    b = np.array([[5.0, 0.0, 10.0, 10.0]])
    iou = M.calc_iou_overlap(a, b)
    # intersection width = min(9,14)-max(0,5)+1 = 5 -> wait: br=min(9,14)=9, tl=5 -> 9-5+1=5
    inter = 5 * 10
    union = 100 + 100 - inter
    assert np.allclose(iou, inter / union)


def test_seq_err_first_frame_forced_and_zero_carryforward():
    anno = np.array([[0, 0, 10, 10], [5, 5, 10, 10], [6, 6, 10, 10]], np.float64)
    pred = np.array([[100, 100, 3, 3], [5, 5, 10, 10], [0, 0, 0, 0]], np.float64)
    ov, ec, ecn, valid = M.calc_seq_err_robust(pred, anno, "otb99")
    assert ov[0] == 1.0  # first frame forced to gt
    # zero-size frame 2 carried forward from frame 1 => compare [5,5,10,10] vs [6,6,10,10]
    tl = np.maximum([5, 5], [6, 6])
    br = np.minimum([5 + 9, 5 + 9], [6 + 9, 6 + 9])
    inter = (br[0] - tl[0] + 1) * (br[1] - tl[1] + 1)
    assert np.allclose(ov[2], inter / (200 - inter))
    assert valid.all()


def test_perfect_tracker_scores_100():
    anno = np.tile(np.array([[10.0, 10.0, 20.0, 20.0]]), (30, 1))
    c = M.sequence_curves(anno.copy(), anno, "otb99")
    s = M.aggregate_scores([c])
    assert s["AUC"] > 95.0  # success curve is 1 up to overlap threshold 1.0 bin
    assert s["Precision"] == 100.0
    assert s["NormPrec"] == 100.0
    assert s["OP50"] == 100.0


def test_shifted_tracker_lower_auc():
    anno = np.tile(np.array([[10.0, 10.0, 20.0, 20.0]]), (30, 1))
    pred = anno + np.array([8.0, 0, 0, 0])
    s_good = M.aggregate_scores([M.sequence_curves(anno.copy(), anno, "otb99")])
    s_bad = M.aggregate_scores([M.sequence_curves(pred, anno, "otb99")])
    assert s_bad["AUC"] < s_good["AUC"]
    assert s_bad["Precision"] == 100.0  # 8px < 20px threshold


class DummyTracker:
    """Always predicts the init box."""

    def initialize(self, image, info):
        self.box = list(info["init_bbox"])
        return {"target_bbox": self.box}

    def track(self, image, info=None):
        return {"target_bbox": self.box}


def _synthetic_dataset(tmp_path, n_seq=2, n_frames=4):
    seqs = []
    rng = np.random.default_rng(0)
    for k in range(n_seq):
        frames = []
        for i in range(n_frames):
            p = tmp_path / f"seq{k}_f{i}.npy"
            np.save(p, rng.integers(0, 255, size=(40, 60, 3)).astype(np.uint8))
            frames.append(str(p))
        gt = np.tile(np.array([[5.0 + k, 6.0, 12.0, 14.0]]), (n_frames, 1))
        seqs.append(Sequence(f"seq{k}", frames, "otb99", gt))
    return SequenceList(seqs)


def _npy_loader(path):
    return np.load(path)


def test_runner_saves_and_resumes(tmp_path):
    ds = _synthetic_dataset(tmp_path)
    rdir = str(tmp_path / "results")
    stats = run_dataset(lambda: DummyTracker(), ds, rdir, image_loader=_npy_loader,
                        verbose=False)
    assert stats["sequences"] == 2
    assert os.path.isfile(os.path.join(rdir, "seq0.txt"))
    assert os.path.isfile(os.path.join(rdir, "seq0_time.txt"))
    boxes = np.loadtxt(os.path.join(rdir, "seq0.txt"), delimiter="\t")
    assert boxes.shape == (4, 4)
    assert boxes.dtype == np.float64 and np.allclose(boxes, np.round(boxes))
    # resume: nothing re-run
    stats2 = run_dataset(lambda: DummyTracker(), ds, rdir, image_loader=_npy_loader,
                         verbose=False)
    assert stats2["sequences"] == 0
    # scoring the saved results: dummy == gt => perfect
    scores = M.evaluate_results_dir(rdir, ds, report=False)
    assert scores["Precision"] == 100.0
    assert scores["n_missing"] == 0
    # reference result files may be space-delimited — scoring must sniff that
    for name in ("seq0", "seq1"):
        rows = np.loadtxt(os.path.join(rdir, f"{name}.txt"), delimiter="\t")
        np.savetxt(os.path.join(rdir, f"{name}.txt"), rows, fmt="%d",
                   delimiter=" ")
    scores = M.evaluate_results_dir(rdir, ds, report=False)
    assert scores["Precision"] == 100.0


def test_dataset_adapters_on_synthetic_layout(tmp_path, monkeypatch):
    # OTB99-style layout
    base = tmp_path / "otb"
    (base / "OTB_videos" / "Biker" / "img").mkdir(parents=True)
    (base / "OTB_query_test").mkdir(parents=True)
    np.savetxt(base / "OTB_videos" / "Biker" / "groundtruth_rect.txt",
               np.array([[1, 2, 3, 4], [2, 3, 4, 5]]), delimiter=",", fmt="%d")
    for i in range(2):
        (base / "OTB_videos" / "Biker" / "img" / f"{i:04d}.jpg").write_bytes(b"x")
    (base / "OTB_query_test" / "Biker.txt").write_text("a person on a bike\n")

    monkeypatch.setenv("UVLTRACK_OTB99_PATH", str(base))
    from uvltrack_tpu.eval.environment import reset_env_cache

    reset_env_cache()
    from uvltrack_tpu.eval.datasets import get_dataset

    ds = get_dataset("otb99")
    assert len(ds) == 1
    assert ds[0].name == "Biker"
    assert ds[0].language == "a person on a bike"
    assert ds[0].ground_truth_rect.shape == (2, 4)
    assert len(ds[0].frames) == 2
    reset_env_cache()
