"""End-to-end slice: tiny model tracks a moving bright square through a
synthetic OTB99-style on-disk dataset via the full eval pipeline
(run_dataset -> Tracker -> result txt -> metrics). BASELINE.json config 1
(CPU-runnable demo clip) mechanics."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from uvltrack_tpu.eval.datasets import get_dataset
from uvltrack_tpu.eval.environment import reset_env_cache
from uvltrack_tpu.eval.metrics import evaluate_results_dir
from uvltrack_tpu.eval.running import run_dataset
from uvltrack_tpu.track.tracker import Tracker
from test_model import tiny_model, tiny_inputs
from test_tracker import tiny_cfg

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


def _make_otb99_layout(root, n_frames=6):
    """One sequence of a white square drifting right on black background."""
    (root / "OTB_query_test").mkdir(parents=True)
    vdir = root / "OTB_videos" / "Square" / "img"
    vdir.mkdir(parents=True)
    boxes = []
    for i in range(n_frames):
        img = np.zeros((80, 120, 3), np.uint8)
        x = 20 + 4 * i
        img[30:54, x: x + 24] = 255
        cv2.imwrite(str(vdir / f"{i:04d}.jpg"), img)
        boxes.append([x, 30, 24, 24])
    np.savetxt(root / "OTB_videos" / "Square" / "groundtruth_rect.txt",
               np.asarray(boxes), delimiter=",", fmt="%d")
    (root / "OTB_query_test" / "Square.txt").write_text("the white square\n")


def test_full_eval_pipeline(tmp_path, monkeypatch):
    _make_otb99_layout(tmp_path / "otb")
    monkeypatch.setenv("UVLTRACK_OTB99_PATH", str(tmp_path / "otb"))
    reset_env_cache()
    try:
        dataset = get_dataset("otb99")
        assert len(dataset) == 1 and dataset[0].language == "the white square"

        model = tiny_model()
        variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
            jax.random.PRNGKey(0))
        cfg = tiny_cfg()
        cfg.TEST.MODE = "BBOX"

        rdir = str(tmp_path / "results")
        stats = run_dataset(lambda: Tracker(cfg, model, variables), dataset, rdir,
                            verbose=False)
        assert stats["sequences"] == 1 and stats["frames"] == 6

        pred = np.loadtxt(os.path.join(rdir, "Square.txt"), delimiter="\t")
        assert pred.shape == (6, 4)
        assert np.isfinite(pred).all()
        times = np.loadtxt(os.path.join(rdir, "Square_time.txt"))
        assert times.shape == (6,)

        scores = evaluate_results_dir(rdir, dataset, report=False)
        assert 0.0 <= scores["AUC"] <= 100.0  # random weights: no quality claim
        assert scores["n_missing"] == 0

        # resumability
        stats2 = run_dataset(lambda: Tracker(cfg, model, variables), dataset, rdir,
                             verbose=False)
        assert stats2["sequences"] == 0

        # scan-chunked tracking must produce the same boxes as per-frame mode
        rdir2 = str(tmp_path / "results_chunked")
        run_dataset(lambda: Tracker(cfg, model, variables), dataset, rdir2,
                    verbose=False, chunk=3)
        pred_chunked = np.loadtxt(os.path.join(rdir2, "Square.txt"), delimiter="\t")
        assert np.allclose(pred_chunked, pred, atol=1.0)  # results saved as ints
    finally:
        reset_env_cache()
