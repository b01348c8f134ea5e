import os
import zipfile

import numpy as np
import pytest

from uvltrack_tpu.data.grounding_aug import (grounding_augment, random_size_crop,
                                             random_translate_letterbox)
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


def test_random_size_crop_keeps_target():
    rng = np.random.default_rng(0)
    im = np.zeros((100, 120, 3), np.uint8)
    box = np.array([40.0, 30.0, 30.0, 30.0])
    for _ in range(10):
        crop, nb = random_size_crop(im, box, rng, min_keep_iou=0.9)
        kept = nb[2] * nb[3] / (box[2] * box[3])
        assert kept >= 0.89
        assert nb[0] >= 0 and nb[1] >= 0
        assert nb[0] + nb[2] <= crop.shape[1] + 1e-6
        assert nb[1] + nb[3] <= crop.shape[0] + 1e-6


def test_random_translate_letterbox_box_inside():
    rng = np.random.default_rng(1)
    im = np.full((60, 120, 3), 200, np.uint8)
    box = np.array([30.0, 15.0, 40.0, 30.0])
    canvas, nb, att = random_translate_letterbox(im, box, 128, rng)
    assert canvas.shape == (128, 128, 3)
    assert (nb >= 0).all() and (nb[:2] + nb[2:] <= 1.0 + 1e-6).all()
    # the box region on the canvas is image content, not padding
    x1 = int(nb[0] * 128) + 1
    y1 = int(nb[1] * 128) + 1
    assert att[y1, x1] == 0


def test_grounding_augment_end_to_end():
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, size=(90, 160, 3)).astype(np.uint8)
    box = np.array([50.0, 20.0, 40.0, 40.0])
    canvas, nb = grounding_augment(im, box, 128, rng)
    assert canvas.shape == (128, 128, 3)
    assert (nb[2:] > 0).all()
    assert (nb >= -1e-6).all() and (nb[:2] + nb[2:] <= 1.0 + 1e-6).all()


def test_plot_curves(tmp_path):
    from uvltrack_tpu.eval.metrics import sequence_curves
    from uvltrack_tpu.eval.plots import plot_curves

    anno = np.tile(np.array([[10.0, 10.0, 20.0, 20.0]]), (30, 1))
    good = [sequence_curves(anno.copy(), anno, "otb99")]
    bad = [sequence_curves(anno + np.array([15.0, 0, 0, 0]), anno, "otb99")]
    paths = plot_curves({"mine": good, "other": bad}, str(tmp_path))
    assert len(paths) == 6
    assert all(os.path.exists(p) for p in paths)
