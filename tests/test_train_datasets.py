"""Training dataset adapters on synthetic disk layouts."""

import json
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from uvltrack_tpu.data.datasets.image_datasets import CocoSeq, RefCocoSeq
from uvltrack_tpu.data.datasets.video_datasets import Got10k, Lasot, Tnl2k, TrackingNet


def _img(path, h=40, w=60):
    cv2.imwrite(str(path), np.random.default_rng(0).integers(
        0, 255, size=(h, w, 3)).astype(np.uint8))


def test_lasot_adapter(tmp_path):
    d = tmp_path / "airplane" / "airplane-1"
    (d / "img").mkdir(parents=True)
    n = 5
    np.savetxt(d / "groundtruth.txt", np.tile([10, 10, 20, 20], (n, 1)),
               delimiter=",", fmt="%d")
    (d / "full_occlusion.txt").write_text(",".join(["0", "0", "1", "0", "0"]))
    (d / "out_of_view.txt").write_text(",".join(["0"] * n))
    (d / "nlp.txt").write_text("A White Plane\n")
    for i in range(1, n + 1):
        _img(d / "img" / f"{i:08d}.jpg")
    (tmp_path / "training_set.txt").write_text("airplane-1\n")

    ds = Lasot(str(tmp_path), split="train")
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (n, 4)
    assert info["visible"].tolist() == [True, True, False, True, True]
    frames, annos, meta = ds.get_frames(0, [0, 3], info)
    assert len(frames) == 2 and frames[0].shape == (40, 60, 3)
    assert meta["language"] == "a white plane"
    assert ds.is_grounding_sequence() and ds.is_vl_sequence()


def test_got10k_adapter(tmp_path):
    base = tmp_path / "train" / "GOT-10k_Train_000001"
    base.mkdir(parents=True)
    n = 4
    np.savetxt(base / "groundtruth.txt", np.tile([5, 5, 10, 10], (n, 1)),
               delimiter=",", fmt="%d")
    (base / "absence.label").write_text("\n".join(["0", "0", "1", "0"]))
    (base / "cover.label").write_text("\n".join(["8", "4", "0", "8"]))
    for i in range(1, n + 1):
        _img(base / f"{i:08d}.jpg")
    (tmp_path / "train" / "list.txt").write_text("GOT-10k_Train_000001\n")

    ds = Got10k(str(tmp_path), split="train")
    info = ds.get_sequence_info(0)
    # visible = absence==0 & cover>0
    assert info["visible"].tolist() == [True, True, False, True]
    assert np.allclose(info["visible_ratio"], [1.0, 0.5, 0.0, 1.0])
    assert not ds.is_grounding_sequence()


def test_tnl2k_adapter(tmp_path):
    d = tmp_path / "video_01"
    (d / "imgs").mkdir(parents=True)
    n = 3
    np.savetxt(d / "groundtruth.txt", np.tile([1, 2, 3, 4], (n, 1)),
               delimiter=",", fmt="%d")
    (d / "language.txt").write_text("The Red Car\n")
    for i in range(n):
        _img(d / "imgs" / f"{i:05d}.jpg")

    ds = Tnl2k(str(tmp_path))
    assert ds.get_num_sequences() == 1
    assert ds.get_language(0) == "the red car"
    frames, annos, meta = ds.get_frames(0, [0, 2])
    assert len(frames) == 2


def test_trackingnet_adapter(tmp_path):
    anno = tmp_path / "TRAIN_0" / "anno"
    frames = tmp_path / "TRAIN_0" / "frames" / "seqA"
    anno.mkdir(parents=True)
    frames.mkdir(parents=True)
    n = 3
    np.savetxt(anno / "seqA.txt", np.tile([2, 3, 4, 5], (n, 1)),
               delimiter=",", fmt="%d")
    for i in range(n):
        _img(frames / f"{i}.jpg")

    ds = TrackingNet(str(tmp_path), set_ids=[0])
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (n, 4)
    fr, _, meta = ds.get_frames(0, [1])
    assert fr[0].shape == (40, 60, 3) and meta["language"] is None


def _write_coco(tmp_path, with_refs=False):
    (tmp_path / "annotations").mkdir(parents=True, exist_ok=True)
    (tmp_path / "train2017").mkdir(exist_ok=True)
    (tmp_path / "train2014").mkdir(exist_ok=True)
    inst = {
        "images": [{"id": 1, "file_name": "img1.jpg"}],
        "annotations": [
            {"id": 10, "image_id": 1, "bbox": [5, 6, 20, 10], "category_id": 3,
             "iscrowd": 0},
            {"id": 11, "image_id": 1, "bbox": [0, 0, 5, 5], "category_id": 3,
             "iscrowd": 1},
        ],
        "categories": [{"id": 3, "name": "car"}],
    }
    with open(tmp_path / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(inst, f)
    _img(tmp_path / "train2017" / "img1.jpg")
    if with_refs:
        (tmp_path / "refcocog").mkdir(exist_ok=True)
        with open(tmp_path / "refcocog" / "instances.json", "w") as f:
            json.dump(inst, f)
        refs = [{
            "ann_id": 10, "image_id": 1, "split": "train",
            "sentences": [{"sent": "the blue car on grass"}],
        }]
        with open(tmp_path / "refcocog" / "refs(google).p", "wb") as f:
            pickle.dump(refs, f)
        _img(tmp_path / "train2014" / "img1.jpg")


def test_coco_adapter(tmp_path):
    _write_coco(tmp_path)
    ds = CocoSeq(str(tmp_path))
    assert ds.get_num_sequences() == 1  # crowd filtered
    info = ds.get_sequence_info(0)
    assert np.allclose(info["bbox"][0], [5, 6, 20, 10])
    assert ds.get_language(0) == "car"
    frames, annos, _ = ds.get_frames(0, [0, 0], info)
    assert len(frames) == 2 and not ds.is_video_sequence()


def test_refcocog_adapter(tmp_path):
    _write_coco(tmp_path, with_refs=True)
    ds = RefCocoSeq(str(tmp_path))
    assert ds.get_num_sequences() == 1
    assert ds.get_language(0) == "the blue car on grass"
    assert ds.is_grounding_sequence() and not ds.is_tracking_sequence()
    info = ds.get_sequence_info(0)
    assert np.allclose(info["bbox"][0], [5, 6, 20, 10])
