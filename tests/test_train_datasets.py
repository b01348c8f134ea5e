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


def test_tnl2k_short_annotation_files(tmp_path):
    """full_occlusion/out_of_view rows can be shorter than groundtruth (and
    than each other) in the wild; visibility must truncate to the shortest,
    not broadcast-crash."""
    d = tmp_path / "video_02"
    (d / "imgs").mkdir(parents=True)
    n = 4
    np.savetxt(d / "groundtruth.txt", np.tile([1, 2, 3, 4], (n, 1)),
               delimiter=",", fmt="%d")
    (d / "language.txt").write_text("a thing\n")
    (d / "full_occlusion.txt").write_text("0,0,1,0")
    (d / "out_of_view.txt").write_text("0,1")  # shorter than occ/bbox
    for i in range(n):
        _img(d / "imgs" / f"{i:05d}.jpg")

    ds = Tnl2k(str(tmp_path))
    info = ds.get_sequence_info(0)
    assert info["visible"].tolist() == [True, False, True, True]


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


def test_object365_adapter(tmp_path):
    """object365.py layout: imgs/objects365_v{1,2}_%08d.jpg +
    zhiyuan_objv2_train.json."""
    from uvltrack_tpu.data.datasets.image_datasets import Object365

    (tmp_path / "imgs").mkdir()
    data = {
        "categories": [{"id": 3, "name": "Bicycle"}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 3, "bbox": [5, 6, 30, 20]},
            {"id": 2, "image_id": 9, "category_id": 3, "bbox": [1, 2, 10, 10]},
        ],
    }
    with open(tmp_path / "zhiyuan_objv2_train.json", "w") as f:
        json.dump(data, f)
    _img(tmp_path / "imgs" / "objects365_v1_00000007.jpg")
    _img(tmp_path / "imgs" / "objects365_v2_00000009.jpg")  # v2 fallback
    ds = Object365(str(tmp_path))
    assert ds.get_num_sequences() == 2
    assert not ds.is_video_sequence() and ds.is_tracking_sequence()
    assert not ds.is_grounding_sequence()
    info = ds.get_sequence_info(0)
    assert np.allclose(info["bbox"][0], [5, 6, 30, 20])
    frames, annos, meta = ds.get_frames(0, [0, 0], info)
    assert len(frames) == 2
    assert meta["language"] == "the bicycle in the view"
    frames, _, _ = ds.get_frames(1, [0], None)  # exercises the v2 path
    assert frames[0].shape[2] == 3


def test_visualgenome_adapter(tmp_path):
    """visualgenome.py layout: VG_100K/<image_id>.jpg +
    region_descriptions_new.json."""
    from uvltrack_tpu.data.datasets.image_datasets import VisualGenome

    (tmp_path / "VG_100K").mkdir()
    regions = [{"image_id": 11, "x": 4, "y": 8, "width": 16, "height": 24,
                "phrase": "A man on the LEFT"}]
    with open(tmp_path / "region_descriptions_new.json", "w") as f:
        json.dump(regions, f)
    _img(tmp_path / "VG_100K" / "11.jpg")
    ds = VisualGenome(str(tmp_path))
    assert ds.get_num_sequences() == 1
    assert ds.is_grounding_sequence() and not ds.is_video_sequence()
    info = ds.get_sequence_info(0)
    assert np.allclose(info["bbox"][0], [4, 8, 16, 24])
    _, _, meta = ds.get_frames(0, [0], info)
    assert meta["language"] == "a man on the left"


def test_webuav_adapter(tmp_path):
    """webuav.py layout: train/Train/<seq>/{groundtruth_rect.txt, absent.txt,
    img/*} + language/Language/Train/<seq>/language.txt."""
    from uvltrack_tpu.data.datasets.video_datasets import WebUAV

    seq = tmp_path / "train" / "Train" / "uav001"
    (seq / "img").mkdir(parents=True)
    np.savetxt(seq / "groundtruth_rect.txt",
               np.array([[10, 20, 30, 40], [11, 21, 31, 41], [0, 0, 0, 0]]),
               delimiter=",", fmt="%d")
    (seq / "absent.txt").write_text("0,1,0")
    for i in range(3):
        _img(seq / "img" / f"{i:06d}.jpg")
    lang = tmp_path / "language" / "Language" / "Train" / "uav001"
    lang.mkdir(parents=True)
    (lang / "language.txt").write_text("A Drone Flying Low\n")
    ds = WebUAV(str(tmp_path))
    assert ds.get_num_sequences() == 1
    assert (ds.is_tracking_sequence() and ds.is_grounding_sequence()
            and ds.is_vl_sequence() and ds.is_video_sequence())
    info = ds.get_sequence_info(0)
    # frame1 absent, frame2 zero-size: only frame0 visible
    assert info["visible"].tolist() == [True, False, False]
    assert info["valid"].tolist() == [True, True, False]
    frames, annos, meta = ds.get_frames(0, [0, 1], info)
    assert len(frames) == 2 and np.allclose(annos["bbox"][1], [11, 21, 31, 41])
    assert meta["language"] == "a drone flying low"


def test_got10k_missing_split_raises(tmp_path, monkeypatch):
    """A requested split whose table is absent must raise — silently using
    the full list would make vottrain == votval (val contamination;
    got10k.py:51-55 hard-depends on the files)."""
    from uvltrack_tpu.data.datasets import video_datasets

    (tmp_path / "train").mkdir()
    (tmp_path / "train" / "list.txt").write_text("GOT-10k_Train_000001\n")
    monkeypatch.setattr(video_datasets, "_repo_data_specs",
                        lambda: str(tmp_path / "no_specs_dir"))
    with pytest.raises(FileNotFoundError, match="vottrain"):
        Got10k(str(tmp_path), split="vottrain")
    with pytest.raises(ValueError, match="bogus"):
        Got10k(str(tmp_path), split="bogus")


def test_lasot_missing_split_raises(tmp_path, monkeypatch):
    from uvltrack_tpu.data.datasets import video_datasets

    monkeypatch.setattr(video_datasets, "_repo_data_specs",
                        lambda: str(tmp_path / "no_specs_dir"))
    with pytest.raises(FileNotFoundError, match="contamination"):
        Lasot(str(tmp_path), split="train")


def test_bundled_split_tables_load(tmp_path):
    """The published pytracking split tables ship in <repo>/data_specs and
    resolve without any dataset-root override (lib/train/data_specs/)."""
    n = 9335  # got10k_train_full_split covers ids up to 9334
    (tmp_path / "train").mkdir()
    (tmp_path / "train" / "list.txt").write_text(
        "\n".join(f"GOT-10k_Train_{i:06d}" for i in range(1, n + 1)) + "\n")
    assert Got10k(str(tmp_path), split="vottrain").get_num_sequences() == 7086
    assert Got10k(str(tmp_path), split="votval").get_num_sequences() == 1249
    assert Got10k(str(tmp_path), split="ltrval").get_num_sequences() == 1401

    ds = Lasot(str(tmp_path), split="train")
    assert ds.get_num_sequences() == 1120
    assert ds.sequence_list[0] == "airplane-10"
    assert Lasot(str(tmp_path), split="test").get_num_sequences() == 280
