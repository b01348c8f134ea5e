"""LMDB stack tests: the self-contained file-format reader/writer
(utils/lmdb_native.py) and the *_lmdb dataset adapters built on it
(data/datasets/lmdb_datasets.py, eval lasot_lmdb).

Environments are generated in-test with write_lmdb using the reference's key
schemas, so the gated adapters are exercised without the real data or the
lmdb wheel. When the lmdb C binding IS available, a cross-check test reads
our writer's output through it (format fidelity, not just self-consistency).
"""

import os

import numpy as np
import pytest

from uvltrack_tpu.utils.lmdb_native import Reader, write_lmdb

cv2 = pytest.importorskip("cv2")


def _jpg(rng, h=60, w=70):
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


# ------------------------------------------------------------------ format

def test_roundtrip_small_and_overflow(tmp_path):
    rng = np.random.default_rng(0)
    items = {f"k/{i:05d}": bytes(rng.integers(0, 256, rng.integers(1, 80),
                                              dtype=np.uint8))
             for i in range(3000)}
    for i in range(20):  # > nodemax -> overflow pages
        items[f"big/{i:03d}"] = bytes(
            rng.integers(0, 256, rng.integers(3000, 40000), dtype=np.uint8))
    path = str(tmp_path / "env")
    write_lmdb(path, items.items())
    r = Reader(path)
    assert r.entries == len(items)
    assert r.depth >= 2  # multi-level B-tree exercised
    for k, v in items.items():
        assert r.get(k) == v
    assert r.get("nope") is None
    assert list(r.keys()) == sorted(k.encode() for k in items)
    r.close()


def test_empty_env(tmp_path):
    path = str(tmp_path / "empty")
    write_lmdb(path, [])
    r = Reader(path)
    assert r.get("x") is None
    assert list(r.keys()) == []


def test_write_lmdb_rejects_duplicate_keys(tmp_path):
    """The writer's 'unique keys' contract is enforced, not just documented —
    a duplicate would produce an environment whose md_entries disagrees with
    its key count and whose get() resolution differs from real LMDB."""
    with pytest.raises(ValueError, match="duplicate key"):
        write_lmdb(str(tmp_path / "dup"), [("k", b"1"), ("k", b"2")])


def test_bad_magic_raises(tmp_path):
    env = tmp_path / "bad"
    env.mkdir()
    (env / "data.mdb").write_bytes(b"\x00" * 8192)
    with pytest.raises(ValueError, match="magic"):
        Reader(str(env))


def test_c_binding_reads_our_files(tmp_path):
    lmdb = pytest.importorskip("lmdb")

    path = str(tmp_path / "env")
    write_lmdb(path, [("a", b"1"), ("b", b"x" * 9000)])
    env = lmdb.open(path, readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"a") == b"1"
        assert txn.get(b"b") == b"x" * 9000


# ---------------------------------------------------------------- adapters

@pytest.fixture()
def got10k_env(tmp_path):
    rng = np.random.default_rng(1)
    seqs = ["GOT-10k_Train_000001", "GOT-10k_Train_000002"]
    items = [("train/list.txt", "\n".join(seqs) + "\n")]
    for seq in seqs:
        n = 6
        items.append((f"train/{seq}/groundtruth.txt",
                      "".join(f"{5 + i},{6 + i},20,25\n" for i in range(n))))
        items.append((f"train/{seq}/absence.label", "0\n" * n))
        items.append((f"train/{seq}/cover.label", "8\n" * n))
        for i in range(1, n + 1):
            items.append((f"train/{seq}/{i:08d}.jpg", _jpg(rng)))
    path = str(tmp_path / "got10k_lmdb")
    write_lmdb(path, items)
    return path


def test_got10k_lmdb_adapter(got10k_env):
    from uvltrack_tpu.data.datasets.lmdb_datasets import Got10kLmdb

    d = Got10kLmdb(got10k_env, split="train")
    assert len(d) == 2
    info = d.get_sequence_info(0)
    assert info["bbox"].shape == (6, 4) and info["visible"].all()
    frames, fanno, meta = d.get_frames(0, [0, 3, 5])
    assert frames[0].shape == (60, 70, 3)
    assert np.allclose(fanno["bbox"][1], [8, 9, 20, 25])


def test_got10k_lmdb_unknown_split_raises(got10k_env):
    """A typo'd split must not silently fall back to ALL sequences (the
    directory-backed Got10k raises the same way) — that is exactly the
    vottrain/votval contamination the split tables exist to prevent."""
    from uvltrack_tpu.data.datasets.lmdb_datasets import Got10kLmdb

    with pytest.raises(ValueError, match="unknown GOT-10k LMDB split"):
        Got10kLmdb(got10k_env, split="votval ")


def test_lasot_lmdb_train_and_eval(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    names = ["cat-1", "cat-3"]
    items = []
    for name in names:
        n = 5
        items.append((f"cat/{name}/groundtruth.txt",
                      "".join(f"{10 + i},{12 + i},30,40\n" for i in range(n))))
        items.append((f"cat/{name}/full_occlusion.txt", ",".join("0" * n)))
        items.append((f"cat/{name}/out_of_view.txt", ",".join("0" * n)))
        for i in range(1, n + 1):
            items.append((f"cat/{name}/img/{i:08d}.jpg", _jpg(rng, 40, 50)))
    env = str(tmp_path / "lasot_lmdb")
    write_lmdb(env, items)
    for fn in ("lasot_train_split.txt", "lasot_test_split.txt"):
        with open(os.path.join(env, fn), "w") as f:
            f.write("\n".join(names) + "\n")

    from uvltrack_tpu.data.datasets.lmdb_datasets import LasotLmdb

    d = LasotLmdb(env, split="train")
    info = d.get_sequence_info(1)
    assert info["bbox"].shape == (5, 4) and info["visible"].all()
    frames, _, _ = d.get_frames(1, [0, 4])
    assert frames[0].shape == (40, 50, 3)

    # eval adapter + the runner's (db, key) frame dispatch
    monkeypatch.setenv("UVLTRACK_LASOT_LMDB_PATH", env)
    from uvltrack_tpu.eval.environment import reset_env_cache

    reset_env_cache()
    from uvltrack_tpu.eval.datasets import get_dataset
    from uvltrack_tpu.eval.running import run_sequence

    ds = get_dataset("lasot_lmdb")
    assert [s.name for s in ds] == names
    assert len(ds[0].frames) == 5

    class Stub:
        def initialize(self, img, info):
            assert img.shape == (40, 50, 3)
            self.box = list(info["init_bbox"])
            return {"target_bbox": self.box}

        def track(self, img, info=None):
            return {"target_bbox": self.box, "score": 1.0}

    outdir = str(tmp_path / "results")
    os.makedirs(outdir)
    run_sequence(Stub(), ds[0], outdir, chunk=1, prefetch=1)
    res = np.loadtxt(os.path.join(outdir, "cat-1.txt"), delimiter="\t")
    assert res.shape == (5, 4) and np.allclose(res[0], [10, 12, 30, 40])
    reset_env_cache()


def test_trackingnet_and_vid_and_coco_lmdb(tmp_path):
    rng = np.random.default_rng(3)
    # TrackingNet: per-set envs + filesystem seq_list.json
    root = tmp_path / "tn"
    root.mkdir()
    items = [("anno/vid_a.txt", "".join(f"{i},{i},10,12\n" for i in range(4)))]
    items += [(f"frames/vid_a/{i}.jpg", _jpg(rng, 30, 36)) for i in range(4)]
    write_lmdb(str(root / "TRAIN_0_lmdb"), items)
    (root / "seq_list.json").write_text('[[0, "vid_a"]]')

    from uvltrack_tpu.data.datasets.lmdb_datasets import (CocoSeqLmdb,
                                                          ImagenetVidLmdb,
                                                          TrackingNetLmdb)

    d = TrackingNetLmdb(str(root))
    assert len(d) == 1
    frames, fanno, _ = d.get_frames(0, [0, 3])
    assert frames[0].shape == (30, 36, 3)
    assert np.allclose(d.get_sequence_info(0)["bbox"][2], [2, 2, 10, 12])

    # ImageNet-VID lmdb: cache.json + JPEG keys
    import json

    seqs = [{"set_id": 1, "vid_id": 7, "class_name": "dog", "start_frame": 2,
             "anno": [[3, 4, 11, 13]] * 3, "target_visible": [True] * 3,
             "image_size": [36, 30]}]
    items = [("cache.json", json.dumps(seqs))]
    for i in range(2, 5):
        items.append((f"Data/VID/train/ILSVRC2015_VID_train_0001/"
                      f"ILSVRC2015_train_00000007/{i:06d}.JPEG", _jpg(rng, 30, 36)))
    env = str(tmp_path / "vid_lmdb")
    write_lmdb(env, items)
    d = ImagenetVidLmdb(env)
    assert len(d) == 1
    frames, fanno, _ = d.get_frames(0, [0, 2])
    assert frames[1].shape == (30, 36, 3)

    # COCO lmdb: instances json + image keys
    coco = {"images": [{"id": 1, "file_name": "img1.jpg"}],
            "categories": [{"id": 9, "name": "cat"}],
            "annotations": [{"id": 5, "image_id": 1, "category_id": 9,
                             "bbox": [2, 3, 8, 9], "iscrowd": 0}]}
    items = [("annotations/instances_train2017.json", json.dumps(coco)),
             ("images/train2017/img1.jpg", _jpg(rng, 30, 36))]
    env = str(tmp_path / "coco_lmdb")
    write_lmdb(env, items)
    d = CocoSeqLmdb(env)
    assert len(d) == 1
    frames, fanno, meta = d.get_frames(0, [0, 0])
    assert frames[0].shape == (30, 36, 3) and meta["language"] == "cat"


def test_imagenetvid_filesystem_adapter(tmp_path):
    """The fs VID adapter parses real ILSVRC-layout XML and caches tracklets."""
    import json

    rng = np.random.default_rng(4)
    root = tmp_path / "vid"
    set_dir = root / "Annotations" / "VID" / "train" / "ILSVRC2015_VID_train_0000"
    vid_dir = set_dir / "ILSVRC2015_train_00000001"
    vid_dir.mkdir(parents=True)
    data_dir = (root / "Data" / "VID" / "train" /
                "ILSVRC2015_VID_train_0000" / "ILSVRC2015_train_00000001")
    data_dir.mkdir(parents=True)
    for f in range(3):
        xml = (f"<annotation><size><width>36</width><height>30</height></size>"
               f"<object><trackid>0</trackid><name>dog</name>"
               f"<bndbox><xmin>{2 + f}</xmin><ymin>3</ymin>"
               f"<xmax>{12 + f}</xmax><ymax>14</ymax></bndbox>"
               f"<occluded>0</occluded></object></annotation>")
        (vid_dir / f"{f:06d}.xml").write_text(xml)
        img = rng.integers(0, 255, size=(30, 36, 3)).astype(np.uint8)
        cv2.imwrite(str(data_dir / f"{f:06d}.JPEG"), img)

    from uvltrack_tpu.data.datasets.video_datasets import ImagenetVID

    d = ImagenetVID(str(root))
    assert len(d) == 1
    assert os.path.exists(root / "cache.json")  # metadata cached
    info = d.get_sequence_info(0)
    assert np.allclose(info["bbox"][1], [3, 3, 10, 11])
    frames, fanno, _ = d.get_frames(0, [0, 2])
    assert frames[0].shape == (30, 36, 3)
    # second construction uses the cache
    d2 = ImagenetVID(str(root))
    assert len(d2) == 1


def test_prewarm_cli(tmp_path, capsys):
    """Dataset pre-warmer (tracking/pre_read_datasets.py parity): touches
    each store's index key, including the per-shard trackingnet layout."""
    import json

    from uvltrack_tpu.cli import prewarm

    g = tmp_path / "got10k_lmdb"
    write_lmdb(str(g), [("train/list.txt", b"GOT-10k_Train_000001\n")])
    t_root = tmp_path / "trackingnet_lmdb"
    t_root.mkdir()
    (t_root / "seq_list.json").write_text(
        json.dumps([[0, "seqA"], [0, "seqB"], [1, "seqC"]]))
    write_lmdb(str(t_root / "TRAIN_0_lmdb"), [("anno/seqA.txt", b"1,2,3,4\n")])
    write_lmdb(str(t_root / "TRAIN_1_lmdb"), [("anno/seqC.txt", b"5,6,7,8\n")])

    prewarm.main(["--data_dir", str(tmp_path), "--dataset_str", "gt",
                  "--full"])
    out = capsys.readouterr().out
    assert "pre-read 3 stores" in out
