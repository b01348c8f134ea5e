"""Synthetic disk layouts for the extra eval adapters (otb/nfs/uav/tc128/
itb/avist)."""

import numpy as np
import pytest

from uvltrack_tpu.eval.environment import reset_env_cache


@pytest.fixture(autouse=True)
def _reset_env():
    reset_env_cache()
    yield
    reset_env_cache()


def _touch(p):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"x")


def test_otb_adapter(tmp_path, monkeypatch):
    d = tmp_path / "Basketball"
    (d / "img").mkdir(parents=True)
    np.savetxt(d / "groundtruth_rect.txt", np.tile([1, 2, 3, 4], (3, 1)),
               delimiter=",", fmt="%d")
    for i in range(4):  # one extra frame: adapter truncates to anno length
        _touch(d / "img" / f"{i:04d}.jpg")
    monkeypatch.setenv("UVLTRACK_OTB_PATH", str(tmp_path))
    reset_env_cache()
    from uvltrack_tpu.eval.datasets_extra import otb_dataset

    ds = otb_dataset()
    assert len(ds) == 1
    assert len(ds[0].frames) == 3
    assert ds[0].ground_truth_rect.shape == (3, 4)


def test_nfs_adapter_xyxy_conversion(tmp_path, monkeypatch):
    d = tmp_path / "zebra" / "30"
    (d / "zebra").mkdir(parents=True)
    rows = ["0 10 20 40 60 x x x x", "1 12 22 42 62 x x x x"]
    (d / "zebra.txt").write_text("\n".join(rows))
    for i in range(2):
        _touch(d / "zebra" / f"{i:05d}.jpg")
    monkeypatch.setenv("UVLTRACK_NFS_PATH", str(tmp_path))
    reset_env_cache()
    from uvltrack_tpu.eval.datasets_extra import nfs_dataset

    ds = nfs_dataset()
    assert len(ds) == 1
    # xyxy (10,20,40,60) -> xywh (10,20,30,40)
    assert np.allclose(ds[0].ground_truth_rect[0], [10, 20, 30, 40])


def test_uav_adapter_handles_nan(tmp_path, monkeypatch):
    (tmp_path / "anno" / "UAV123").mkdir(parents=True)
    (tmp_path / "data_seq" / "UAV123" / "bike1").mkdir(parents=True)
    (tmp_path / "anno" / "UAV123" / "bike1.txt").write_text(
        "10,20,30,40\nNaN,NaN,NaN,NaN\n11,21,31,41\n")
    for i in range(3):
        _touch(tmp_path / "data_seq" / "UAV123" / "bike1" / f"{i:06d}.jpg")
    monkeypatch.setenv("UVLTRACK_UAV_PATH", str(tmp_path))
    reset_env_cache()
    from uvltrack_tpu.eval.datasets_extra import uav_dataset

    ds = uav_dataset()
    assert len(ds) == 1
    assert ds[0].name == "uav_bike1"  # table name (uavdataset.py:50)
    assert np.isnan(ds[0].ground_truth_rect[1]).all()
    # metric treats NaN rows as invalid for 'uav'
    from uvltrack_tpu.eval.metrics import calc_seq_err_robust

    pred = np.tile([10.0, 20, 30, 40], (3, 1))
    ov, ec, ecn, valid = calc_seq_err_robust(pred, ds[0].ground_truth_rect, "uav")
    assert valid.tolist() == [True, False, True]


def test_tc128_itb_avist_adapters(tmp_path, monkeypatch):
    # TC128
    d = tmp_path / "tc" / "Ball_ce"
    (d / "img").mkdir(parents=True)
    np.savetxt(d / "Ball_ce_gt.txt", np.tile([1, 2, 3, 4], (2, 1)),
               delimiter=",", fmt="%d")
    for i in range(2):
        _touch(d / "img" / f"{i:04d}.jpg")
    monkeypatch.setenv("UVLTRACK_TC128_PATH", str(tmp_path / "tc"))
    # ITB
    d = tmp_path / "itb" / "scenario1" / "seq1"
    d.mkdir(parents=True)
    np.savetxt(d / "groundtruth.txt", np.tile([1, 2, 3, 4], (2, 1)),
               delimiter=",", fmt="%d")
    for i in range(2):
        _touch(d / f"{i:04d}.jpg")
    monkeypatch.setenv("UVLTRACK_ITB_PATH", str(tmp_path / "itb"))
    # AVisT
    (tmp_path / "av" / "anno").mkdir(parents=True)
    (tmp_path / "av" / "sequences" / "fog1").mkdir(parents=True)
    np.savetxt(tmp_path / "av" / "anno" / "fog1.txt",
               np.tile([1, 2, 3, 4], (2, 1)), delimiter=",", fmt="%d")
    for i in range(2):
        _touch(tmp_path / "av" / "sequences" / "fog1" / f"{i:04d}.jpg")
    monkeypatch.setenv("UVLTRACK_AVIST_PATH", str(tmp_path / "av"))
    reset_env_cache()

    from uvltrack_tpu.eval.datasets_extra import (avist_dataset, itb_dataset,
                                                  tc128_dataset)

    assert len(tc128_dataset()) == 1
    assert len(tc128_dataset(ce_only=True)) == 1
    assert len(itb_dataset()) == 1
    assert len(avist_dataset()) == 1


def test_get_dataset_knows_extra_names():
    from uvltrack_tpu.eval import DATASET_BUILDERS

    for name in ("otb", "nfs", "uav", "tc128", "tc128ce", "itb", "avist"):
        assert name in DATASET_BUILDERS


def test_uav_split_sequences_use_start_end_tables(tmp_path, monkeypatch):
    """bird1_1/2/3 share the bird1 clip but start at frames 1/775/1573
    (uavdataset.py:56-61) — the adapter must index the base clip at the
    table offsets, not from the clip start."""
    (tmp_path / "anno" / "UAV123").mkdir(parents=True)
    for part, n in (("bird1_1", 253), ("bird1_2", 703), ("bird1_3", 865)):
        np.savetxt(tmp_path / "anno" / "UAV123" / f"{part}.txt",
                   np.tile([1.0, 2, 3, 4], (n, 1)), delimiter=",", fmt="%.1f")
    monkeypatch.setenv("UVLTRACK_UAV_PATH", str(tmp_path))
    reset_env_cache()
    from uvltrack_tpu.eval.datasets_extra import uav_dataset

    ds = uav_dataset()
    by_name = {s.name: s for s in ds}
    assert set(by_name) == {"uav_bird1_1", "uav_bird1_2", "uav_bird1_3"}
    s2 = by_name["uav_bird1_2"]
    assert s2.frames[0].endswith("bird1/000775.jpg")
    assert s2.frames[-1].endswith("bird1/001477.jpg")
    assert len(s2.frames) == len(s2.ground_truth_rect) == 703
    s1 = by_name["uav_bird1_1"]
    assert s1.frames[0].endswith("bird1/000001.jpg")
    assert len(s1.frames) == 253
