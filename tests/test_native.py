import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from uvltrack_tpu.native import SequencePrefetcher, decode_jpeg, imread_rgb, load_library


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        p = str(d / f"{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_decode_matches_cv2(jpegs):
    if load_library() is None:
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    for p in jpegs:
        a = decode_jpeg(p)
        b = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert a is not None and a.shape == b.shape
        # both decode through libjpeg -> bit-identical
        assert (a == b).all()


def test_imread_rgb_fallback(tmp_path, jpegs):
    img = imread_rgb(jpegs[0])
    assert img.dtype == np.uint8 and img.shape == (48, 64, 3)
    # png goes through the cv2 fallback
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, np.zeros((8, 8, 3), np.uint8))
    assert imread_rgb(p).shape == (8, 8, 3)
    with pytest.raises(IOError):
        imread_rgb(str(tmp_path / "missing.jpg"))


def test_prefetcher_order_and_content(jpegs):
    want = [imread_rgb(p) for p in jpegs]
    got = list(SequencePrefetcher(jpegs, depth=2, num_threads=3))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a == b).all()


def test_prefetcher_propagates_errors(jpegs):
    paths = jpegs[:2] + ["/nonexistent/file.jpg"] + jpegs[3:]
    it = iter(SequencePrefetcher(paths, depth=2))
    next(it)
    next(it)
    with pytest.raises(IOError):
        next(it)


def test_prebuilt_so_without_source_loads(jpegs, monkeypatch):
    """A deployment shipping only the prebuilt .so (no .cc alongside) must
    load it, not crash on getmtime(source)."""
    import uvltrack_tpu.native as native

    if load_library() is None:
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    monkeypatch.setattr(native, "_SRC", native._SRC + ".does-not-exist")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.load_library() is not None
    assert native.decode_jpeg(jpegs[0]) is not None
