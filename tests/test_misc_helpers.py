"""Unit tests for small round-2 helpers: ZeRO-1 moment sharding rules, the
grounding size menus (exact reference tables), the shared CLI path
conventions, and the LMDB frame-ref dispatching loader."""

import numpy as np

from uvltrack_tpu.data.grounding_aug import size_menus
from uvltrack_tpu.eval.environment import (EnvSettings, experiment_cfg_path,
                                           train_checkpoint_dir)
from uvltrack_tpu.eval.running import dispatching_loader
from uvltrack_tpu.parallel.mesh import make_mesh, zero1_moment_sharding


def test_size_menus_match_reference_tables():
    """grounding2.py:383-396 verbatim for the three shipped output sizes."""
    s1, s2, (lo, hi) = size_menus(384)
    assert s1 == [384, 368, 352, 336, 320, 304, 288, 272]
    assert s2 == [352, 320, 288, 256]
    assert (lo, hi) == (256, 360)
    s1, s2, (lo, hi) = size_menus(256)
    assert s1 == [180, 210, 240] and s2 == [186, 192, 208, 224, 240]
    assert (lo, hi) == (186, 240)
    s1, s2, (lo, hi) = size_menus(320)
    assert s1 == [172, 236, 300] and s2 == [180, 210, 240, 270, 300]
    assert (lo, hi) == (180, 300)
    # unknown sizes: generated menus stay positive and below the output size
    s1, s2, (lo, hi) = size_menus(512)
    assert max(s1) == 512 and min(s1) > 0 and 0 < lo < hi <= 512


def test_zero1_moment_sharding_axis_selection():
    mesh = make_mesh(data=8, model=1)

    class A:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    # largest divisible axis picked
    s = zero1_moment_sharding(mesh, A((96, 32)))
    assert str(s.spec) == "PartitionSpec('data',)" or s.spec[0] == "data"
    s = zero1_moment_sharding(mesh, A((4, 128)))
    assert s.spec[1] == "data"
    # nothing divisible -> replicated
    s = zero1_moment_sharding(mesh, A((3, 5)))
    assert s.is_fully_replicated
    # scalars -> replicated
    s = zero1_moment_sharding(mesh, A(()))
    assert s.is_fully_replicated


def test_path_conventions():
    s = EnvSettings(repo_dir="/r")
    assert experiment_cfg_path(s, "uvltrack", "baseline_base") == \
        "/r/experiments/uvltrack/baseline_base.yaml"
    assert train_checkpoint_dir(s, "uvltrack", "baseline_base") == \
        "/r/checkpoints/train/uvltrack/baseline_base"


def test_tnl2k_test_path_resolution():
    """TNL2K_test uses the dedicated env entry when set (reference
    tnl2k_test_dir, base_functions.py:38); the fallback swaps only a
    'train' LEAF for 'test' — never substrings elsewhere in the path."""
    import pytest

    from uvltrack_tpu.data.builders import _tnl2k_test_path

    s = EnvSettings(tnl2k_path="/data/training_sets/tnl2k/train",
                    tnl2k_test_path="/explicit/test")
    assert _tnl2k_test_path(s) == "/explicit/test"
    s = EnvSettings(tnl2k_path="/data/training_sets/tnl2k/train")
    assert _tnl2k_test_path(s) == "/data/training_sets/tnl2k/test"
    s = EnvSettings(tnl2k_path="/data/tnl2k/Train/")
    assert _tnl2k_test_path(s) == "/data/tnl2k/Test"
    s = EnvSettings(tnl2k_path="/data/tnl2k/videos")
    with pytest.raises(ValueError, match="tnl2k_test_path"):
        _tnl2k_test_path(s)


def test_dispatching_loader_routes_tuples(tmp_path, monkeypatch):
    import cv2

    from uvltrack_tpu.utils.lmdb_native import write_lmdb

    img = np.random.default_rng(0).integers(
        0, 255, size=(8, 12, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".png", img[..., ::-1])  # lossless
    env = str(tmp_path / "env")
    write_lmdb(env, [("k", bytes(buf))])

    calls = []

    def base(path):
        calls.append(path)
        return "plain"

    load = dispatching_loader(base)
    assert load("some/path.jpg") == "plain" and calls == ["some/path.jpg"]
    decoded = load((env, "k"))
    np.testing.assert_array_equal(decoded, img)


def test_compile_cache_partitioned_per_host_on_cpu(tmp_path):
    """CPU AOT cache entries are microarch-specific (cpu_aot_loader warns
    SIGILL-risk on feature mismatch — MULTICHIP_r04); on the cpu backend
    the cache dir must be partitioned by a stable host-CPU key."""
    import jax

    from uvltrack_tpu.config import default_cfg
    from uvltrack_tpu.models.uvltrack import (_cpu_cache_key,
                                              configure_compile_cache)

    key = _cpu_cache_key()
    assert key.startswith("cpu-") and len(key) == 14
    assert key == _cpu_cache_key()  # stable within a host

    cfg = default_cfg()
    cfg.TPU.COMPILE_CACHE = str(tmp_path / "xc")
    old = jax.config.jax_compilation_cache_dir
    try:
        configure_compile_cache(cfg)
        got = jax.config.jax_compilation_cache_dir
        assert got == str(tmp_path / "xc" / key), got
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
