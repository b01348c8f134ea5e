"""Packaging metadata guards: every console entry point in pyproject.toml
must resolve to a callable, and the declared package set must match the
tree (a new subpackage missing an __init__.py would be silently dropped
from an install). Beyond reference parity — the reference repo
(OpenSpaceAI/UVLTrack) is run-from-checkout only and ships no packaging."""

import importlib
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _meta():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_entry_points_resolve():
    scripts = _meta()["project"]["scripts"]
    assert len(scripts) >= 10
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target


def test_every_package_dir_has_init():
    # setuptools find() only picks up directories with __init__.py; a
    # missing one means source-tree imports work but installs are broken
    pkg_root = os.path.join(REPO, "uvltrack_tpu")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        if any(f.endswith(".py") for f in filenames):
            assert "__init__.py" in os.listdir(dirpath), dirpath


def test_native_source_ships_as_package_data():
    data = _meta()["tool"]["setuptools"]["package-data"]
    assert "*.cc" in data["uvltrack_tpu.native"]
    assert os.path.exists(
        os.path.join(REPO, "uvltrack_tpu", "native", "jpeg_loader.cc"))
