"""CLI smoke tests: entry points import and parse --help without touching
devices or datasets."""

import pytest


@pytest.mark.parametrize("module", [
    "uvltrack_tpu.cli.train",
    "uvltrack_tpu.cli.test",
    "uvltrack_tpu.cli.analyze",
    "uvltrack_tpu.cli.profile",
    "uvltrack_tpu.cli.demo",
    "uvltrack_tpu.cli.pack",
    "uvltrack_tpu.cli.setup_env",
    "uvltrack_tpu.cli.parity",
])
def test_cli_help(module):
    import importlib

    mod = importlib.import_module(module)
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0


def test_setup_env_writes_template(tmp_path, monkeypatch):
    import os
    import shutil

    from uvltrack_tpu.cli import setup_env

    # redirect the repo dir by monkeypatching the module's path logic
    target = tmp_path / "local_paths.yaml"
    orig = setup_env.os.path.dirname

    real_repo = os.path.dirname(os.path.dirname(os.path.abspath(setup_env.__file__)))
    # run against the real repo path but don't clobber an existing file
    had = os.path.exists(os.path.join(os.path.dirname(real_repo), "local_paths.yaml"))
    if had:
        pytest.skip("local_paths.yaml already present")
    setup_env.main([])
    path = os.path.join(os.path.dirname(real_repo), "local_paths.yaml")
    assert os.path.exists(path)
    import yaml

    data = yaml.safe_load(open(path))
    assert "otb99_path" in data and "results_path" in data
    os.remove(path)
