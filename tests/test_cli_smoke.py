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

    real_repo = os.path.dirname(os.path.dirname(os.path.abspath(setup_env.__file__)))
    # run against the real repo path but don't clobber an existing file
    path = os.path.join(os.path.dirname(real_repo), "local_paths.yaml")
    if os.path.exists(path):
        pytest.skip("local_paths.yaml already present")
    # finally-guarded: a failing assertion must not leave the template in
    # the repo root (it would make every later run skip AND be loaded by
    # eval/environment as the live path config)
    try:
        setup_env.main([])
        assert os.path.exists(path)
        import yaml

        data = yaml.safe_load(open(path))
        assert "otb99_path" in data and "results_path" in data
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_analyze_per_seq_and_got_json(tmp_path, monkeypatch):
    """analyze CLI end-to-end with a synthetic results layout: default
    scores, --per_seq table, --filter, and --got_json plotting."""
    import json
    import os

    import numpy as np

    from uvltrack_tpu.cli import analyze
    from uvltrack_tpu.eval.data import Sequence, SequenceList
    from uvltrack_tpu.eval.datasets import DATASET_BUILDERS
    from uvltrack_tpu.eval.environment import reset_env_cache

    anno = np.tile([10.0, 10, 20, 20], (5, 1))

    def fake_ds():
        return SequenceList([Sequence("seqA", [], "otb99", anno.copy()),
                             Sequence("seqB", [], "otb99", anno.copy())])

    monkeypatch.setitem(DATASET_BUILDERS, "fakebench", fake_ds)
    monkeypatch.setenv("UVLTRACK_REPO", str(tmp_path))
    reset_env_cache()
    # analyze resolves experiments/<script>/<cfg>.yaml under the repo dir
    repo = os.path.dirname(os.path.dirname(os.path.abspath(analyze.__file__)))
    exp_src = os.path.join(os.path.dirname(repo), "experiments")
    (tmp_path / "experiments").symlink_to(exp_src)
    rdir = (tmp_path / "output" / "test" / "tracking_results" / "uvltrack"
            / "baseline_base" / "fakebench_NLBBOX_0300")
    rdir.mkdir(parents=True)
    np.savetxt(rdir / "seqA.txt", anno, delimiter="\t", fmt="%d")
    np.savetxt(rdir / "seqB.txt", anno + np.array([18.0, 0, 0, 0]),
               delimiter="\t", fmt="%d")

    args = ["--dataset_name", "fakebench"]
    analyze.main(args)                                   # aggregate scores
    analyze.main(args + ["--save_file", str(tmp_path / "report.txt")])
    assert "AUC=" in (tmp_path / "report.txt").read_text()
    analyze.main(args + ["--per_seq", "--save_file",
                         str(tmp_path / "per_seq.txt")])
    assert "seqA" in (tmp_path / "per_seq.txt").read_text()
    analyze.main(args + ["--per_seq"])                   # per-sequence table
    analyze.main(args + ["--per_seq", "--filter", "ao_min:50"])
    (tmp_path / "r.json").write_text(json.dumps(
        {"Trk": {"succ_curve": list(np.linspace(1, 0, 101)), "ao": 0.5}}))
    analyze.main(args + ["--got_json", f"T={tmp_path / 'r.json'}",
                         "--plot_dir", str(tmp_path / "plots")])
    assert (tmp_path / "plots" / "got_success_plot.png").exists()

    # multi-run path: sibling <param>_<id:03d> dirs, eval_data cache, merge
    for rid in (0, 1):
        rd = (tmp_path / "output" / "test" / "tracking_results" / "uvltrack"
              / f"baseline_base_{rid:03d}" / "fakebench_NLBBOX_0300")
        rd.mkdir(parents=True)
        np.savetxt(rd / "seqA.txt", anno + rid, delimiter="\t", fmt="%d")
        np.savetxt(rd / "seqB.txt", anno + rid, delimiter="\t", fmt="%d")
    merged_file = tmp_path / "merged.txt"
    analyze.main(args + ["--run_ids", "0,1", "--merge",
                         "--save_file", str(merged_file)])
    text = merged_file.read_text()
    assert "AUC" in text and "uvltrack_baseline_base" in text
    plot_dir = (tmp_path / "output" / "test" / "tracking_results" / "plots"
                / "uvltrack" / "baseline_base" / "fakebench_NLBBOX_0300")
    assert (plot_dir / "eval_data.pkl").exists()
    # second call hits the cache (results untouched -> same output)
    analyze.main(args + ["--run_ids", "0,1", "--merge",
                         "--save_file", str(merged_file)])
    assert merged_file.read_text() == text
    reset_env_cache()
