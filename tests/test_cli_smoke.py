"""CLI smoke tests: entry points import and parse --help without touching
devices or datasets."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


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


def test_cli_test_batched_end_to_end(tmp_path, monkeypatch, capsys):
    """cli/test --streams N end-to-end on a tiny real model: argparse ->
    experiment yaml -> checkpoint resolution -> batched runner (factory
    cached per stream count) -> result files -> local scoring; plus the
    server-split guard (1-row GT prints the packager hint, never AUC=100)."""
    import cv2
    import numpy as np

    from uvltrack_tpu.cli import test as cli_test
    from uvltrack_tpu.eval.data import Sequence, SequenceList
    from uvltrack_tpu.eval.datasets import DATASET_BUILDERS
    from uvltrack_tpu.eval.environment import reset_env_cache
    from uvltrack_tpu.models import bert as bert_mod
    from uvltrack_tpu.models import uvltrack as uv
    from uvltrack_tpu.models.vit import VIT_VARIANTS

    # tiny real model through the full build_model path
    monkeypatch.setitem(VIT_VARIANTS, "base",
                        dict(embed_dim=32, depth=2, num_heads=4))
    tiny_bert = bert_mod.BertConfig(vocab_size=64, hidden_size=32,
                                    num_layers=1, num_heads=4,
                                    intermediate_size=64, max_position=64)
    monkeypatch.setattr(uv, "bert_config_from_type", lambda t: tiny_bert)

    (tmp_path / "experiments" / "uvltrack").mkdir(parents=True)
    (tmp_path / "experiments" / "uvltrack" / "tiny_smoke.yaml").write_text(
        "DATA: {TEMPLATE: {SIZE: 32}, SEARCH: {SIZE: 64}}\n"
        "MODEL:\n"
        "  HIDDEN_DIM: 32\n"
        "  HEAD: {HEAD_DIM: 32}\n"
        "  BACKBONE: {FUSION_LAYER: [1], CONT_LOSS_LAYER: [1]}\n"
        "TEST: {TEMPLATE_SIZE: 32, SEARCH_SIZE: 64, TEMPLATE_FACTOR: 2.0,\n"
        "       SEARCH_FACTOR: 4.0, MODE: BBOX, EPOCH: 1, UPDATE_INTERVAL: 2,\n"
        "       THRESHOLD: 0.5}\n")
    monkeypatch.setenv("UVLTRACK_REPO", str(tmp_path))
    reset_env_cache()

    rng = np.random.default_rng(0)

    def _seq(name, n):
        frames = []
        for i in range(n):
            p = str(tmp_path / f"{name}_f{i}.jpg")
            cv2.imwrite(p, rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
            frames.append(p)
        gt = np.tile([[10.0, 12.0, 20.0, 18.0]], (n, 1))
        return Sequence(name, frames, "otb99", gt)

    monkeypatch.setitem(DATASET_BUILDERS, "tinybench",
                        lambda: SequenceList([_seq("a", 4), _seq("b", 3),
                                              _seq("c", 3)]))
    try:
        cli_test.main(["uvltrack", "tiny_smoke", "--dataset_name", "tinybench",
                       "--streams", "2"])
    finally:
        reset_env_cache()
    out = capsys.readouterr().out
    assert "no checkpoint found" in out
    assert "AUC=" in out  # local scoring ran
    rdir = (tmp_path / "output" / "test" / "tracking_results" / "uvltrack"
            / "tiny_smoke" / "tinybench_BBOX_0001")
    for name, n in (("a", 4), ("b", 3), ("c", 3)):
        pred = np.loadtxt(rdir / f"{name}.txt", delimiter="\t")
        assert pred.shape == (n, 4)

    # server-evaluated split: 1-row GT -> packager hint, no bogus score
    def _server_seq():
        s = _seq("srv", 3)
        return SequenceList([Sequence("srv", s.frames, "got10k_test",
                                      s.ground_truth_rect[:1])])

    monkeypatch.setitem(DATASET_BUILDERS, "srvbench", _server_seq)
    reset_env_cache()
    monkeypatch.setenv("UVLTRACK_REPO", str(tmp_path))
    try:
        cli_test.main(["uvltrack", "tiny_smoke", "--dataset_name", "srvbench",
                       "--streams", "2"])
    finally:
        reset_env_cache()
    out = capsys.readouterr().out
    assert "cannot score locally" in out
    assert "AUC=" not in out


def test_cli_export_stablehlo_roundtrip(tmp_path, monkeypatch, capsys):
    """cli/export end-to-end on a tiny real model: jax.export the
    forward_test program, serialize to disk, deserialize, and --check
    that the restored StableHLO program reproduces the direct call."""
    import json as _json

    from uvltrack_tpu.cli import export as cli_export
    from uvltrack_tpu.eval.environment import reset_env_cache
    from uvltrack_tpu.models import bert as bert_mod
    from uvltrack_tpu.models import uvltrack as uv
    from uvltrack_tpu.models.vit import VIT_VARIANTS

    monkeypatch.setitem(VIT_VARIANTS, "base",
                        dict(embed_dim=32, depth=2, num_heads=4))
    tiny_bert = bert_mod.BertConfig(vocab_size=64, hidden_size=32,
                                    num_layers=1, num_heads=4,
                                    intermediate_size=64, max_position=64)
    monkeypatch.setattr(uv, "bert_config_from_type", lambda t: tiny_bert)

    (tmp_path / "experiments" / "uvltrack").mkdir(parents=True)
    (tmp_path / "experiments" / "uvltrack" / "tiny_smoke.yaml").write_text(
        "DATA: {TEMPLATE: {SIZE: 32}, SEARCH: {SIZE: 64}}\n"
        "MODEL:\n"
        "  HIDDEN_DIM: 32\n"
        "  HEAD: {HEAD_DIM: 32}\n"
        "  BACKBONE: {FUSION_LAYER: [1], CONT_LOSS_LAYER: [1]}\n"
        "TEST: {TEMPLATE_SIZE: 32, SEARCH_SIZE: 64, TEMPLATE_FACTOR: 2.0,\n"
        "       SEARCH_FACTOR: 4.0, MODE: BBOX, EPOCH: 1}\n")
    monkeypatch.setenv("UVLTRACK_REPO", str(tmp_path))
    reset_env_cache()
    out = str(tmp_path / "tiny.stablehlo")
    try:
        cli_export.main(["--config", "tiny_smoke", "--out", out, "--check"])
    finally:
        reset_env_cache()
    printed = capsys.readouterr().out
    assert "check: deserialized program matches the direct call" in printed
    manifest = _json.loads(open(out + ".json").read())
    assert manifest["outputs"] == ["bbox_map", "cls_score_test", "cont_score"]
    assert manifest["bytes"] > 1000
    import os as _os

    assert _os.path.getsize(out) == manifest["bytes"]
