"""Weights-day drill: RUNBOOK.md steps 2-4 executed verbatim, end to end.

The one unprovable claim in this sandbox is accuracy parity against the
RELEASED checkpoints (zero egress). RUNBOOK.md is the recipe for the day
they arrive; this test executes its exact command legs against a stand-in
"released" checkpoint — a real reference-format .pth.tar exported from the
GENUINE torch reference modules (lib/models via tests/_reference.py) with
random weights — on a synthetic TNL2K-layout tree:

  step 2: `cli.parity --checkpoint <ckpt> --config baseline_base --out ...`
          (converter sanity: hard-fails on unused/missing keys)
  step 3: `cli.test uvltrack baseline_base --dataset_name tnl2k
           --test_checkpoint <ckpt>` in NL mode (grounding init runs live)
  step 4: `cli.analyze --tracker_param baseline_base --dataset_name tnl2k
           --mode NL` and compare AUC

The comparison oracle is the ACTUAL reference tracker state machine
(lib/test/tracker/uvltrack.py) run over the same tree with the same
checkpoint, scored by the same metrics code: |AUC_ours - AUC_ref| must be
within RUNBOOK §0's own pass bar (±0.3). Every seam the real drill will
cross — torch checkpoint load, converter, CLI arg plumbing, dataset
adapter, NL grounding init, result files, robust metrics — runs for real.

Parity ancestors: lib/test/evaluation/running.py:145 (run_dataset) +
tracking/analysis_results.py:21-39 (the analyze leg).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _reference  # noqa: E402

if not _reference.reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.slow  # two full-size CPU compiles + torch oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "red", "box", "moving",
         "quickly", "a", "bright", "square", "on", "dark", "background"]
LANGUAGE = "the red box moving quickly"
N_FRAMES = 16


def _clip(n_frames, h=240, w=320, seed=3, speed=4):
    """Textured background + a bright square drifting right (the same
    synthetic-video recipe the tracker parity suite uses)."""
    rng = np.random.default_rng(seed)
    base = (rng.uniform(40, 90, size=(h // 8, w // 8, 3))
            .repeat(8, 0).repeat(8, 1)).astype(np.uint8)
    frames, boxes = [], []
    for i in range(n_frames):
        f = base.copy()
        x = 60 + speed * i
        y = 90 + int(2 * np.sin(i / 3.0) * 4)
        f[y:y + 56, x:x + 56] = np.array([220, 60, 60], np.uint8)
        frames.append(f)
        boxes.append([x, y, 56, 56])
    return frames, boxes


def _write_tnl2k_tree(root: str) -> dict:
    """Two sequences in the exact TNL2K test layout cli.test consumes:
    <seq>/{imgs/*.png, groundtruth.txt, language.txt}. PNG: lossless, so
    both sides decode identical pixels."""
    gt = {}
    for si, (name, seed) in enumerate((("drill_a", 3), ("drill_b", 11))):
        frames, boxes = _clip(N_FRAMES, seed=seed, speed=4 + si)
        d = os.path.join(root, name)
        os.makedirs(os.path.join(d, "imgs"))
        for i, f in enumerate(frames):
            # disk holds BGR (cv2 convention); loaders re-order to RGB
            cv2.imwrite(os.path.join(d, "imgs", f"{i + 1:08d}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        np.savetxt(os.path.join(d, "groundtruth.txt"),
                   np.asarray(boxes, np.float64), fmt="%.2f", delimiter=",")
        with open(os.path.join(d, "language.txt"), "w") as fh:
            fh.write(LANGUAGE + "\n")
        gt[name] = boxes
    return gt


def _run_reference_oracle(ref_cfg, ckpt_path, vocab_path, tree, names,
                          results_dir):
    """The genuine reference tracker over the same tree, boxes written
    through the SAME save_results path (identical int rounding)."""
    from types import SimpleNamespace

    from lib.test.tracker.uvltrack import UVLTrack as RefTracker

    from uvltrack_tpu.eval.running import save_results
    from uvltrack_tpu.native import imread_rgb

    ref_cfg.TEST.MODE = "NL"
    ref_cfg.MODEL.BACKBONE.LANGUAGE.VOCAB_PATH = vocab_path
    params = SimpleNamespace(
        cfg=ref_cfg, checkpoint=ckpt_path, debug=0,
        search_size=ref_cfg.TEST.SEARCH_SIZE,
        template_size=ref_cfg.TEST.TEMPLATE_SIZE,
        search_factor=ref_cfg.TEST.SEARCH_FACTOR,
        template_factor=ref_cfg.TEST.TEMPLATE_FACTOR,
        grounding_size=ref_cfg.TEST.SEARCH_SIZE,
    )
    for name in names:
        d = os.path.join(tree, name)
        frames = sorted(os.listdir(os.path.join(d, "imgs")))
        imgs = [imread_rgb(os.path.join(d, "imgs", f)) for f in frames]
        gt0 = np.loadtxt(os.path.join(d, "groundtruth.txt"),
                         delimiter=",")[0]
        tracker = RefTracker(params, "tnl2k")
        tracker.initialize(imgs[0], {"init_bbox": list(gt0),
                                     "language": LANGUAGE})
        boxes = [list(tracker.state)]
        for img in imgs[1:]:
            boxes.append(tracker.track(img)["target_bbox"])
        save_results(results_dir, name, np.asarray(boxes, np.float64),
                     np.zeros(len(boxes)))


def test_runbook_steps_2_to_4_verbatim(tmp_path, monkeypatch):
    td = str(tmp_path)

    # ---- step 0 stand-ins: the "released" checkpoint + the data tree
    ref_cfg = _reference.build_reference_cfg(td)
    ref_model = _reference.build_reference_model(ref_cfg, seed=0)
    ckpt_path = os.path.join(td, "UVLTrack-B_ep0300.pth.tar")
    torch.save({"net": ref_model.state_dict()}, ckpt_path)

    tree = os.path.join(td, "TNL2K_test")
    _write_tnl2k_tree(tree)
    vocab_path = os.path.join(td, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB) + "\n")

    # ---- step 1: point the framework at the data (env-var override form)
    from uvltrack_tpu.eval.environment import reset_env_cache

    monkeypatch.setenv("UVLTRACK_TNL2K_PATH", tree)
    monkeypatch.setenv("UVLTRACK_RESULTS_PATH", os.path.join(td, "results"))
    reset_env_cache()
    try:
        _drill(td, tree, ckpt_path, vocab_path, ref_cfg, ref_model)
    finally:
        reset_env_cache()  # don't leak the drill paths into other tests


def _drill(td, tree, ckpt_path, vocab_path, ref_cfg, ref_model):
    import jax

    from uvltrack_tpu.cli.analyze import main as analyze_main
    from uvltrack_tpu.cli.parity import main as parity_main
    from uvltrack_tpu.cli.test import main as test_main
    from uvltrack_tpu.eval.datasets import get_dataset
    from uvltrack_tpu.eval.metrics import evaluate_results_dir

    # the drill compares fp32-vs-fp32 (released-weights day runs bf16 for
    # speed; bf16 box drift is bounded separately by test_bf16_fullsize)
    overrides = ["--set", "TEST.MODE=NL",
                 "--set", "TPU.COMPUTE_DTYPE=float32",
                 "--set", f"MODEL.BACKBONE.LANGUAGE.VOCAB_PATH={vocab_path}"]

    # ---- step 2: converter round-trip dump (hard-fails on unused keys)
    out_npz = os.path.join(td, "parity_b.npz")
    parity_main(["--checkpoint", ckpt_path, "--config", "baseline_base",
                 "--out", out_npz, "--language", LANGUAGE])
    dump = np.load(out_npz)
    assert all(np.isfinite(dump[k]).all() for k in dump.files), \
        [k for k in dump.files if not np.isfinite(dump[k]).all()]

    # ---- step 3: run the benchmark (checkpoint consumed directly)
    test_main(["uvltrack", "baseline_base", "--dataset_name", "tnl2k",
               "--test_checkpoint", ckpt_path] + overrides)

    # ---- step 4: score via the analyze CLI (the verbatim command)
    report_file = os.path.join(td, "report.txt")
    analyze_main(["--tracker_param", "baseline_base",
                  "--dataset_name", "tnl2k", "--mode", "NL",
                  "--save_file", report_file])
    with open(report_file) as f:
        line = f.read()
    assert "AUC=" in line, line
    auc_ours = float(line.split("AUC=")[1].split()[0])

    # ---- oracle: the genuine reference tracker on the same tree/ckpt
    ref_results = os.path.join(td, "ref_results")
    dataset = get_dataset("tnl2k")
    assert len(dataset) == 2 and dataset[0].language == LANGUAGE
    _run_reference_oracle(ref_cfg, ckpt_path, vocab_path, tree,
                          [s.name for s in dataset], ref_results)
    auc_ref = evaluate_results_dir(ref_results, dataset,
                                   report=False)["AUC"]

    # RUNBOOK §0 pass bar, applied to the drill itself
    assert abs(auc_ours - auc_ref) <= 0.3, (
        f"converted-vs-torch AUC diverged: ours={auc_ours:.2f} "
        f"ref={auc_ref:.2f} (bar ±0.3)")
    # and the run was not degenerate: the NL grounding init produced real
    # boxes on both sides (a crash-to-zeros run would "pass" trivially)
    assert np.isfinite(auc_ours) and 0.0 <= auc_ours <= 100.0
