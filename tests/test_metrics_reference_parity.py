"""Metrics parity against the ACTUAL reference analysis code.

Imports lib/test/analysis/extract_results.py + plot_results.py from
/root/reference (torch CPU) and asserts uvltrack_tpu.eval.metrics reproduces
calc_seq_err_robust's per-frame errors and the AUC/Precision/NormPrecision
aggregation bit-for-bit across the robustness edge cases: zero-size
predictions carried forward, NaN annotation rows (uav), LaSOT
visibility-to-inf rules, length mismatches, and the first-frame reset."""

import numpy as np
import pytest

import _reference as ref_harness

pytestmark = pytest.mark.skipif(not ref_harness.reference_available(),
                                reason="reference tree not on disk")


@pytest.fixture(scope="module")
def ref_analysis():
    ref_harness.install()
    import torch  # noqa: F401

    from lib.test.analysis.extract_results import \
        calc_seq_err_robust as ref_calc
    return ref_calc


def _rand_seqs(rng, n_frames, nan_rows=(), zero_pred_rows=(), n_extra_pred=0):
    gt = np.abs(rng.normal(50, 20, size=(n_frames, 4))) + 5.0
    pred = gt + rng.normal(0, 8, size=(n_frames, 4))
    pred[:, 2:] = np.abs(pred[:, 2:]) + 1.0
    for i in nan_rows:
        gt[i] = np.nan
    for i in zero_pred_rows:
        pred[i, 2:] = 0.0
    if n_extra_pred:
        pred = np.concatenate([pred, pred[-n_extra_pred:]], axis=0)
    return pred, gt


def _assert_same(ref_calc, pred, gt, dataset, visible=None):
    import torch

    r_ov, r_ce, r_cn, r_val = ref_calc(
        torch.tensor(pred, dtype=torch.float64),
        torch.tensor(gt, dtype=torch.float64), dataset,
        torch.tensor(visible, dtype=torch.uint8) if visible is not None else None)
    from uvltrack_tpu.eval.metrics import calc_seq_err_robust

    m_ov, m_ce, m_cn, m_val = calc_seq_err_robust(pred, gt, dataset, visible)
    np.testing.assert_allclose(m_ov, r_ov.numpy(), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(m_ce, r_ce.numpy(), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(m_cn, r_cn.numpy(), rtol=1e-12, atol=1e-12)
    assert (m_val == r_val.numpy().astype(bool)).all()


def test_plain_sequence(ref_analysis):
    rng = np.random.default_rng(0)
    pred, gt = _rand_seqs(rng, 40)
    _assert_same(ref_analysis, pred, gt, "otb99")


def test_zero_size_predictions_carry_forward(ref_analysis):
    rng = np.random.default_rng(1)
    pred, gt = _rand_seqs(rng, 30, zero_pred_rows=(5, 6, 17))
    _assert_same(ref_analysis, pred, gt, "otb99")


def test_uav_nan_annotations(ref_analysis):
    rng = np.random.default_rng(2)
    pred, gt = _rand_seqs(rng, 30, nan_rows=(3, 4, 20))
    _assert_same(ref_analysis, pred, gt, "uav")


def test_lasot_visibility_rules(ref_analysis):
    rng = np.random.default_rng(3)
    pred, gt = _rand_seqs(rng, 30)
    visible = (rng.random(30) > 0.3).astype(np.uint8)
    visible[0] = 1
    _assert_same(ref_analysis, pred, gt, "lasot", visible)


def test_pred_longer_than_anno_truncates(ref_analysis):
    rng = np.random.default_rng(4)
    pred, gt = _rand_seqs(rng, 25, n_extra_pred=3)
    _assert_same(ref_analysis, pred, gt, "otb99")


def test_pred_shorter_pads_for_non_lasot(ref_analysis):
    rng = np.random.default_rng(5)
    pred, gt = _rand_seqs(rng, 25)
    _assert_same(ref_analysis, pred[:20], gt, "tnl2k")
    from uvltrack_tpu.eval.metrics import calc_seq_err_robust

    with pytest.raises(Exception):
        calc_seq_err_robust(pred[:20], gt, "lasot")


def test_auc_precision_aggregation_matches(ref_analysis):
    """Dataset-level AUC/OP/Precision/NormPrec: reference success-rate curves
    (extract_results.py:158-160) + get_auc_curve/get_prec_curve
    (plot_results.py:199-213) vs metrics.sequence_curves+aggregate_scores."""
    import torch

    from lib.test.analysis.plot_results import get_auc_curve, get_prec_curve
    from uvltrack_tpu.eval.metrics import (THRESH_CENTER, THRESH_CENTER_NORM,
                                           THRESH_OVERLAP, aggregate_scores,
                                           sequence_curves)

    rng = np.random.default_rng(6)
    n_seq = 5
    succ = torch.zeros((n_seq, 1, 21))
    prec = torch.zeros((n_seq, 1, 51))
    pnorm = torch.zeros((n_seq, 1, 51))
    my_curves = []
    for s in range(n_seq):
        pred, gt = _rand_seqs(rng, 30 + 5 * s,
                              zero_pred_rows=(4,) if s == 2 else ())
        r_ov, r_ce, r_cn, _ = ref_analysis(
            torch.tensor(pred, dtype=torch.float64),
            torch.tensor(gt, dtype=torch.float64), "otb99", None)
        n = gt.shape[0]
        succ[s, 0] = (r_ov.view(-1, 1) >
                      torch.tensor(THRESH_OVERLAP).view(1, -1)).sum(0).float() / n
        prec[s, 0] = (r_ce.view(-1, 1) <=
                      torch.tensor(THRESH_CENTER).view(1, -1)).sum(0).float() / n
        pnorm[s, 0] = (r_cn.view(-1, 1) <=
                       torch.tensor(THRESH_CENTER_NORM).view(1, -1)).sum(0).float() / n
        my_curves.append(sequence_curves(pred, gt, "otb99"))

    valid = torch.ones(n_seq, dtype=torch.bool)
    auc_curve, auc = get_auc_curve(succ, valid)
    prec_curve, prec_score = get_prec_curve(prec, valid)
    pnorm_curve, pnorm_score = get_prec_curve(pnorm, valid)

    scores = aggregate_scores(my_curves)
    assert abs(scores["AUC"] - float(auc[0])) < 1e-4
    assert abs(scores["Precision"] - float(prec_score[0])) < 1e-4
    assert abs(scores["NormPrec"] - float(pnorm_score[0])) < 1e-4
    assert abs(scores["OP50"] - float(auc_curve[0][THRESH_OVERLAP == 0.5][0])) < 1e-4


def test_merge_multiple_runs_matches_reference(ref_analysis):
    """Run-averaging parity: metrics.merge_multiple_runs vs the ACTUAL
    plot_results.py:45-88 on an eval_data with 2 runs of one param + 1
    other tracker (reference entry order and curve means preserved)."""
    from lib.test.analysis.plot_results import \
        merge_multiple_runs as ref_merge
    from uvltrack_tpu.eval.metrics import merge_multiple_runs

    rng = np.random.default_rng(11)
    n_seq = 4
    trackers = [
        {"name": "uvltrack", "param": "baseline_base", "run_id": 0,
         "disp_name": None},
        {"name": "uvltrack", "param": "baseline_base", "run_id": 1,
         "disp_name": None},
        {"name": "uvltrack", "param": "baseline_large", "run_id": 0,
         "disp_name": None},
    ]
    eval_data = {
        "sequences": [f"seq{i}" for i in range(n_seq)],
        "trackers": trackers,
        "valid_sequence": [1] * n_seq,
        "ave_success_rate_plot_overlap":
            rng.random((n_seq, 3, 21)).tolist(),
        "ave_success_rate_plot_center":
            rng.random((n_seq, 3, 51)).tolist(),
        "ave_success_rate_plot_center_norm":
            rng.random((n_seq, 3, 51)).tolist(),
        "avg_overlap_all": rng.random((n_seq, 3)).tolist(),
    }
    import copy

    ref_out = ref_merge(copy.deepcopy(eval_data))
    my_out = merge_multiple_runs(copy.deepcopy(eval_data))
    assert [t["param"] for t in my_out["trackers"]] == \
        [t["param"] for t in ref_out["trackers"]]
    for key in ("ave_success_rate_plot_overlap", "ave_success_rate_plot_center",
                "ave_success_rate_plot_center_norm", "avg_overlap_all"):
        np.testing.assert_allclose(np.asarray(my_out[key]),
                                   np.asarray(ref_out[key]),
                                   rtol=1e-6, atol=1e-7, err_msg=key)
