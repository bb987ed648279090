"""Tests for host-side metric aggregation vs reference formulas."""

import numpy as np

from pope_tpu.utils.metrics import (
    error_acc,
    error_auc,
    aggregate_metrics,
    aggregate_metrics_mean,
    recall_object,
)


def test_error_acc_simple():
    errs = np.array([0.5, 1.5, 2.5, 40.0])
    res = error_acc("R", errs, [1, 2, 3])
    assert res["R:ACC 1"] == 0.25
    assert res["R:ACC 2"] == 0.5
    assert res["R:ACC 3"] == 0.75
    assert res["R:medianErr"] == 2.0


def test_error_auc_reference():
    """Compare against the reference's own implementation, transliterated."""
    rng = np.random.default_rng(0)
    errors = rng.uniform(0, 45, 200)

    def ref_auc(errors, thresholds):
        errors = [0] + sorted(list(errors))
        recall = list(np.linspace(0, 1, len(errors)))
        aucs = []
        for thr in thresholds:
            last_index = np.searchsorted(errors, thr)
            y = recall[:last_index] + [recall[last_index - 1]]
            x = errors[:last_index] + [thr]
            aucs.append(np.trapezoid(y, x) / thr)
        return aucs

    ours = error_auc("R", errors, [5, 10, 20])
    ref = ref_auc(errors, [5, 10, 20])
    assert abs(ours["R:auc@ 5"] - ref[0]) < 1e-9
    assert abs(ours["R:auc@10"] - ref[1]) < 1e-9
    assert abs(ours["R:auc@20"] - ref[2]) < 1e-9


def test_aggregate_metrics_keys():
    m = {"R_errs": [1.0, 10.0, 50.0], "t_errs": [2.0, 20.0, 80.0], "identifiers": ["a", "b", "c"]}
    out = aggregate_metrics(m)
    # reference key set: 30 aucs + 30 accs + median, per R and t
    assert "R:auc@30" in out
    assert "R:ACC15" in out
    assert "t:medianErr" in out
    assert len([k for k in out if k.startswith("R:auc")]) == 30
    assert len([k for k in out if k.startswith("R:ACC")]) == 30
    mean_out = aggregate_metrics_mean(m)
    assert abs(mean_out["R:meanErr"] - np.mean(m["R_errs"])) < 1e-9


def test_recall_object_iou():
    assert recall_object([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert recall_object([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    iou = recall_object([0, 0, 10, 10], [5, 0, 15, 10])
    # +1 convention: inter = 6*11, union = 2*121 - 66
    assert abs(iou - (6 * 11) / (2 * 121 - 66)) < 1e-9


def test_epidist_prec_reference_semantics():
    """prec@thr = mean over pairs of per-pair fraction below thr
    (src/utils/metrics.py:167-178); empty pairs contribute 0."""
    from pope_tpu.utils.metrics import aggregate_metrics, epidist_prec

    errors = [np.array([1e-5, 1e-3, 2e-4]), np.array([1e-6]), np.array([])]
    precs = epidist_prec(errors, [5e-4], ret_dict=True)
    expected = ((2 / 3) + 1.0 + 0.0) / 3
    assert abs(precs["prec@5e-04"] - expected) < 1e-9

    # wired through aggregate_metrics when per-pair epi_errs are recorded
    agg = aggregate_metrics(
        {"R_errs": [1.0, 2.0], "t_errs": [1.0, 2.0], "identifiers": ["a", "b"],
         "epi_errs": errors[:2]}
    )
    assert abs(agg["prec@5e-04"] - ((2 / 3) + 1.0) / 2) < 1e-9
    # absent epi_errs -> no prec key (serial injectable-test paths)
    agg2 = aggregate_metrics({"R_errs": [1.0], "t_errs": [1.0], "identifiers": ["a"]})
    assert not any(k.startswith("prec@") for k in agg2)
