"""Byte-for-byte output parity of experiment result tables vs the reference.

The reference's ``experiment/result.py`` is importable standalone (numpy
only), so when ``/root/reference`` is present we build identical Result /
CVResult / PSTResult / ExperimentResult objects on both sides and compare the
rendered tables exactly. Embedded golden strings keep the core assertions
alive when the reference checkout is absent.
"""

import importlib.util
import os
from collections import OrderedDict

import pytest

from cornac_tpu.experiment.result import (
    CVExperimentResult,
    CVResult,
    ExperimentResult,
    PSTResult,
    Result,
)

REF_RESULT = "/root/reference/cornac/experiment/result.py"


def _load_reference_result():
    spec = importlib.util.spec_from_file_location("ref_result", REF_RESULT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _avg(pairs):
    return OrderedDict(pairs)


SINGLE = _avg([("MAE", 0.8123456), ("RMSE", 1.05), ("Recall@10", 0.123456789)])

FOLDS = [
    _avg([("MAE", 0.81), ("NDCG@10", 0.1234)]),
    _avg([("MAE", 0.7954321), ("NDCG@10", 0.2)]),
    _avg([("MAE", 0.9), ("NDCG@10", 0.15005)]),
]

PST_ROWS = [
    _avg([("MAE", 0.8), ("SIZE", 1000.0)]),   # Closed
    _avg([("MAE", 0.75), ("SIZE", 1000.0)]),  # IPS
    _avg([("MAE", 0.7), ("SIZE", 400.0)]),    # Q1
    _avg([("MAE", 0.9), ("SIZE", 600.0)]),    # Q2
]

GOLDEN_SINGLE = (
    "            |    MAE |   RMSE | Recall@10\n"
    "----------- + ------ + ------ + ---------\n"
    "LongModelNm | 0.8123 | 1.0500 |    0.1235\n"
)

GOLDEN_EXPERIMENT = (
    "     |    MAE | NDCG@10\n"
    "---- + ------ + -------\n"
    "MF   | 0.8100 |  0.1234\n"
    "BPRX | 0.7954 |  0.2000\n"
)


def _mk_result(cls, name, avg):
    return cls(model_name=name, metric_avg_results=avg, metric_user_results=None)


def test_single_result_golden():
    res = _mk_result(Result, "LongModelNm", SINGLE.copy())
    assert str(res) == GOLDEN_SINGLE


def test_experiment_result_golden():
    table = ExperimentResult()
    table.append(_mk_result(Result, "MF", FOLDS[0].copy()))
    table.append(_mk_result(Result, "BPRX", FOLDS[1].copy()))
    assert str(table) == GOLDEN_EXPERIMENT


def _build_cv(result_cls, cv_cls):
    cv = cv_cls("PMF")
    for avg in FOLDS:
        cv.append(_mk_result(result_cls, "PMF", avg.copy()))
    cv.organize()
    return cv


def _build_pst(result_cls, pst_cls):
    pst = pst_cls("WMF")
    for avg in PST_ROWS:
        pst.append(_mk_result(result_cls, "WMF", avg.copy()))
    pst.organize()
    return pst


@pytest.mark.skipif(not os.path.exists(REF_RESULT), reason="reference absent")
class TestAgainstReference:
    @classmethod
    def setup_class(cls):
        cls.ref = _load_reference_result()

    def test_single_result(self):
        ours = _mk_result(Result, "LongModelNm", SINGLE.copy())
        ref = _mk_result(self.ref.Result, "LongModelNm", SINGLE.copy())
        assert str(ours) == str(ref)

    def test_cv_result(self):
        ours = _build_cv(Result, CVResult)
        ref = _build_cv(self.ref.Result, self.ref.CVResult)
        assert str(ours) == str(ref)
        for m in FOLDS[0]:
            assert ours.metric_mean[m] == pytest.approx(ref.metric_mean[m])
            assert ours.metric_std[m] == pytest.approx(ref.metric_std[m])

    def test_pst_result(self):
        ours = _build_pst(Result, PSTResult)
        ref = _build_pst(self.ref.Result, self.ref.PSTResult)
        assert str(ours) == str(ref)
        # organize() appends the unbiased row on both sides
        assert len(ours) == len(ref)
        for m in PST_ROWS[0]:
            assert ours[-1].metric_avg_results[m] == pytest.approx(
                ref[-1].metric_avg_results[m]
            )

    def test_experiment_result(self):
        ours, ref = ExperimentResult(), self.ref.ExperimentResult()
        for name, avg in [("MF", FOLDS[0]), ("BPRX", FOLDS[1])]:
            ours.append(_mk_result(Result, name, avg.copy()))
            ref.append(_mk_result(self.ref.Result, name, avg.copy()))
        assert str(ours) == str(ref)

    def test_cv_experiment_result(self):
        ours, ref = CVExperimentResult(), self.ref.CVExperimentResult()
        ours.append(_build_cv(Result, CVResult))
        ref.append(_build_cv(self.ref.Result, self.ref.CVResult))
        assert str(ours) == str(ref)
