"""Integration: full Experiment runs with RatioSplit and CrossValidation."""

import os

import numpy as np
import pytest

from cornac_tpu import Experiment
from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import CrossValidation, RatioSplit
from cornac_tpu.metrics import MAE, NDCG, Recall
from cornac_tpu.models import MF, BPR, MostPop

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _uir_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")


def test_experiment_ratio_split(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # log file lands in tmp dir
    rs = RatioSplit(data=_uir_data(), test_size=0.2, rating_threshold=3.0, seed=123)
    exp = Experiment(
        eval_method=rs,
        models=[MostPop(), MF(k=4, max_iter=3, seed=123)],
        metrics=[MAE(), NDCG(k=3), Recall(k=3)],
        user_based=True,
    )
    exp.run()
    assert len(exp.result) == 2
    for res in exp.result:
        assert "MAE" in res.metric_avg_results
        assert "NDCG@3" in res.metric_avg_results
        assert np.isfinite(res.metric_avg_results["NDCG@3"])
    # ASCII table renders
    assert "MostPop" in str(exp.result)
    # log file written
    assert any(f.startswith("CornacExp-") for f in os.listdir(tmp_path))


def test_experiment_deterministic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    def run_once():
        rs = RatioSplit(
            data=_uir_data(), test_size=0.2, rating_threshold=3.0, seed=123
        )
        exp = Experiment(
            eval_method=rs,
            models=[BPR(k=4, max_iter=5, seed=123)],
            metrics=[NDCG(k=3)],
        )
        exp.run()
        return exp.result[0].metric_avg_results["NDCG@3"]

    assert run_once() == pytest.approx(run_once(), abs=1e-12)


def test_experiment_cross_validation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cv = CrossValidation(data=_uir_data(), n_folds=3, seed=123)
    exp = Experiment(
        eval_method=cv, models=[MostPop()], metrics=[MAE()], user_based=False
    )
    exp.run()
    assert len(exp.result) == 1
    assert len(exp.result[0]) == 3  # one Result per fold


def test_experiment_save_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
    exp = Experiment(
        eval_method=rs,
        models=[MostPop()],
        metrics=[MAE()],
        save_dir=str(tmp_path / "saved"),
    )
    exp.run()
    assert os.path.isdir(tmp_path / "saved" / "MostPop")
