"""Framework infra: hyperopt (Grid/Random), ANN retrieval, serving handlers."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.hyperopt import Continuous, Discrete, GridSearch, RandomSearch
from cornac_tpu.metrics import NDCG, RMSE, Recall
from cornac_tpu.models import BPR, MF, MostPop, TPUExactANN

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _uir_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")


@pytest.fixture(scope="module")
def split():
    return RatioSplit(
        data=_uir_data(), test_size=0.2, val_size=0.2, rating_threshold=3.0, seed=123
    )


class TestHyperopt:
    def test_grid_search(self, split):
        gs = GridSearch(
            model=MF(k=2, max_iter=3, seed=123),
            space=[Discrete("k", [2, 3]), Discrete("learning_rate", [0.01, 0.05])],
            metric=RMSE(),
            eval_method=split,
        )
        gs.fit(split.train_set, split.val_set)
        assert gs.best_params is not None
        assert set(gs.best_params) == {"k", "learning_rate"}
        assert np.isfinite(gs.best_score)
        # behaves as the best model
        assert np.isfinite(gs.score(0, 0))

    def test_grid_requires_discrete(self, split):
        with pytest.raises(ValueError):
            GridSearch(
                model=MF(),
                space=[Continuous("learning_rate", 0.001, 0.1)],
                metric=RMSE(),
                eval_method=split,
            )

    def test_random_search_ranking_metric(self, split):
        rs = RandomSearch(
            model=BPR(k=2, max_iter=3, seed=123),
            space=[
                Discrete("k", [2, 4]),
                Continuous("learning_rate", 0.001, 0.05),
            ],
            metric=NDCG(k=3),
            eval_method=split,
            n_trails=3,
        )
        rs.fit(split.train_set, split.val_set)
        assert rs.best_params is not None
        assert np.isfinite(rs.best_score)

    def test_search_in_experiment(self, split, tmp_path, monkeypatch):
        from cornac_tpu import Experiment

        monkeypatch.chdir(tmp_path)
        gs = GridSearch(
            model=MF(k=2, max_iter=2, seed=1),
            space=[Discrete("k", [2, 3])],
            metric=RMSE(),
            eval_method=split,
        )
        exp = Experiment(eval_method=split, models=[gs], metrics=[RMSE(), Recall(k=3)])
        exp.run()
        assert len(exp.result) == 1


class TestANN:
    def test_exact_ann_matches_model_ranking(self, split):
        model = BPR(k=8, max_iter=10, seed=123).fit(split.train_set)
        ann = TPUExactANN(model=model)
        ann.build_index()

        uid = list(model.uid_map.keys())[0]
        direct = model.recommend(uid, k=5)
        via_ann = ann.recommend(uid, k=5)
        assert direct == via_ann  # exact retrieval: identical top-k

    def test_ann_remove_seen(self, split):
        model = BPR(k=4, max_iter=5, seed=1).fit(split.train_set)
        ann = TPUExactANN(model=model)
        ann.build_index()
        uid = list(model.uid_map.keys())[0]
        uidx = model.uid_map[uid]
        seen = set(split.train_set.csr_matrix.getrow(uidx).indices)
        recs = ann.recommend(uid, k=5, remove_seen=True, train_set=split.train_set)
        assert not ({model.iid_map[r] for r in recs} & seen)

    def test_ann_rejects_unsupported(self, split):
        model = MostPop().fit(split.train_set)
        with pytest.raises(ValueError):
            TPUExactANN(model=model)

    def test_external_wrappers_fallback(self, split):
        from cornac_tpu.models import AnnoyANN

        model = BPR(k=4, max_iter=2, seed=1).fit(split.train_set)
        with pytest.warns(UserWarning):
            ann = AnnoyANN(model=model)
        ann.build_index()
        uid = list(model.uid_map.keys())[0]
        assert len(ann.recommend(uid, k=3)) == 3


class TestServing:
    @pytest.fixture()
    def served(self, split, tmp_path, monkeypatch):
        model = MF(k=3, max_iter=3, seed=123).fit(split.train_set)
        path = model.save(str(tmp_path), save_trainset=True)
        monkeypatch.setenv("MODEL_PATH", path)
        monkeypatch.setenv("MODEL_CLASS", "cornac_tpu.models.MF")
        monkeypatch.chdir(tmp_path)
        from cornac_tpu.serving.core import load_model

        return load_model(".")

    def test_recommend_handler(self, served):
        from cornac_tpu.serving.core import handle_recommend

        model, train_set = served
        uid = list(model.uid_map.keys())[0]
        payload, status = handle_recommend(
            model, train_set, {"uid": uid, "k": "3", "remove_seen": "true"}
        )
        assert status == 200
        assert len(payload["recommendations"]) == 3

        payload, status = handle_recommend(model, train_set, {})
        assert status == 400

    def test_feedback_and_evaluate(self, served):
        from cornac_tpu.serving.core import handle_evaluate, handle_feedback

        model, train_set = served
        uid = list(model.uid_map.keys())[0]
        iid = list(model.iid_map.keys())[0]
        payload, status = handle_feedback({"uid": uid, "iid": iid, "rating": 4.0})
        assert status == 200

        payload, status = handle_evaluate(
            model, train_set, {"metrics": ["RMSE()", "Recall(k=3)"]}
        )
        assert status == 200
        assert "RMSE" in payload["result"]

        # sandboxed metric eval rejects arbitrary code
        payload, status = handle_evaluate(
            model, train_set, {"metrics": ["__import__('os')"]}
        )
        assert status == 400

    def test_standalone_server_roundtrip(self, served, tmp_path):
        import json
        import threading
        import urllib.request

        from cornac_tpu.serving.standalone import make_handler
        from http.server import ThreadingHTTPServer

        model, train_set = served
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(model, train_set)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            uid = list(model.uid_map.keys())[0]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/recommend?uid={uid}&k=3"
            ) as resp:
                body = json.loads(resp.read())
            assert len(body["recommendations"]) == 3
        finally:
            server.shutdown()
