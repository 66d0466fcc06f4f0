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

    def test_grid_search_next_item(self):
        """Search over a NextItemRecommender drives the next-item eval
        branch (hyperopt _validation_score -> next_item_ranking_eval) and
        picks the best-scoring point (reference
        tests/cornac/test_hyperopt.py next-item coverage)."""
        import numpy as np

        from cornac_tpu.eval_methods import NextItemEvaluation
        from cornac_tpu.metrics import HitRatio
        from cornac_tpu.models import SPop

        rng = np.random.RandomState(8)

        def sessions(n0, n1):
            rows = []
            for s in range(n0, n1):
                for t in range(rng.randint(3, 7)):
                    rows.append((f"s{s}", f"i{rng.randint(20)}", t))
            return rows

        nie = NextItemEvaluation.from_splits(
            train_data=sessions(0, 40),
            test_data=sessions(40, 50),
            val_data=sessions(50, 60),
            seed=42, verbose=False, fmt="SIT",
        )
        gs = GridSearch(
            model=SPop(),
            space=[Discrete("use_session_popularity", [True, False])],
            metric=HitRatio(k=5),
            eval_method=nie,
        )
        gs.fit(nie.train_set, nie.val_set)
        assert gs.best_params is not None
        assert "use_session_popularity" in gs.best_params
        assert np.isfinite(gs.best_score)
        # every trial was scored through the next-item branch
        assert len(gs.trial_results) == 2
        scores = [s for _, s in gs.trial_results]
        assert gs.best_score == max(scores)

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


class TestNativeFastReader:
    def test_library_builds_and_loads(self):
        from cornac_tpu.native import load_library

        lib = load_library()
        assert lib is not None, "g++ is in the image; build should succeed"

    def test_parse_table_matches_python_split(self, tmp_path):
        from cornac_tpu.data.fast_reader import parse_table

        p = tmp_path / "r.txt"
        p.write_text("u1\ti7\t4.0\nu2\ti9\t2.5\nuX\ti1\t5\n")
        t = parse_table(p.read_bytes(), "\t", 3)
        assert t.n_rows == 3
        assert t.string_column(0) == ["u1", "u2", "uX"]
        assert t.string_column(1) == ["i7", "i9", "i1"]
        np.testing.assert_allclose(t.float_column(2), [4.0, 2.5, 5.0])

    def test_malformed_rows_fall_back(self, tmp_path):
        from cornac_tpu.data.fast_reader import parse_table

        bad = b"u1\ti7\t4.0\nu2\ti9\n"  # second row has 2 fields
        assert parse_table(bad, "\t", 3) is None
        nonnum = parse_table(b"u1\ti7\thello\n", "\t", 3)
        assert nonnum is not None and nonnum.float_column(2) is None

    def test_reader_native_path_identical(self, tmp_path):
        from cornac_tpu.data import Reader
        from cornac_tpu.data.reader import PARSERS

        rng = np.random.RandomState(0)
        lines = [
            f"user{rng.randint(50)}\titem{rng.randint(99)}\t{rng.randint(1, 6)}.0\t{1000 + k}"
            for k in range(500)
        ]
        p = tmp_path / "big.txt"
        p.write_text("\n".join(lines) + "\n")

        fast = Reader().read(str(p), fmt="UIRT")
        # force the pure-python path via a custom parser (same function)
        slow = Reader().read(str(p), fmt="UIRT", parser=PARSERS["UIRT"])
        assert fast == slow

        fast3 = Reader().read(str(p), fmt="UIR")
        slow3 = Reader().read(str(p), fmt="UIR", parser=PARSERS["UIR"])
        assert fast3 == slow3

    def test_reader_native_with_crlf_and_blank_lines(self, tmp_path):
        from cornac_tpu.data import Reader

        p = tmp_path / "crlf.txt"
        p.write_bytes(b"u1\ti1\t3.0\r\n\r\nu2\ti2\t4.0\r\n")
        out = Reader().read(str(p), fmt="UIR")
        assert out == [("u1", "i1", 3.0), ("u2", "i2", 4.0)]

    def test_reader_native_leading_space_fallback(self, tmp_path):
        """Lines the Python parser would strip() must not diverge — the
        native path bails and the fallback handles them."""
        from cornac_tpu.data import Reader

        p = tmp_path / "sp.txt"
        p.write_text(" u1\ti1\t3.0\nu2\ti2\t4.0\n")
        out = Reader().read(str(p), fmt="UIR")
        assert out == [("u1", "i1", 3.0), ("u2", "i2", 4.0)]

    def test_cpython_extension_parse(self):
        from cornac_tpu.native.build import load_extension

        ext = load_extension()
        assert ext is not None
        out = ext.parse_ratings(b"u1\ti2\t3.5\nu1\ti3\t4.0\n", "\t", False)
        assert out == [("u1", "i2", 3.5), ("u1", "i3", 4.0)]
        # interning: the repeated user id is one shared object
        assert out[0][0] is out[1][0]
        out4 = ext.parse_ratings(b"a\tb\t1.0\t42\n", "\t", True)
        assert out4 == [("a", "b", 1.0, 42)]
        # malformed rows return None so the Reader falls back
        assert ext.parse_ratings(b"only\ttwo\n", "\t", False) is None
        assert ext.parse_ratings(b"u\ti\tnot_a_number\n", "\t", False) is None
        # utf-8 ids survive
        s = "uté\titems\t2.0\n".encode("utf-8")
        assert ext.parse_ratings(s, "\t", False) == [("uté", "items", 2.0)]


def test_full_reference_model_inventory_importable():
    """Every public model class of the reference has a counterpart here
    (PARITY.md is the human-readable map; this locks it in CI)."""
    import cornac_tpu.models as M

    ref = (
        "AMR AnnoyANN BaseANN FaissANN HNSWLibANN ScaNNANN BaselineOnly "
        "Beacon BERT4Rec BiVAECF BPR VEBPR WBPR C2PF CausalRec CDL CDR COE "
        "Companion ComparERObj ComparERSub ConvMF CTR CVAE CVAECF DMRL "
        "DNNTSP EASE EFM FM FPMC GCMC GlobalAvg GPTop GRU4Rec HFT HPF HRDR "
        "HypAR IBPR ItemKNN UserKNN LightGCN LRPPM MCF MF MMMF MostPop MTER "
        "NARRE GMF MLP NCFBase NeuMF NGCF NMF OnlineIBPR PCRL PMF RecVAE "
        "SANSA SASRec SBPR SKMeans SoRec SPop SVD TIFUKNN TIGER "
        "TransformerRec TriRank UPCF VAECF VBPR VMF WMF"
    ).split()
    missing = [c for c in ref if not hasattr(M, c)]
    assert not missing, missing


def test_runtime_config(tmp_path):
    from cornac_tpu.config import RuntimeConfig

    cfg = RuntimeConfig(
        data_parallel=2, matmul_precision="float32",
        compilation_cache_dir=str(tmp_path / "cache"),
    ).apply()
    mesh = cfg.make_mesh()
    assert mesh.shape["data"] == 2
    import jax.numpy as jnp

    (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    assert (tmp_path / "cache").exists()
    import pytest

    with pytest.raises(ValueError):
        RuntimeConfig(matmul_precision="fp4").apply()


def test_config_device_metrics_min_cells():
    from cornac_tpu.config import RuntimeConfig
    from cornac_tpu.metrics import ranking

    old = ranking._DEVICE_MIN_CELLS
    try:
        RuntimeConfig(device_metrics_min_cells=123).apply()
        assert ranking._DEVICE_MIN_CELLS == 123
    finally:
        ranking.set_device_metrics_min_cells(old)
