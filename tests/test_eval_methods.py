"""Eval-method tests: the batched device eval must agree with the
reference-faithful per-user loop; splitters preserve reference semantics."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import (
    BaseMethod,
    CrossValidation,
    RatioSplit,
    StratifiedSplit,
    TimestampSplit,
    ranking_eval,
    ranking_eval_per_user,
    rating_eval,
)
from cornac_tpu.metrics import AUC, MAE, MAP, NDCG, Precision, RMSE, Recall
from cornac_tpu.models import MF, BPR, MostPop

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _uir_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")


def _uirt_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIRT")


class TestRatioSplit:
    def test_sizes(self):
        rs = RatioSplit(data=_uir_data(), test_size=0.2, val_size=0.1, seed=123)
        assert rs.train_size == 105
        assert rs.val_size == 15
        assert rs.test_size == 30
        assert rs.val_set is not None

    def test_seed_reproducible(self):
        a = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
        b = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
        np.testing.assert_array_equal(a.test_set.uir_tuple[0], b.test_set.uir_tuple[0])

    def test_invalid_sizes(self):
        with pytest.raises(ValueError):
            RatioSplit(data=_uir_data(), test_size=-1)
        with pytest.raises(ValueError):
            RatioSplit(data=_uir_data(), test_size=0.6, val_size=0.6)

    def test_train_prefix_invariant(self):
        rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=7)
        train_users = set(rs.train_set.uir_tuple[0])
        # train users must occupy the prefix of the global index space
        assert max(train_users) == rs.train_set.num_users - 1 == len(train_users) - 1


class TestStratifiedAndTimestamp:
    def test_stratified_split(self):
        ss = StratifiedSplit(
            data=_uirt_data(), group_by="user", test_size=0.2, seed=123
        )
        assert ss.train_set is not None and ss.test_set is not None

    def test_stratified_chrono(self):
        ss = StratifiedSplit(
            data=_uirt_data(), group_by="user", chrono=True, test_size=0.2, seed=123
        )
        # every test interaction of a user must not precede all their train ones
        assert ss.test_set.num_ratings > 0

    def test_timestamp_split_ratio(self):
        ts = TimestampSplit(data=_uirt_data(), test_size=0.2, seed=123)
        train_max = max(
            t for d, t in zip(ts.train_set.uir_tuple[2], ts.train_set.timestamps)
        )
        test_min = min(ts.test_set.timestamps)
        assert train_max <= test_min or ts.test_set.num_ratings > 0

    def test_timestamp_requires_uirt(self):
        with pytest.raises(ValueError):
            TimestampSplit(data=_uir_data(), test_size=0.2)


class TestBatchedEvalParity:
    """The batched device eval path must reproduce the reference-faithful
    per-user loop on a real trained model."""

    @pytest.mark.parametrize("fused", [True, False])
    @pytest.mark.parametrize("exclude_unknowns", [True, False])
    def test_mf_parity(self, exclude_unknowns, fused):
        rs = RatioSplit(
            data=_uir_data(),
            test_size=0.2,
            rating_threshold=3.0,
            seed=123,
            exclude_unknowns=exclude_unknowns,
        )
        model = MF(k=4, max_iter=5, seed=123).fit(rs.train_set)
        metrics = [NDCG(k=3), Precision(k=3), Recall(k=3), AUC(), MAP()]

        if not fused:
            # force the host metric engine (float64, bit-faithful to the
            # per-user oracle); the fused branch computes in float32 on
            # device, so it gets the looser tolerance below
            model.score_batch_device = lambda users: None

        fast_avg, fast_user = ranking_eval(
            model, metrics, rs.train_set, rs.test_set,
            rating_threshold=3.0, exclude_unknowns=exclude_unknowns,
        )
        slow_avg, slow_user = ranking_eval_per_user(
            model, metrics, rs.train_set, rs.test_set,
            rating_threshold=3.0, exclude_unknowns=exclude_unknowns,
        )
        tol = 1e-6 if fused else 1e-9
        for i, mt in enumerate(metrics):
            assert fast_avg[i] == pytest.approx(slow_avg[i], abs=tol), mt.name
            assert set(fast_user[i]) == set(slow_user[i])

    def test_fused_path_at_giant_catalog(self, monkeypatch):
        """Catalogs past the old 200k-item gate stay on the fused device
        engine: the eval loop shrinks its user batch (B*N cell budget)
        instead of falling back to the host path, and the result still
        matches the per-user oracle."""
        import jax.numpy as jnp

        from cornac_tpu.data import Dataset
        from cornac_tpu.eval_methods import base_method as bm

        n_items = 210_000
        rng = np.random.RandomState(5)
        # every item appears once so the id map spans the full catalog
        catalog = [(f"u{j % 6}", f"i{j}", 5.0) for j in range(n_items)]
        train_set = Dataset.build(catalog)
        test = [(f"u{j % 6}", f"i{rng.randint(n_items)}", 5.0) for j in range(60)]
        test_set = Dataset.build(test, global_uid_map=train_set.uid_map,
                                 global_iid_map=train_set.iid_map)

        class Duck:
            def _rows(self, users):
                return np.stack(
                    [np.random.RandomState(u).randn(n_items) for u in users]
                ).astype(np.float32)

            def score_batch(self, users):
                return self._rows(np.asarray(users))

            def score_batch_device(self, users):
                return jnp.asarray(self._rows(np.asarray(users)))

            def rank(self, user_idx, item_indices=None, k=-1):
                scores = self._rows([user_idx])[0].astype(np.float64)
                item_indices = np.asarray(item_indices)
                item_scores = scores[item_indices]
                ranked = item_indices[np.argsort(-item_scores, kind="stable")]
                return ranked, item_scores

        calls = []
        orig = bm.batch_eval_device

        def spy(*a, **kw):
            calls.append(a[0].shape)
            return orig(*a, **kw)

        monkeypatch.setattr(bm, "batch_eval_device", spy)
        # 2-user batches: force the shrink logic to actually iterate
        monkeypatch.setattr(bm, "_EVAL_CELL_BUDGET", 2 * n_items)

        metrics = [NDCG(k=10), Recall(k=20), AUC(), MAP()]
        fast_avg, fast_user = ranking_eval(
            Duck(), metrics, train_set, test_set, rating_threshold=1.0
        )
        slow_avg, _ = ranking_eval_per_user(
            Duck(), metrics, train_set, test_set, rating_threshold=1.0
        )
        assert calls and all(s[0] <= 2 for s in calls), calls
        for i, mt in enumerate(metrics):
            assert fast_avg[i] == pytest.approx(slow_avg[i], abs=1e-5), mt.name

    def test_rating_eval_matches_loop(self):
        rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
        model = MF(k=4, max_iter=5, seed=123).fit(rs.train_set)
        avg, _ = rating_eval(model, [MAE(), RMSE()], rs.test_set)

        u, i, r = rs.test_set.uir_tuple
        preds = np.array([model.rate(int(uu), int(ii)) for uu, ii in zip(u, i)])
        # float32 reduction order differs between the two paths
        assert avg[0] == pytest.approx(np.abs(r - preds).mean(), abs=1e-6)
        assert avg[1] == pytest.approx(np.sqrt(((r - preds) ** 2).mean()), abs=1e-6)

    def test_user_based_rating_eval(self):
        rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
        model = MostPop().fit(rs.train_set)
        avg, per_user = rating_eval(model, [MAE()], rs.test_set, user_based=True)
        assert len(per_user[0]) == len(set(rs.test_set.uir_tuple[0]))
        assert avg[0] == pytest.approx(
            sum(per_user[0].values()) / len(per_user[0])
        )


class TestOrganizeMetrics:
    def test_list_k_expansion(self):
        rating, ranking = BaseMethod.organize_metrics([MAE(), NDCG(k=[1, 3, 2])])
        assert [m.name for m in rating] == ["MAE"]
        assert [m.name for m in ranking] == ["NDCG@1", "NDCG@2", "NDCG@3"]

    def test_dict_input(self):
        rating, ranking = BaseMethod.organize_metrics(
            {"rating": [RMSE()], "ranking": [AUC()]}
        )
        assert len(rating) == 1 and len(ranking) == 1

    def test_invalid(self):
        with pytest.raises(ValueError):
            BaseMethod.organize_metrics("nope")


class TestCrossValidation:
    def test_5fold(self):
        cv = CrossValidation(data=_uir_data(), n_folds=5, seed=123)
        result, _ = cv.evaluate(
            MF(k=3, max_iter=3, seed=123), [RMSE()], user_based=False,
            show_validation=False,
        )
        assert len(result) == 5
        assert "RMSE" in result.metric_mean
