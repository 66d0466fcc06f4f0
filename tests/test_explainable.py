"""Explainable family: EFM and TriRank with SentimentModality."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader, SentimentModality
from cornac_tpu.eval_methods import RatioSplit, ranking_eval, rating_eval
from cornac_tpu.metrics import NDCG, RMSE
from cornac_tpu.models import EFM, TriRank

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

ASPECTS = ["battery", "screen", "price", "camera", "speed"]
OPINIONS = ["good", "bad", "great", "poor"]


@pytest.fixture(scope="module")
def sentiment_split():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rng = np.random.RandomState(4)
    lexicon = []
    for u, i, r in data:
        tuples = [
            (
                ASPECTS[rng.randint(len(ASPECTS))],
                OPINIONS[rng.randint(len(OPINIONS))],
                float(rng.choice([-1, 1])),
            )
            for _ in range(rng.randint(1, 4))
        ]
        lexicon.append((u, i, tuples))
    return RatioSplit(
        data=data, test_size=0.2, rating_threshold=3.0, seed=123,
        sentiment=SentimentModality(data=lexicon),
    )


def test_efm(sentiment_split):
    split = sentiment_split
    m = EFM(
        num_explicit_factors=4, num_latent_factors=4, num_most_cared_aspects=3,
        max_iter=10, seed=123, verbose=False,
    ).fit(split.train_set)
    assert (m.U1 >= 0).all() and (m.V >= 0).all()  # non-negative factors
    # plain score vs composite ranking score
    row = np.asarray(m.score(0))
    assert np.isfinite(row).all()
    ranked, scores = m.rank(0, k=5)
    assert len(ranked) == m.num_items
    # batch path consistent with rank's composite scores
    batch = m.score_batch(np.array([0]))
    np.testing.assert_allclose(batch[0, : len(scores)], scores, rtol=1e-6)
    # both eval paths work
    avg, _ = rating_eval(m, [RMSE()], split.test_set)
    assert np.isfinite(avg[0])
    avg, _ = ranking_eval(
        m, [NDCG(k=3)], split.train_set, split.test_set, rating_threshold=3.0
    )
    assert np.isfinite(avg[0])


def test_efm_requires_sentiment():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rs = RatioSplit(data=data, test_size=0.2, seed=123)
    with pytest.raises(ValueError):
        EFM(max_iter=1).fit(rs.train_set)


def test_trirank(sentiment_split):
    split = sentiment_split
    m = TriRank(max_iter=20, seed=123, verbose=False).fit(split.train_set)
    row = np.asarray(m.score(0))
    assert np.isfinite(row).all()
    assert row.min() >= m.min_rating - 1e-9
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-5, atol=1e-8)
    avg, _ = ranking_eval(
        m, [NDCG(k=3)], split.train_set, split.test_set, rating_threshold=3.0
    )
    assert np.isfinite(avg[0])


def test_mter(sentiment_split):
    from cornac_tpu.models import MTER

    split = sentiment_split
    m = MTER(
        n_user_factors=4, n_item_factors=4, n_aspect_factors=3,
        n_opinion_factors=3, n_bpr_samples=32, n_element_samples=8,
        max_iter=200, lr=0.1, seed=123, verbose=False,
    ).fit(split.train_set)
    # non-negative factors (projected Adagrad)
    for tbl in (m.U, m.I, m.A, m.O, m.G1, m.G2, m.G3):
        assert (tbl >= 0).all()
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-5, atol=1e-8)
    avg, _ = ranking_eval(
        m, [NDCG(k=3)], split.train_set, split.test_set, rating_threshold=3.0
    )
    assert np.isfinite(avg[0])


def test_lrppm(sentiment_split):
    from cornac_tpu.models import LRPPM

    split = sentiment_split
    m = LRPPM(
        n_factors=4, n_samples=16, n_ranking_samples=32, max_iter=200,
        num_top_aspects=3, lr=0.05, seed=123, verbose=False,
    ).fit(split.train_set)
    for tbl in (m.U, m.I, m.UA, m.IA):
        assert (tbl >= 0).all()
    row = np.asarray(m.score(0))
    assert np.isfinite(row).all()
    ranked, scores = m.rank(0, k=5)
    batch = m.score_batch(np.array([0]))
    np.testing.assert_allclose(batch[0, : len(scores)], scores, rtol=1e-6)
    avg, _ = ranking_eval(
        m, [NDCG(k=3)], split.train_set, split.test_set, rating_threshold=3.0
    )
    assert np.isfinite(avg[0])


@pytest.fixture(scope="module")
def sentiment_chrono_split():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIRT")
    rng = np.random.RandomState(4)
    lexicon = []
    for u, i, r, t in data:
        tuples = [
            (
                ASPECTS[rng.randint(len(ASPECTS))],
                OPINIONS[rng.randint(len(OPINIONS))],
                float(rng.choice([-1, 1])),
            )
            for _ in range(rng.randint(1, 4))
        ]
        lexicon.append((u, i, tuples))
    return RatioSplit(
        data=data, fmt="UIRT", test_size=0.2, rating_threshold=3.0, seed=123,
        sentiment=SentimentModality(data=lexicon),
    )


@pytest.mark.parametrize("model_type", ["Finer", "Dominant", "Around"])
def test_comparer_obj(sentiment_chrono_split, model_type):
    sentiment_split = sentiment_chrono_split
    from cornac_tpu.models import ComparERObj

    m = ComparERObj(
        model_type=model_type, num_explicit_factors=4, num_latent_factors=4,
        num_most_cared_aspects=3, max_iter=10, min_user_freq=1, seed=123,
        verbose=False,
    ).fit(sentiment_split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    ranked, _ = m.rank(0, k=5)
    assert len(ranked) == m.total_items
    batch = m.score_batch(np.array([0, 1]))
    assert np.isfinite(batch).all()


def test_comparer_obj_validation(sentiment_split):
    from cornac_tpu.models import ComparERObj

    with pytest.raises(ValueError):
        ComparERObj(model_type="bogus")


def test_comparer_sub(sentiment_chrono_split):
    sentiment_split = sentiment_chrono_split
    from cornac_tpu.models import ComparERSub

    m = ComparERSub(
        n_user_factors=4, n_item_factors=4, n_aspect_factors=4,
        n_opinion_factors=4, n_pair_samples=20, n_bpr_samples=20,
        n_element_samples=20, min_user_freq=1, max_iter=30, lr=0.1,
        seed=123, verbose=False,
    ).fit(sentiment_split.train_set)
    assert (m.U >= 0).all() and (m.I >= 0).all()  # non-negativity projection
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)


def test_companion(sentiment_split):
    from cornac_tpu.models import Companion

    m = Companion(
        n_user_factors=4, n_item_factors=4, n_aspect_factors=4,
        n_opinion_factors=4, n_element_samples=10, n_bpr_samples=10,
        n_aspect_ranking_samples=10, n_opinion_ranking_samples=10,
        max_iter=30, lr=0.5, seed=123, verbose=False,
    ).fit(sentiment_split.train_set)
    assert (m.U >= 0).all() and (m.O >= 0).all()
    assert m.G2.shape[0] == m.n_user_factors + m.n_item_factors
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    ranked, scores = m.rank(0, k=5)
    assert len(ranked) == m.total_items
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(objective="rating", predictor="dot", combiner="concat",
             preference_module="mf", embedding_type="learned"),
        dict(learn_explainability=True, learn_method="transr"),
        dict(learn_explainability=True, learn_method="non-linear",
             combiner="bi-interaction", review_aggregator="gatv2",
             graph_type="as"),
    ],
    ids=["default", "rating-dot-concat-mf", "explain-transr", "explain-nl-gatv2"],
)
def test_hypar(sentiment_split, kwargs):
    from cornac_tpu.models import HypAR

    m = HypAR(
        node_dim=8, num_heads=2, num_epochs=2, batch_size=16,
        num_neg_samples=4, learning_rate=0.01, model_selection="last",
        seed=123, verbose=False, **kwargs,
    ).fit(sentiment_split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-4)


def test_hypar_validation(sentiment_split):
    from cornac_tpu.models import HypAR

    for bad in (
        dict(objective="nope"), dict(combiner="nope"),
        dict(review_aggregator="nope"), dict(predictor="nope"),
        dict(preference_module="nope"), dict(embedding_type="nope"),
        dict(early_stopping=7, eval_interval=2),
    ):
        with pytest.raises(ValueError):
            HypAR(**bad)
    rs = RatioSplit(
        data=Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR"),
        test_size=0.2, seed=1,
    )
    with pytest.raises(ValueError):
        HypAR(num_epochs=1).fit(rs.train_set)


def test_hypar_best_selection(sentiment_split):
    from cornac_tpu.models import HypAR

    m = HypAR(
        node_dim=8, num_heads=2, num_epochs=4, batch_size=16,
        num_neg_samples=4, model_selection="best", eval_interval=1,
        early_stopping=2, seed=1, verbose=False,
    ).fit(sentiment_split.train_set, sentiment_split.test_set)
    assert np.isfinite(m.score_batch(np.array([0]))).all()
