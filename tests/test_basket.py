"""Next-basket subsystem: NextBasketEvaluation + GPTop/TIFUKNN/UPCF."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import NextBasketEvaluation
from cornac_tpu.metrics import NDCG, HitRatio, Recall
from cornac_tpu.models import GPTop, TIFUKNN, UPCF

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def nbe():
    data = Reader().read(os.path.join(DATA_DIR, "basket.txt"), fmt="UBIT")
    return NextBasketEvaluation(
        data=data, test_size=0.25, fmt="UBIT", seed=123,
        repetition_eval=True, exploration_eval=True,
    )


BASKET_MODELS = [
    lambda: GPTop(),
    lambda: GPTop(use_personalized_popularity=False),
    lambda: TIFUKNN(n_neighbors=3),
    lambda: UPCF(recency=2, locality=1),
]


@pytest.mark.parametrize("make_model", BASKET_MODELS, ids=lambda f: type(f()).__name__)
def test_next_basket_flow(nbe, make_model):
    model = make_model()
    result, _ = nbe.evaluate(
        model, [NDCG(k=5), HitRatio(k=5), Recall(k=5)], user_based=False
    )
    assert "Recall@5" in result.metric_avg_results
    # repetition/exploration rows exist
    assert "Recall@5-rep" in result.metric_avg_results
    assert "Recall@5-expl" in result.metric_avg_results
    for name, value in result.metric_avg_results.items():
        assert np.isfinite(value), name


def test_user_atomic_split(nbe):
    """Users are split atomically between train and test sets."""
    train_users = set(nbe.train_set.uir_tuple[0])
    test_users = set(nbe.test_set.uir_tuple[0])
    assert not (train_users & test_users)


def test_gptop_personal_beats_global_on_repetitive_data():
    """Users who rebuy the same items are better served by personalized
    popularity."""
    data = []
    rng = np.random.RandomState(3)
    for u in range(12):
        fav = list(rng.choice(40, size=4, replace=False))
        for b in range(4):
            for i in fav:
                data.append((f"u{u}", f"b{u}_{b}", f"i{i}", 1000 + b))
    nbe = NextBasketEvaluation(data=data, test_size=0.25, fmt="UBIT", seed=7)
    personal, _ = nbe.evaluate(GPTop(), [HitRatio(k=4)], user_based=False)
    global_only, _ = nbe.evaluate(
        GPTop(use_personalized_popularity=False), [HitRatio(k=4)], user_based=False
    )
    assert (
        personal.metric_avg_results["HitRatio@4"]
        >= global_only.metric_avg_results["HitRatio@4"]
    )
    assert personal.metric_avg_results["HitRatio@4"] == 1.0  # perfect rebuy data


@pytest.mark.parametrize("cell", ["LSTM", "GRU", "RNN"])
def test_beacon(nbe, cell):
    from cornac_tpu.models import Beacon

    m = Beacon(
        emb_dim=4, rnn_unit=4, rnn_cell_type=cell, n_epochs=2, batch_size=8,
        nb_hop=2, seed=123, verbose=False,
    )
    result, _ = nbe.evaluate(m, [HitRatio(k=5), Recall(k=5)], user_based=False)
    for name, value in result.metric_avg_results.items():
        assert np.isfinite(value), name
    # direct scoring with an explicit history
    row = m.score(0, [[0, 1], [2]])
    assert row.shape[0] >= m.num_items and np.isfinite(row).all()


def test_beacon_validation():
    from cornac_tpu.models import Beacon

    with pytest.raises(ValueError):
        Beacon(rnn_cell_type="nope")


@pytest.mark.parametrize("loss_type", ["bpr", "mse", "weight_mse"])
def test_dnntsp(nbe, loss_type):
    from cornac_tpu.models import DNNTSP

    m = DNNTSP(
        emb_dim=8, loss_type=loss_type, n_epochs=2, batch_size=8, seed=123,
        verbose=False,
    )
    result, _ = nbe.evaluate(m, [HitRatio(k=5), Recall(k=5)], user_based=False)
    for name, value in result.metric_avg_results.items():
        assert np.isfinite(value), name
    row = m.score(0, [[0, 1], [2, 0]])
    assert row.shape[0] >= m.num_items and np.isfinite(row).all()


def test_dnntsp_validation():
    from cornac_tpu.models import DNNTSP

    with pytest.raises(ValueError):
        DNNTSP(loss_type="nope")
    with pytest.raises(ValueError):
        DNNTSP(emb_dim=10)
