"""Review-based rating models: NARRE + HRDR over a ReviewModality."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader, ReviewModality
from cornac_tpu.eval_methods import RatioSplit

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

WORDS = (
    "great terrible fine awesome boring classic fresh stale loud quiet "
    "sharp dull warm cold fast slow deep shallow rich plain"
).split()


@pytest.fixture(scope="module")
def review_split():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rng = np.random.RandomState(42)
    reviews = [
        (u, i, " ".join(rng.choice(WORDS, size=rng.randint(3, 8))))
        for u, i, _ in data
    ]
    return RatioSplit(
        data=data,
        test_size=0.2,
        val_size=0.1,
        seed=123,
        review_text=ReviewModality(data=reviews, max_vocab=100),
    )


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["NARRE"]).NARRE(
            embedding_size=8, id_embedding_size=4, n_factors=4,
            attention_size=4, n_filters=4, max_text_length=8,
            max_num_review=4, batch_size=16, max_iter=2, verbose=False,
            seed=123,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["NARRE"]).NARRE(
            embedding_size=8, id_embedding_size=4, n_factors=4,
            attention_size=4, n_filters=4, kernel_sizes=[2, 3],
            max_text_length=8, max_num_review=4, batch_size=16, max_iter=2,
            model_selection="best", verbose=False, seed=123,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["HRDR"]).HRDR(
            embedding_size=8, id_embedding_size=4, n_factors=4,
            attention_size=4, n_filters=4, n_user_mlp_factors=8,
            n_item_mlp_factors=8, max_text_length=8, max_num_review=4,
            batch_size=16, max_iter=2, verbose=False, seed=123,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["HRDR"]).HRDR(
            embedding_size=8, id_embedding_size=4, n_factors=4,
            attention_size=4, n_filters=4, n_user_mlp_factors=8,
            n_item_mlp_factors=8, kernel_sizes=[2, 3], max_text_length=8,
            max_num_review=4, batch_size=16, max_iter=2,
            model_selection="best", verbose=False, seed=123,
        ),
    ],
    ids=["NARRE", "NARRE-best", "HRDR", "HRDR-multikernel-best"],
)
def test_review_models(review_split, make_model):
    m = make_model()
    m.fit(review_split.train_set, review_split.val_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-4)
    assert np.isfinite(m.score(0, 1))
    assert len(m.losses["train_losses"]) in (0, m.max_iter)
    if m.model_selection == "best":
        assert m.best_epoch is not None
        assert len(m.losses["val_losses"]) == m.max_iter
    # ANN protocol: user/item vector dot reproduces score
    uv, iv = m.get_user_vectors(), m.get_item_vectors()
    np.testing.assert_allclose(uv[0] @ iv[1], m.score(0, 1), rtol=1e-4, atol=1e-4)


def test_review_models_require_modality():
    from cornac_tpu.models import HRDR, NARRE

    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rs = RatioSplit(data=data, test_size=0.2, seed=1)
    with pytest.raises(ValueError):
        NARRE(max_iter=1).fit(rs.train_set)
    with pytest.raises(ValueError):
        HRDR(max_iter=1).fit(rs.train_set)
