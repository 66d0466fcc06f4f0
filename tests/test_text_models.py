"""Text-aware model family: CTR, HFT, CDL (item_text modality)."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader, TextModality
from cornac_tpu.eval_methods import RatioSplit, ranking_eval
from cornac_tpu.metrics import NDCG
from cornac_tpu.models import CDL, CTR, HFT

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

WORDS = (
    "jazz piano guitar violin rock ballad slow fast melodic loud quiet "
    "acoustic electric drum vocal chorus epic sad happy dark"
).split()


@pytest.fixture(scope="module")
def text_split():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rng = np.random.RandomState(6)
    ids = [f"item{i}" for i in range(20)]
    corpus = [
        " ".join(rng.choice(WORDS, size=rng.randint(5, 15)).tolist()) for _ in ids
    ]
    return RatioSplit(
        data=data, test_size=0.2, rating_threshold=3.0, seed=123,
        item_text=TextModality(corpus=corpus, ids=ids),
    )


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: CTR(k=4, max_iter=3, verbose=False, seed=123),
        lambda: HFT(k=3, max_iter=2, grad_iter=5, verbose=False, seed=123),
        lambda: CDL(
            k=4, autoencoder_structure=[8], max_iter=2, batch_size=8,
            verbose=False, seed=123,
        ),
    ],
    ids=["CTR", "HFT", "CDL"],
)
def test_text_models(text_split, make_model):
    m = make_model().fit(text_split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items
    assert np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)
    avg, _ = ranking_eval(
        m, [NDCG(k=3)], text_split.train_set, text_split.test_set,
        rating_threshold=3.0,
    )
    assert np.isfinite(avg[0])


def test_text_models_require_modality():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rs = RatioSplit(data=data, test_size=0.2, seed=1)
    for model in [CTR(max_iter=1), HFT(max_iter=1), CDL(max_iter=1)]:
        with pytest.raises(ValueError):
            model.fit(rs.train_set)


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["ConvMF"]).ConvMF(
            k=4, n_epochs=2, cnn_epochs=1, emb_dim=8, max_len=10,
            filter_sizes=(2, 3), num_filters=4, hidden_dim=8, verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["CVAE"]).CVAE(
            z_dim=4, n_epochs=2, vae_layers=(8,), batch_size=8, verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["CVAE"]).CVAE(
            z_dim=4, n_epochs=1, vae_layers=(8,), loss_type="rmse",
            batch_size=8, verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["CDR"]).CDR(
            k=4, autoencoder_structure=[8], max_iter=2, batch_size=16,
            verbose=False, seed=1,
        ),
    ],
    ids=["ConvMF", "CVAE-xe", "CVAE-rmse", "CDR"],
)
def test_more_text_models(text_split, make_model):
    m = make_model().fit(text_split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)
