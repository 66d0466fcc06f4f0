"""Graph-CF (LightGCN/NGCF) and visual (VBPR/AMR) model families."""

import os

import numpy as np
import pytest

from cornac_tpu.data import ImageModality, Reader
from cornac_tpu.eval_methods import RatioSplit, ranking_eval
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import AMR, LightGCN, NGCF, VBPR

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _uir_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")


@pytest.fixture(scope="module")
def split():
    return RatioSplit(
        data=_uir_data(), test_size=0.2, rating_threshold=3.0, seed=123
    )


@pytest.fixture(scope="module")
def image_split():
    rng = np.random.RandomState(0)
    ids = [f"item{i}" for i in range(20)]
    feats = rng.rand(20, 12).astype(np.float32)
    return RatioSplit(
        data=_uir_data(),
        test_size=0.2,
        rating_threshold=3.0,
        seed=123,
        item_image=ImageModality(features=feats, ids=ids),
    )


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: LightGCN(emb_size=8, num_layers=2, num_epochs=3, batch_size=64, seed=1, verbose=False),
        lambda: NGCF(emb_size=8, layer_sizes=[8, 8], num_epochs=3, batch_size=64, seed=1, verbose=False),
    ],
    ids=["LightGCN", "NGCF"],
)
def test_graph_models(split, make_model):
    m = make_model().fit(split.train_set)
    row = np.asarray(m.score(0))
    assert np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)
    avg, _ = ranking_eval(
        m, [NDCG(k=3), Recall(k=3)], split.train_set, split.test_set,
        rating_threshold=3.0,
    )
    assert all(np.isfinite(v) for v in avg)


def test_lightgcn_early_stopping(split):
    data = _uir_data()
    rs = RatioSplit(data=data, test_size=0.2, val_size=0.2, seed=1)
    m = LightGCN(
        emb_size=8, num_layers=1, num_epochs=10, batch_size=64, seed=1,
        early_stopping={"min_delta": 10.0, "patience": 0}, verbose=False,
    )
    m.fit(rs.train_set, rs.val_set)  # stops early due to huge min_delta
    assert m.stopped_epoch > 0


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: VBPR(k=4, k2=4, n_epochs=3, batch_size=32, seed=1, verbose=False),
        lambda: AMR(k=4, k2=4, n_epochs=3, batch_size=32, seed=1, verbose=False),
    ],
    ids=["VBPR", "AMR"],
)
def test_visual_models(image_split, make_model):
    m = make_model().fit(image_split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.total_items
    assert np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0], row, rtol=1e-4, atol=1e-5)
    # ANN vectors round-trip
    assert m.get_user_vectors().shape[0] == m.total_users
    assert m.get_item_vectors().shape[0] == m.total_items


def test_vbpr_requires_image_modality(split):
    from cornac_tpu.exception import CornacException

    with pytest.raises(CornacException):
        VBPR(k=2, n_epochs=1, verbose=False).fit(split.train_set)


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["VMF"]).VMF(
            k=4, d=4, n_epochs=3, batch_size=32, verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["CausalRec"]).CausalRec(
            k=4, k2=4, n_epochs=3, batch_size=32, tanh=0, verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["CausalRec"]).CausalRec(
            k=4, k2=4, n_epochs=2, batch_size=32, tanh=1, verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["CausalRec"]).CausalRec(
            k=4, k2=4, n_epochs=2, batch_size=32, tanh=2, verbose=False, seed=1,
        ),
    ],
    ids=["VMF", "CausalRec-t0", "CausalRec-t1", "CausalRec-t2"],
)
def test_more_visual_models(image_split, make_model):
    m = make_model().fit(image_split.train_set)
    row = np.asarray(m.score(0))
    assert np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-6)


class TestGCMC:
    def test_fit_score_transform(self, split):
        from cornac_tpu.models import GCMC

        m = GCMC(
            max_iter=8, gcn_agg_units=12, gcn_out_units=6, gcn_dropout=0.3,
            train_valid_interval=2, seed=123, learning_rate=0.05,
        ).fit(split.train_set, split.val_set if hasattr(split, "val_set") else None)
        row = np.asarray(m.score(0))
        assert row.shape[0] == m.num_items and np.isfinite(row).all()
        # expected ratings live inside the observed rating range
        vals = m.rating_values
        assert row.min() >= vals.min() - 1e-4 and row.max() <= vals.max() + 1e-4
        batch = m.score_batch(np.array([0, 1]))
        np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)
        # transform caches test-pair predictions
        m.transform(split.test_set)
        tu, ti, _ = split.test_set.uir_tuple
        key = "%d-%d" % (tu[0], ti[0])
        assert key in m.u_i_rating_dict
        assert np.isclose(
            m.u_i_rating_dict[key], m.score(int(tu[0]), int(ti[0])), atol=1e-4
        )

    def test_sum_accum_and_valid(self, split):
        from cornac_tpu.models import GCMC

        rs = split
        m = GCMC(
            max_iter=6, gcn_agg_units=8, gcn_out_units=4, gcn_agg_accum="sum",
            train_valid_interval=2, train_decay_patience=1,
            train_early_stopping_patience=50, seed=7, learning_rate=0.05,
        )
        m.fit(rs.train_set, rs.test_set)  # use test split as valid for the protocol
        assert np.isfinite(m.score(1)).all()


class TestDMRL:
    def _split(self, with_text=True, with_image=True):
        from cornac_tpu.data import ImageModality, Reader, TextModality

        data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
        rng = np.random.RandomState(2)
        iids = sorted({i for _, i, _ in data})
        kwargs = {}
        if with_text:
            docs = ["alpha beta gamma delta " * (1 + k % 3) for k in range(len(iids))]
            kwargs["item_text"] = TextModality(corpus=docs, ids=iids, max_vocab=30)
        if with_image:
            kwargs["item_image"] = ImageModality(
                features=rng.rand(len(iids), 6).astype(np.float32), ids=iids
            )
        return RatioSplit(data=data, test_size=0.2, seed=123, **kwargs)

    @pytest.mark.parametrize(
        "with_text,with_image",
        [(True, False), (False, True), (True, True)],
        ids=["text", "image", "both"],
    )
    def test_fit_score(self, with_text, with_image):
        from cornac_tpu.models import DMRL

        rs = self._split(with_text, with_image)
        m = DMRL(
            embedding_dim=8, num_factors=2, num_neg=2, epochs=2,
            batch_size=16, seed=123,
        ).fit(rs.train_set)
        row = np.asarray(m.score(0))
        assert row.shape[0] == m.num_items and np.isfinite(row).all()
        batch = m.score_batch(np.array([0, 1]))
        np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)

    def test_validation(self):
        from cornac_tpu.models import DMRL

        with pytest.raises(ValueError):
            DMRL(embedding_dim=10, num_factors=3)
        rs = self._split(False, False)
        with pytest.raises(ValueError):
            DMRL(embedding_dim=8, num_factors=2, epochs=1).fit(rs.train_set)
