"""HPF (CAVI), SBPR (social), VEBPR (purchase+view)."""

import os

import numpy as np
import pytest

from cornac_tpu.data import GraphModality, PurchaseViewDataset, Reader
from cornac_tpu.eval_methods import RatioSplit, ranking_eval
from cornac_tpu.metrics import AUC
from cornac_tpu.models import HPF, SBPR, VEBPR

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _uir_data():
    return Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")


@pytest.mark.parametrize("hierarchical", [True, False], ids=["HPF", "PF"])
def test_hpf(hierarchical):
    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
    m = HPF(k=4, max_iter=20, hierarchical=hierarchical, seed=123).fit(rs.train_set)
    assert (m.Theta >= 0).all() and (m.Beta >= 0).all()  # Gamma means
    row = np.asarray(m.score(0))
    assert np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-6)
    # CAVI should reconstruct observed counts better than chance
    avg, _ = ranking_eval(m, [AUC()], rs.train_set, rs.test_set)
    assert np.isfinite(avg[0])


def test_sbpr():
    rng = np.random.RandomState(0)
    ids = [f"user{i}" for i in range(15)]
    edges = [(ids[rng.randint(15)], ids[rng.randint(15)], 1.0) for _ in range(40)]
    rs = RatioSplit(
        data=_uir_data(), test_size=0.2, seed=123,
        user_graph=GraphModality(data=edges),
    )
    m = SBPR(k=4, max_iter=5, seed=123).fit(rs.train_set)
    assert np.isfinite(m.score(0)).all()
    assert m.score_batch(np.array([0, 1])).shape == (2, m.total_items)


def test_sbpr_requires_graph():
    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
    with pytest.raises(ValueError):
        SBPR(k=2, max_iter=1, seed=1).fit(rs.train_set)


def test_vebpr():
    rng = np.random.RandomState(1)
    purchases = [(f"u{rng.randint(10)}", f"i{rng.randint(25)}", 1.0) for _ in range(150)]
    views = [(f"u{rng.randint(10)}", f"i{rng.randint(25)}", 1.0) for _ in range(150)]
    ds = PurchaseViewDataset.build(purchases, views, seed=7)
    m = VEBPR(k=4, max_iter=5, seed=123)
    m.fit(ds)
    assert np.isfinite(m.score(0)).all()


def test_vebpr_requires_view_matrix():
    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
    with pytest.raises(ValueError):
        VEBPR(k=2, max_iter=1, seed=1).fit(rs.train_set)


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["IBPR"]).IBPR(k=4, max_iter=3, seed=1, verbose=False),
        lambda: __import__("cornac_tpu.models", fromlist=["OnlineIBPR"]).OnlineIBPR(k=4, max_iter=3, seed=1, verbose=False),
        lambda: __import__("cornac_tpu.models", fromlist=["COE"]).COE(k=4, max_iter=3, seed=1, verbose=False),
    ],
    ids=["IBPR", "OnlineIBPR", "COE"],
)
def test_embedding_triplet_models(make_model):
    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
    m = make_model().fit(rs.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)


def test_cvaecf():
    from cornac_tpu.models import CVAECF

    rng = np.random.RandomState(3)
    ids = [f"user{i}" for i in range(15)]
    edges = [(ids[rng.randint(15)], ids[rng.randint(15)], 1.0) for _ in range(40)]
    rs = RatioSplit(
        data=_uir_data(), test_size=0.2, seed=123,
        user_graph=GraphModality(data=edges),
    )
    m = CVAECF(
        z_dim=4, h_dim=4, autoencoder_structure=[8], n_epochs=3,
        batch_size=8, seed=123,
    ).fit(rs.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-6)
    assert np.isfinite(m.score(0, 1))


def test_cvaecf_requires_graph():
    from cornac_tpu.models import CVAECF

    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=123)
    with pytest.raises(ValueError):
        CVAECF(n_epochs=1).fit(rs.train_set)


def test_pcrl():
    from cornac_tpu.models import PCRL

    rng = np.random.RandomState(9)
    ids = [f"item{i}" for i in range(20)]
    edges = [(ids[rng.randint(20)], ids[rng.randint(20)], 1.0) for _ in range(60)]
    rs = RatioSplit(
        data=_uir_data(), test_size=0.2, seed=123,
        item_graph=GraphModality(data=edges),
    )
    m = PCRL(k=4, z_dims=[8], max_iter=3, batch_size=8, seed=123).fit(rs.train_set)
    assert (m.Theta >= 0).all() and (m.Beta >= 0).all()
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-6)
    # stochastic generator weights path
    m2 = PCRL(
        k=4, z_dims=[8], max_iter=2, batch_size=8, w_determinist=False, seed=1
    ).fit(rs.train_set)
    assert np.isfinite(np.asarray(m2.score(0))).all()


def test_pcrl_requires_item_graph():
    from cornac_tpu.models import PCRL

    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=1)
    with pytest.raises(ValueError):
        PCRL(k=2, max_iter=1).fit(rs.train_set)


@pytest.mark.parametrize("variant", ["c2pf", "tc2pf", "rc2pf"])
def test_c2pf(variant):
    from cornac_tpu.models import C2PF

    rng = np.random.RandomState(11)
    ids = [f"item{i}" for i in range(20)]
    edges = [(ids[rng.randint(20)], ids[rng.randint(20)], 1.0) for _ in range(50)]
    rs = RatioSplit(
        data=_uir_data(), test_size=0.2, seed=123,
        item_graph=GraphModality(data=edges),
    )
    m = C2PF(k=4, max_iter=10, variant=variant, seed=123).fit(rs.train_set)
    assert m.name == variant.upper()
    assert (m.Theta >= 0).all()
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-6)


def test_c2pf_validation():
    from cornac_tpu.models import C2PF

    with pytest.raises(ValueError):
        C2PF(variant="bogus")
    rs = RatioSplit(data=_uir_data(), test_size=0.2, seed=1)
    with pytest.raises(ValueError):
        C2PF(k=2, max_iter=1).fit(rs.train_set)
