"""Neural model family: VAECF + NCF trio train, score, and plug into the
batched eval harness."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import RatioSplit, ranking_eval
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import GMF, MLP, NeuMF, VAECF

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def split():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    return RatioSplit(data=data, test_size=0.2, rating_threshold=3.0, seed=123)


NEURAL_MODELS = [
    lambda: VAECF(k=4, autoencoder_structure=[8], n_epochs=3, batch_size=8, seed=123, verbose=False),
    lambda: VAECF(k=4, likelihood="bern", n_epochs=2, batch_size=8, seed=123, verbose=False),
    lambda: GMF(num_factors=4, num_epochs=3, batch_size=64, seed=123, verbose=False),
    lambda: MLP(layers=(16, 8, 4), num_epochs=3, batch_size=64, seed=123, verbose=False),
    lambda: NeuMF(num_factors=4, layers=(16, 8, 4), num_epochs=3, batch_size=64, seed=123, verbose=False),
]


@pytest.mark.parametrize("make_model", NEURAL_MODELS, ids=lambda f: f().name)
def test_fit_and_eval(split, make_model):
    model = make_model().fit(split.train_set)
    # scoring surfaces
    row = np.asarray(model.score(0))
    assert row.shape == (model.num_items,)
    assert np.isfinite(row).all()
    batch = model.score_batch(np.array([0, 1]))
    assert batch.shape == (2, model.total_items)
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)
    # plugs into the eval harness
    avg, _ = ranking_eval(
        model, [NDCG(k=3), Recall(k=3)], split.train_set, split.test_set,
        rating_threshold=3.0,
    )
    assert all(np.isfinite(v) for v in avg)
    # device scorer (fused-eval input) agrees with the host batch scorer
    dev = model.score_batch_device(np.array([0, 1]))
    if dev is not None:
        dev = np.asarray(dev, dtype=np.float64)
        np.testing.assert_allclose(
            dev, batch[:, : dev.shape[1]], rtol=1e-4, atol=1e-5
        )


def test_vaecf_likelihood_validation():
    with pytest.raises(ValueError):
        VAECF(likelihood="nope")
    with pytest.raises(ValueError):
        VAECF(act_fn="nope")


def test_neumf_pretrained(split):
    gmf = GMF(num_factors=4, num_epochs=2, batch_size=64, seed=1, verbose=False).fit(
        split.train_set
    )
    mlp = MLP(layers=(8, 4), num_epochs=2, batch_size=64, seed=1, verbose=False).fit(
        split.train_set
    )
    neumf = NeuMF(
        num_factors=4, layers=(8, 4), num_epochs=2, batch_size=64, seed=1,
        verbose=False,
    ).pretrain(gmf, mlp)
    neumf.fit(split.train_set)
    assert np.isfinite(neumf.score(0)).all()


def test_vaecf_learns(split):
    """Training should improve multinomial likelihood of train rows: the
    top-scored items should overlap the user's seen items more than chance."""
    m = VAECF(
        k=8, autoencoder_structure=[16], n_epochs=50, batch_size=16, seed=123,
        verbose=False,
    ).fit(split.train_set)
    csr = split.train_set.csr_matrix
    hits, total = 0, 0
    for u in range(split.train_set.num_users):
        seen = set(csr.getrow(u).indices)
        if not seen:
            continue
        top = np.argsort(-m.score(u))[: len(seen)]
        hits += len(seen & set(top))
        total += len(seen)
    assert hits / total > 0.3  # >> chance (~len(seen)/num_items)


def test_recvae(split):
    from cornac_tpu.models import RecVAE

    m = RecVAE(
        hidden_dim=16, latent_dim=8, batch_size=8, n_epochs=2,
        n_enc_epochs=1, n_dec_epochs=1, seed=123, verbose=False,
    ).fit(split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape == (m.num_items,) and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)


def test_bivaecf(split):
    from cornac_tpu.models import BiVAECF

    m = BiVAECF(
        k=4, encoder_structure=[8], n_epochs=3, batch_size=8, seed=123,
        verbose=False,
    ).fit(split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape == (m.num_items,) and np.isfinite(row).all()
    assert 0 <= row.min() and row.max() <= 1  # sigmoid outputs
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)


def test_bivaecf_cap_priors(split):
    from cornac_tpu.data import FeatureModality, Reader
    from cornac_tpu.eval_methods import RatioSplit
    from cornac_tpu.models import BiVAECF

    rng = np.random.RandomState(1)
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    rs = RatioSplit(
        data=data, test_size=0.2, seed=123,
        user_feature=FeatureModality(
            features=rng.rand(15, 6), ids=[f"user{i}" for i in range(15)]
        ),
    )
    m = BiVAECF(
        k=4, encoder_structure=[8], n_epochs=2, batch_size=8, seed=1,
        cap_priors={"user": True, "item": False}, verbose=False,
    ).fit(rs.train_set)
    assert np.isfinite(m.score(0)).all()


def test_vectorized_score_pairs_matches_loop():
    """Neural models' batched score_pairs (one device program) must equal
    the per-pair score() loop, including unknown-entity fallbacks."""
    import numpy as np

    from cornac_tpu.eval_methods import RatioSplit
    from cornac_tpu.models import BiVAECF, GMF, RecVAE, VAECF
    from cornac_tpu.models.recommender import Recommender

    rng = np.random.RandomState(0)
    data = [
        (f"u{rng.randint(25)}", f"i{rng.randint(40)}", float(rng.randint(1, 6)))
        for _ in range(500)
    ]
    rs = RatioSplit(data=data, test_size=0.2, seed=1)
    pairs_u = rng.randint(0, 25, 50)
    pairs_i = rng.randint(0, 40, 50)

    for make in (
        lambda: VAECF(k=4, n_epochs=2, seed=2),
        lambda: RecVAE(n_epochs=1, hidden_dim=16, latent_dim=8, seed=2),
        lambda: BiVAECF(k=4, n_epochs=2, seed=2),
        lambda: GMF(num_factors=4, num_epochs=1, seed=2, verbose=False),
    ):
        m = make().fit(rs.train_set)
        fast = m.score_pairs(pairs_u, pairs_i)
        slow = Recommender.score_pairs(m, pairs_u, pairs_i)
        np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6,
                                   err_msg=m.name)


def test_vaecf_streaming_matches_resident(monkeypatch):
    """Above the dense-HBM budget VAECF keeps only the CSR coordinates on
    device and densifies each batch with an on-device scatter; the random
    stream and batch slices match the resident whole-matrix program, so the
    fitted scores must agree. Same contract for the per-step index-window
    fallback used when even the coordinates exceed their budget."""
    import numpy as np

    from cornac_tpu.eval_methods import RatioSplit
    from cornac_tpu.models import vaecf as vaecf_mod

    rng = np.random.RandomState(4)
    data = [
        (f"u{rng.randint(30)}", f"i{rng.randint(50)}", 1.0) for _ in range(500)
    ]
    rs = RatioSplit(data=data, test_size=0.2, rating_threshold=0.5, seed=123)
    kw = dict(k=4, autoencoder_structure=[8], n_epochs=4, batch_size=8, seed=11)

    resident = VAECF(**kw).fit(rs.train_set)
    want = resident.score_batch(np.arange(8))

    monkeypatch.setattr(vaecf_mod, "_RESIDENT_BYTES", 0)
    sparse_resident = VAECF(**kw).fit(rs.train_set)
    np.testing.assert_allclose(
        want, sparse_resident.score_batch(np.arange(8)), rtol=5e-4, atol=5e-5
    )

    monkeypatch.setattr(vaecf_mod, "_SPARSE_RESIDENT_BYTES", 0)
    windowed = VAECF(**kw).fit(rs.train_set)
    np.testing.assert_allclose(
        want, windowed.score_batch(np.arange(8)), rtol=5e-4, atol=5e-5
    )
