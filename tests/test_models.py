"""Model tests: base Recommender behavior + each factor model trains,
scores, ranks, saves/loads, clones on tiny data."""

import os

import numpy as np
import pytest

from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.models import (
    BPR,
    EASE,
    MCF,
    MF,
    MMMF,
    NMF,
    PMF,
    SVD,
    WBPR,
    WMF,
    BaselineOnly,
    GlobalAvg,
    ItemKNN,
    MostPop,
    Recommender,
    SKMeans,
    SoRec,
    UserKNN,
    is_ann_supported,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def split():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
    return RatioSplit(data=data, test_size=0.2, rating_threshold=3.0, seed=123)


ALL_MODELS = [
    lambda: MF(k=4, max_iter=3, seed=123),
    lambda: SVD(k=4, max_iter=3, seed=123),
    lambda: PMF(k=4, max_iter=3, seed=123),
    lambda: PMF(k=4, max_iter=3, variant="linear", seed=123),
    lambda: BPR(k=4, max_iter=3, seed=123),
    lambda: WBPR(k=4, max_iter=3, seed=123),
    lambda: BaselineOnly(max_iter=3, seed=123),
    lambda: GlobalAvg(),
    lambda: MostPop(),
    lambda: NMF(k=4, max_iter=3, seed=123),
    lambda: NMF(k=4, max_iter=3, use_bias=True, seed=123),
    lambda: EASE(lamb=10.0, verbose=False),
    lambda: WMF(k=4, max_iter=2, verbose=False, seed=123),
    lambda: UserKNN(k=3, verbose=False, seed=123),
    lambda: ItemKNN(k=3, verbose=False, seed=123),
    lambda: UserKNN(k=3, similarity="pearson", weighting="idf", verbose=False),
    lambda: ItemKNN(k=3, mean_centered=True, weighting="bm25", verbose=False),
    lambda: MMMF(k=4, max_iter=3, seed=123),
    lambda: SKMeans(k=3, max_iter=5, verbose=False, seed=123),
]


@pytest.mark.parametrize("make_model", ALL_MODELS, ids=lambda f: f().name)
class TestModelContract:
    def test_fit_score_rank(self, split, make_model):
        model = make_model().fit(split.train_set)
        # single score
        s = model.rate(0, 0)
        assert np.isfinite(s)
        # full ranking
        ranked, scores = model.rank(0, k=5)
        assert len(ranked) == model.total_items
        # score_batch agrees with per-user score on known users
        batch = model.score_batch(np.array([0, 1]))
        assert batch.shape == (2, model.total_items)
        row = np.asarray(model.score(0), dtype=np.float64)
        np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)

    def test_device_scorer_matches_host(self, split, make_model):
        """score_batch_device (fused-eval input) must agree with the host
        score_batch over its column range (f32 device vs f64 host)."""
        model = make_model().fit(split.train_set)
        users = np.array([0, 1, model.num_users - 1])
        dev = model.score_batch_device(users)
        if dev is None:
            pytest.skip("model has no device batch scorer")
        dev = np.asarray(dev, dtype=np.float64)
        host = model.score_batch(users)[:, : dev.shape[1]]
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)

    def test_clone(self, split, make_model):
        model = make_model()
        clone = model.clone()
        assert clone.name == model.name
        assert clone is not model

    def test_save_load(self, split, make_model, tmp_path):
        model = make_model().fit(split.train_set)
        path = model.save(str(tmp_path))
        loaded = Recommender.load(path)
        assert loaded.name == model.name
        np.testing.assert_allclose(
            loaded.score_batch(np.array([0])), model.score_batch(np.array([0]))
        )


class TestGraphCoFactorization:
    """SoRec (user graph) and MCF (item graph) with graph modalities."""

    def _graph_split(self, which):
        from cornac_tpu.data import GraphModality, Reader

        data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
        rng = np.random.RandomState(5)
        if which == "user":
            ids = [f"user{i}" for i in range(15)]
        else:
            ids = [f"item{i}" for i in range(20)]
        edges = [
            (ids[rng.randint(len(ids))], ids[rng.randint(len(ids))], 1.0)
            for _ in range(40)
        ]
        modality = GraphModality(data=edges)
        kwargs = {"user_graph": modality} if which == "user" else {"item_graph": modality}
        return RatioSplit(data=data, test_size=0.2, seed=123, **kwargs)

    def test_sorec(self):
        split = self._graph_split("user")
        m = SoRec(k=4, max_iter=3, seed=123).fit(split.train_set)
        ranked, _ = m.rank(0, k=5)
        assert len(ranked) == m.total_items
        batch = m.score_batch(np.array([0, 1]))
        row = np.asarray(m.score(0), dtype=np.float64)
        np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)

    def test_mcf(self):
        split = self._graph_split("item")
        m = MCF(k=4, max_iter=3, seed=123).fit(split.train_set)
        ranked, _ = m.rank(0, k=5)
        assert len(ranked) == m.total_items
        assert np.isfinite(m.rate(0, 0))


class TestRecommenderBase:
    def test_knows_user_item(self, split):
        m = MostPop().fit(split.train_set)
        assert m.knows_user(0)
        assert not m.knows_user(m.num_users)
        assert m.is_unknown_item(m.num_items)

    def test_recommend_raw_ids(self, split):
        m = MostPop().fit(split.train_set)
        uid = list(m.uid_map.keys())[0]
        recs = m.recommend(uid, k=5)
        assert len(recs) == 5
        assert all(r in m.iid_map for r in recs)
        with pytest.raises(ValueError):
            m.recommend("no-such-user")

    def test_recommend_remove_seen(self, split):
        m = MostPop().fit(split.train_set)
        uid = list(m.uid_map.keys())[0]
        uidx = m.uid_map[uid]
        seen = set(split.train_set.csr_matrix.getrow(uidx).indices)
        recs = m.recommend(uid, k=5, remove_seen=True, train_set=split.train_set)
        rec_idx = {m.iid_map[r] for r in recs}
        assert not (rec_idx & seen)

    def test_recommend_batch(self, split):
        m = MF(k=4, max_iter=2, seed=1).fit(split.train_set)
        uids = list(m.uid_map.keys())[:3]
        recs = m.recommend_batch(uids, k=4)
        assert len(recs) == 3 and all(len(r) == 4 for r in recs)
        # agree with single-user recommend
        assert recs[0] == m.recommend(uids[0], k=4)

    def test_ann_support(self, split):
        assert is_ann_supported(MF(k=2))
        assert is_ann_supported(BPR(k=2))
        assert not is_ann_supported(MostPop())
        m = BPR(k=2, max_iter=1, seed=1).fit(split.train_set)
        assert m.get_user_vectors().shape[1] == 3  # k + bias column
        assert m.get_item_vectors().shape[1] == 3

    def test_early_stop_protocol(self, split):
        class Monitored(MostPop):
            def __init__(self):
                super().__init__(name="Monitored")
                self.values = iter([1.0, 2.0, 1.5, 1.4])

            def monitor_value(self, train_set, val_set):
                return next(self.values)

        m = Monitored().fit(split.train_set)
        assert not m.early_stop(split.train_set, None, patience=1)  # 1.0 best
        assert not m.early_stop(split.train_set, None, patience=1)  # 2.0 improves
        assert m.early_stop(split.train_set, None, patience=1)  # 1.5 worse -> stop
        assert m.best_epoch == 2


class TestModelQuality:
    """Sanity: trained models must beat random on ranking/rating."""

    def test_mf_fits_train(self, split):
        # small batch so the tiny dataset still gets many SGD steps/epoch
        m = MF(
            k=8, max_iter=50, learning_rate=0.02, batch_size=8, seed=123
        ).fit(split.train_set)
        u, i, r = split.train_set.uir_tuple
        preds = m.score_pairs(u, i)
        rmse = np.sqrt(((preds - r) ** 2).mean())
        assert rmse < 1.0  # in-sample fit on tiny data

    def test_bpr_learns_train_ordering(self, split):
        """After training, observed items should outscore unobserved ones
        for their users (the BPR objective itself; the fixture ratings are
        random so generalization AUC is not meaningful)."""
        m = BPR(
            k=8, max_iter=50, learning_rate=0.05, batch_size=16, seed=123
        ).fit(split.train_set)
        u, i, _ = split.train_set.uir_tuple
        rng = np.random.RandomState(0)
        j = rng.randint(0, split.train_set.num_items, size=len(u))
        ok = ~split.train_set.is_observed(u, j)
        pos = m.score_pairs(u[ok], i[ok])
        neg = m.score_pairs(u[ok], j[ok])
        assert (pos > neg).mean() > 0.8

    def test_bpr_batched_sampling_path_learns(self, split, monkeypatch):
        """The big-|R| per-minibatch sampling mode (HBM-bounded; kicks in
        above _BULK_SAMPLING_MAX samples/epoch) must train as well as the
        bulk path. Forced on by lowering the threshold; batch_size=24 is
        unique to this test so the jit cache cannot serve the bulk-mode
        trace (the gate is read at trace time)."""
        from cornac_tpu.models import bpr as bpr_mod

        monkeypatch.setattr(bpr_mod, "_BULK_SAMPLING_MAX", 1)
        m = BPR(
            k=8, max_iter=50, learning_rate=0.05, batch_size=24, seed=123
        ).fit(split.train_set)
        u, i, _ = split.train_set.uir_tuple
        rng = np.random.RandomState(0)
        j = rng.randint(0, split.train_set.num_items, size=len(u))
        ok = ~split.train_set.is_observed(u, j)
        pos = m.score_pairs(u[ok], i[ok])
        neg = m.score_pairs(u[ok], j[ok])
        assert (pos > neg).mean() > 0.8


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["FM"]).FM(
            k2=4, max_iter=10, method="sgd", verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["FM"]).FM(
            k2=4, max_iter=3, method="als", verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["FM"]).FM(
            k0=0, k1=1, k2=0, max_iter=5, method="sgd", verbose=False, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["SANSA"]).SANSA(
            l2=10.0, weight_matrix_density=0.2, verbose=False,
        ),
    ],
    ids=["FM-sgd", "FM-als", "FM-linear", "SANSA"],
)
def test_fm_sansa(split, make_model):
    m = make_model().fit(split.train_set)
    row = np.asarray(m.score(0))
    assert row.shape[0] == m.num_items and np.isfinite(row).all()
    batch = m.score_batch(np.array([0, 1]))
    np.testing.assert_allclose(batch[0, : len(row)], row, rtol=1e-4, atol=1e-5)


def test_sansa_density(split):
    """SANSA's density budget applies to the stored factors (the reference
    keeps weights[0]/weights[1] factored and never materializes their
    product): every column of each factor holds at most
    ceil(density * n_items) nonzeros."""
    from cornac_tpu.models import SANSA

    density = 0.1
    m = SANSA(l2=10.0, weight_matrix_density=density, verbose=False).fit(
        split.train_set
    )
    n = m.num_items
    budget = int(np.ceil(density * n))
    # pruning bounds each column of L_inv: that is each ROW of
    # weights[0] (= W.T) and each COLUMN of weights[1] (= scaled W)
    per_row_w1 = np.diff(m.weights[0].tocsr().indptr)
    per_col_w2 = np.diff(m.weights[1].tocsc().indptr)
    assert per_row_w1.max() <= budget
    assert per_col_w2.max() <= budget
    for w in m.weights:
        assert w.nnz <= budget * n


def test_sansa_tiny_catalog_sparse_budget(split):
    """Regression: ceil(density*n) == 1 leaves zero off-diagonal slots per
    column (keep=0); _prune_column used to crash in np.argpartition
    (sansa_movielens.py config: density=0.01 on catalogs <= 100 items)."""
    from cornac_tpu.models import SANSA

    for fc in ("ICF", "CHOLMOD"):
        m = SANSA(
            l2=10.0,
            weight_matrix_density=0.01,
            factorizer_class=fc,
            verbose=False,
        ).fit(split.train_set)
        row = np.asarray(m.score(0))
        assert row.shape[0] == m.num_items and np.isfinite(row).all()
        # with keep=1, both factors degenerate to (scaled) diagonals
        assert np.diff(m.weights[1].tocsc().indptr).max() <= 1


def test_fm_sgd_stays_finite_at_scale():
    """Regression (r4): batch-summed SGD gradients diverged to nan at
    ~48k interactions / batch 1024 / lr 0.01 — the clip in _fm_sgd must
    keep the fit finite where the reference's sequential per-sample
    updates self-correct."""
    import numpy as np

    from cornac_tpu.eval_methods import RatioSplit
    from cornac_tpu.models import FM

    rng = np.random.RandomState(0)
    data = [
        (f"u{u}", f"i{i}", float(rng.randint(1, 6)))
        for u, i in {(rng.randint(900), rng.randint(1600)) for _ in range(60000)}
    ]
    rs = RatioSplit(data=data, test_size=0.2, rating_threshold=4.0, seed=123)
    m = FM(k2=8, max_iter=10, method="sgd", seed=123).fit(rs.train_set)
    assert np.isfinite(m.w0)
    assert np.isfinite(m.w).all() and np.isfinite(m.V).all()


def test_fm_mcmc_gibbs_learns(split):
    """method='mcmc' is a real Gibbs sampler (libFM fm_learn_mcmc.h
    semantics): seeded draws are reproducible and the final sample fits the
    training signal far better than the init."""
    from cornac_tpu.models import FM

    def rmse(m):
        u, i, r = split.train_set.uir_tuple
        return float(np.sqrt(np.mean((m.score_pairs(u, i) - r) ** 2)))

    m0 = FM(k2=2, max_iter=0, method="mcmc", seed=42, verbose=False).fit(
        split.train_set
    )
    m = FM(k2=2, max_iter=50, method="mcmc", seed=42, verbose=False).fit(
        split.train_set
    )
    assert rmse(m) < 0.9 * rmse(m0)

    m2 = FM(k2=2, max_iter=50, method="mcmc", seed=42, verbose=False).fit(
        split.train_set
    )
    np.testing.assert_allclose(m.w, m2.w)
    np.testing.assert_allclose(m.V, m2.V)

    # distinct from the ALS point estimate (it is a posterior draw)
    mals = FM(k2=2, max_iter=50, method="als", seed=42, verbose=False).fit(
        split.train_set
    )
    assert not np.allclose(m.V, mals.V)


class TestReferenceCompatKwargs:
    """Constructor-surface parity: reference scripts pass backend/threading
    knobs that have no TPU meaning; they must be accepted (and cloneable)."""

    def test_noop_threading_kwargs(self):
        from cornac_tpu.models import (
            BPR, WBPR, SBPR, MMMF, BaselineOnly, EFM, FM, ItemKNN, LRPPM,
            MTER, NMF, UserKNN,
        )

        models = [
            BPR(num_threads=4), WBPR(num_threads=4), SBPR(num_threads=4),
            MMMF(num_threads=4), BaselineOnly(num_threads=4),
            EFM(num_threads=4), FM(num_threads=4), NMF(num_threads=4),
            UserKNN(num_threads=4), ItemKNN(num_threads=4),
            LRPPM(n_threads=4), MTER(n_threads=4),
        ]
        for m in models:
            clone = m.clone()  # init-signature introspection round-trips
            assert type(clone) is type(m)

    def test_backend_selector(self):
        from cornac_tpu.models import GMF, MLP, MF, NeuMF

        for cls in (GMF, MLP, NeuMF):
            cls(backend="tensorflow")
            cls(backend="pytorch")
            with pytest.raises(ValueError):
                cls(backend="mxnet")
        MF(backend="cpu"); MF(backend="pytorch")
        with pytest.raises(ValueError):
            MF(backend="gpu")

    def test_mf_optimizers_and_dropout(self, split):
        from cornac_tpu.models import MF

        base = MF(k=4, max_iter=5, optimizer="sgd", seed=123).fit(split.train_set)
        for opt in ("adam", "rmsprop", "adagrad"):
            m = MF(k=4, max_iter=5, optimizer=opt, seed=123).fit(split.train_set)
            row = m.score(0)
            assert np.isfinite(row).all() and row.shape == base.score(0).shape
        with pytest.raises(ValueError):
            MF(optimizer="lbfgs").fit(split.train_set)
        md = MF(k=4, max_iter=5, dropout=0.5, seed=123).fit(split.train_set)
        assert np.isfinite(md.score(0)).all()

    def test_sbpr_no_bias(self, split):
        from cornac_tpu.data import GraphModality
        from cornac_tpu.eval_methods import RatioSplit
        from cornac_tpu.models import SBPR

        data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIR")
        users = sorted({u for u, _, _ in data})
        edges = [(users[i], users[(i + 1) % len(users)], 1.0) for i in range(len(users))]
        rs = RatioSplit(
            data=data, test_size=0.2, rating_threshold=3.0, seed=123,
            user_graph=GraphModality(data=edges),
        )
        m = SBPR(k=4, max_iter=3, use_bias=False, seed=123).fit(rs.train_set)
        assert not m.i_biases.any()  # bias frozen at zero

    def test_sansa_prefit_weights(self, split):
        import scipy.sparse as sp
        from cornac_tpu.models import SANSA

        fitted = SANSA(l2=10.0, weight_matrix_density=0.2, verbose=False).fit(
            split.train_set
        )
        W1, W2 = fitted.weights
        pre = SANSA(W1=W1, W2=W2, X=fitted.X, trainable=False, verbose=False)
        out = pre.forward(fitted.X[:2])
        ref = fitted.forward(fitted.X[:2])
        np.testing.assert_allclose(
            np.asarray(out.todense()), np.asarray(ref.todense()), rtol=1e-5
        )
