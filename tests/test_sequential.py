"""Sequential subsystem: NextItemEvaluation protocol + SPop/FPMC/GRU4Rec/
SASRec end-to-end."""

import os

import numpy as np
import pytest

from cornac_tpu import Experiment
from cornac_tpu.data import Reader
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, NDCG, HitRatio, Recall
from cornac_tpu.models import FPMC, GRU4Rec, SASRec, SPop

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _seq_data():
    return Reader().read(os.path.join(DATA_DIR, "sequence.txt"), fmt="USIT")


@pytest.fixture(scope="module")
def nie():
    data = _seq_data()
    # split sessions: first 80% train by session order
    sids = sorted({t[1] for t in data})
    cut = sids[int(len(sids) * 0.7)]
    train = [t for t in data if t[1] <= cut]
    test = [t for t in data if t[1] > cut]
    return NextItemEvaluation.from_splits(
        train_data=train, test_data=test, fmt="USIT", exclude_unknowns=True,
        seed=123, mode="next",
    )


SEQ_MODELS = [
    lambda: SPop(),
    lambda: SPop(use_session_popularity=False),
    lambda: FPMC(embedding_dim=8, n_epochs=3, seed=123),
    lambda: GRU4Rec(layers=[8], n_epochs=2, batch_size=8, max_len=10, seed=123),
    lambda: GRU4Rec(layers=[8], loss="bpr-max", n_epochs=2, batch_size=8, max_len=10, n_sample=16, seed=123),
    lambda: GRU4Rec(layers=[8], loss="top1", n_epochs=2, batch_size=8, max_len=10, n_sample=16, seed=123),
    lambda: SASRec(embedding_dim=8, n_layers=1, max_len=10, n_epochs=2, batch_size=8, seed=123),
]


@pytest.mark.parametrize("make_model", SEQ_MODELS, ids=lambda f: type(f()).__name__)
def test_next_item_flow(nie, make_model):
    model = make_model()
    result, _ = nie.evaluate(
        model, [NDCG(k=5), HitRatio(k=5), Recall(k=5), MRR()], user_based=False
    )
    for name, value in result.metric_avg_results.items():
        assert np.isfinite(value), name


def test_mode_validation():
    with pytest.raises(ValueError):
        NextItemEvaluation(mode="bogus")


def test_from_timestamps():
    data = _seq_data()
    ts = sorted(t[3] for t in data)
    cutoff = ts[int(len(ts) * 0.8)]
    nie = NextItemEvaluation.from_timestamps(
        data, test_timestamp=cutoff, fmt="USIT", seed=1
    )
    assert nie.train_set is not None and nie.test_set is not None
    # sessions are atomic: no session index appears in both sets
    assert not (
        set(nie.train_set.session_indices) & set(nie.test_set.session_indices)
    )


def test_leave_last_out():
    data = Reader().read(os.path.join(DATA_DIR, "rating.txt"), fmt="UIRT")
    nie = NextItemEvaluation.leave_last_out(data, seed=1)
    assert nie.train_set is not None
    assert nie.val_set is not None
    result, _ = nie.evaluate(SPop(), [HitRatio(k=5)], user_based=False)
    assert np.isfinite(result.metric_avg_results["HitRatio@5"])


def test_experiment_integration(nie, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    exp = Experiment(
        eval_method=nie,
        models=[SPop(), FPMC(embedding_dim=8, n_epochs=2, seed=1)],
        metrics=[NDCG(k=5), HitRatio(k=5)],
    )
    exp.run()
    assert len(exp.result) == 2


def test_gru4rec_learns_repetitive_pattern():
    """On strongly patterned sessions the GRU must beat popularity."""
    rng = np.random.RandomState(0)
    data = []
    sid = 0
    # pattern: item i is always followed by item (i+1) % 12
    for _ in range(60):
        sid += 1
        start = rng.randint(12)
        t0 = 1000 * sid
        for j in range(5):
            data.append((f"u{sid % 7}", f"s{sid}", f"i{(start + j) % 12}", t0 + j))
    sids = sorted({t[1] for t in data}, key=lambda s: int(s[1:]))
    cut = int(len(sids) * 0.8)
    train = [t for t in data if int(t[1][1:]) <= cut]
    test = [t for t in data if int(t[1][1:]) > cut]
    nie = NextItemEvaluation.from_splits(
        train_data=train, test_data=test, fmt="USIT", seed=7, mode="next"
    )
    gru = GRU4Rec(layers=[16], n_epochs=60, batch_size=16, max_len=6, learning_rate=0.1, seed=7)
    res, _ = nie.evaluate(gru, [HitRatio(k=1)], user_based=False)
    assert res.metric_avg_results["HitRatio@1"] > 0.5  # chance = 1/12


@pytest.mark.parametrize(
    "make_model",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["BERT4Rec"]).BERT4Rec(
            embedding_dim=8, n_layers=1, n_heads=2, max_len=10, n_epochs=2,
            batch_size=8, seed=1,
        ),
        lambda: __import__("cornac_tpu.models", fromlist=["TransformerRec"]).TransformerRec(
            backbone="gpt2", objective="clm", embedding_dim=8, n_layers=1,
            n_heads=2, max_len=10, n_epochs=2, batch_size=8, seed=1,
        ),
    ],
    ids=["BERT4Rec", "TransformerRec-gpt2-clm"],
)
def test_transformer_rec(nie, make_model):
    model = make_model()
    result, _ = nie.evaluate(model, [HitRatio(k=5), NDCG(k=5)], user_based=False)
    for name, value in result.metric_avg_results.items():
        assert np.isfinite(value), name


def test_transformer_rec_validation():
    from cornac_tpu.models import TransformerRec

    with pytest.raises(ValueError):
        TransformerRec(backbone="nope")
    with pytest.raises(ValueError):
        TransformerRec(objective="cloze")
    with pytest.raises(ValueError):
        TransformerRec(loss_at="first")
    with pytest.raises(ValueError):
        TransformerRec(loss="hinge")
    with pytest.raises(ValueError):
        TransformerRec(objective="mlm", backbone="gpt2")
    # every reference backbone/objective combination constructs
    TransformerRec(backbone="xlnet", objective="plm")
    TransformerRec(backbone="electra", objective="rtd")
    assert TransformerRec(objective="clm").backbone == "gpt2"


class TestTIGER:
    def _nie(self):
        from cornac_tpu.data import FeatureModality

        data = _seq_data()
        rng = np.random.RandomState(5)
        iids = sorted({t[2] for t in data})
        feats = rng.rand(len(iids), 12).astype(np.float32)
        sids = sorted({t[1] for t in data})
        cut = sids[int(len(sids) * 0.7)]
        train = [t for t in data if t[1] <= cut]
        test = [t for t in data if t[1] > cut]
        return NextItemEvaluation.from_splits(
            train_data=train, test_data=test, fmt="USIT", exclude_unknowns=True,
            seed=123, mode="last",
            item_feature=__import__("cornac_tpu.data", fromlist=["FeatureModality"]).FeatureModality(
                features=feats, ids=iids
            ),
        )

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(tokenizer="rkmeans", scoring="exact"),
            dict(tokenizer="rqvae", scoring="beam", rqvae_n_epochs=3),
        ],
        ids=["rkmeans-exact", "rqvae-beam"],
    )
    def test_tiger(self, kwargs):
        from cornac_tpu.models import TIGER

        nie = self._nie()
        m = TIGER(
            rqvae_latent_dim=8, rqvae_hidden_dims=(16,), rqvae_num_levels=2,
            rqvae_codebook_size=8, d_model=16, d_ff=32, num_heads=2, d_kv=8,
            num_enc_layers=1, num_dec_layers=1, max_len=6, n_epochs=2,
            batch_size=8, n_beams=8, seed=123, verbose=False, **kwargs,
        )
        result, _ = nie.evaluate(m, [HitRatio(k=5), NDCG(k=5)], user_based=False)
        for name, value in result.metric_avg_results.items():
            assert np.isfinite(value), name
        row = m.score(None, [0, 1, 2])
        assert row.shape[0] == m.total_items
        # semantic ids: every item has a unique (codes + dedup) tuple
        assert len(m.sid_to_item) == m.total_items

    def test_tiger_validation(self):
        from cornac_tpu.models import TIGER

        with pytest.raises(ValueError):
            TIGER(scoring="nope")
        with pytest.raises(ValueError):
            TIGER(tokenizer="nope")
        with pytest.raises(ValueError):
            TIGER(lr_schedule="nope")

    def test_tiger_requires_features(self):
        from cornac_tpu.models import TIGER

        data = _seq_data()
        sids = sorted({t[1] for t in data})
        cut = sids[int(len(sids) * 0.7)]
        nie = NextItemEvaluation.from_splits(
            train_data=[t for t in data if t[1] <= cut],
            test_data=[t for t in data if t[1] > cut],
            fmt="USIT", seed=1,
        )
        with pytest.raises(ValueError):
            nie.evaluate(
                TIGER(rqvae_num_levels=2, rqvae_codebook_size=8, n_epochs=1),
                [HitRatio(k=5)], user_based=False,
            )

    def test_tiger_configs(self):
        from cornac_tpu.models import (
            GRID_CONFIG, PAISCHER_CONFIG, PAISCHER_SPORTS_CONFIG,
            PAISCHER_TOYS_CONFIG, TIGER,
        )

        for cfg in (GRID_CONFIG, PAISCHER_CONFIG, PAISCHER_SPORTS_CONFIG,
                    PAISCHER_TOYS_CONFIG):
            m = TIGER(**{**cfg, "seed": 1})
            assert m.tokenizer in ("rqvae", "rkmeans")


def _nie_splits(seed=7):
    rng = np.random.RandomState(seed)

    def gen(n, sid0):
        rows = []
        for s in range(n):
            start = rng.randint(0, 30)
            items = [(start + j) % 40 for j in range(rng.randint(3, 8))]
            u = f"u{rng.randint(40)}"
            for t, it in enumerate(items):
                rows.append((u, f"s{sid0 + s}", f"i{it}", t))
        return rows

    return NextItemEvaluation.from_splits(
        train_data=gen(200, 0),
        test_data=gen(40, 2000),
        val_data=gen(30, 1000),
        fmt="USIT",
        exclude_unknowns=True,
        seed=42,
    )


class TestSeqReferenceSurface:
    """The reference's sequential-family training knobs all run end-to-end:
    loss family, sampled negatives, dropout, momentum, tied embeddings,
    transformer objectives, best-on-val selection."""

    def test_gru4rec_losses_and_selection(self):
        from cornac_tpu.models import GRU4Rec

        ev = _nie_splits()
        for kwargs in [
            dict(loss="bpr", logq=0.0),
            dict(loss="bpr-max", layers=[16, 8]),
            dict(loss="top1", constrained_embedding=False, embedding=12),
            dict(loss="bce", dropout_p_embed=0.2, dropout_p_hidden=0.2, momentum=0.3),
            dict(loss="cross-entropy", logq=1.0, model_selection="best", val_eval_every=1),
        ]:
            m = GRU4Rec(n_epochs=2, batch_size=32, n_sample=16, max_len=8, seed=1, **kwargs)
            res = ev.evaluate(m, [Recall(k=5)], user_based=False)[0]
            assert np.isfinite(res.metric_avg_results["Recall@5"])

    def test_sasrec_surface(self):
        from cornac_tpu.models import SASRec

        ev = _nie_splits()
        for kwargs in [
            dict(loss="ce", use_biases=True, dropout=0.2),
            dict(loss="bpr-max", use_pos_emb=False, model_selection="best", val_eval_every=1),
        ]:
            m = SASRec(
                embedding_dim=16, num_blocks=1, n_epochs=2, batch_size=32,
                n_sample=16, max_len=8, seed=1, **kwargs,
            )
            res = ev.evaluate(m, [Recall(k=5)], user_based=False)[0]
            assert np.isfinite(res.metric_avg_results["Recall@5"])

    def test_transformer_objectives(self):
        from cornac_tpu.models import TransformerRec

        ev = _nie_splits()
        common = dict(
            embedding_dim=16, num_blocks=1, num_heads=2, n_sample=16,
            n_epochs=2, batch_size=32, max_len=8, seed=1,
        )
        for kwargs in [
            dict(objective="clm", loss_at="last"),
            dict(objective="rtd", rtd_lambda=0.5),
            dict(objective="plm", backbone="xlnet"),
        ]:
            m = TransformerRec(**common, **kwargs)
            res = ev.evaluate(m, [Recall(k=5)], user_based=False)[0]
            assert np.isfinite(res.metric_avg_results["Recall@5"])

    def test_fpmc_loss_family(self):
        from cornac_tpu.models import FPMC

        ev = _nie_splits()
        for kwargs in [
            dict(loss="ce"),
            dict(loss="bpr-max", momentum=0.2),
            dict(loss="top1", model_selection="best", val_eval_every=1),
        ]:
            m = FPMC(embedding_dim=8, n_epochs=2, batch_size=32, n_sample=16, seed=1, **kwargs)
            res = ev.evaluate(m, [Recall(k=5)], user_based=False)[0]
            assert np.isfinite(res.metric_avg_results["Recall@5"])


def test_seq_models_save_load_clone(tmp_path):
    """Pickle round-trip and clone() for the upgraded sequential models
    (params are jax arrays; loaded scores must match exactly)."""
    from cornac_tpu.models import Recommender, TransformerRec

    rng = np.random.RandomState(7)
    rows = []
    for s in range(80):
        items = [(rng.randint(0, 20) + j) % 25 for j in range(4)]
        for t, it in enumerate(items):
            rows.append((f"u{rng.randint(20)}", f"s{s}", f"i{it}", t))
    ev = NextItemEvaluation.from_splits(
        train_data=rows, test_data=rows[-60:], fmt="USIT", seed=1
    )

    for m in [
        GRU4Rec(layers=[8], n_epochs=1, batch_size=16, n_sample=8, max_len=6, seed=1),
        SASRec(
            embedding_dim=8, num_blocks=1, n_epochs=1, batch_size=16,
            n_sample=8, max_len=6, seed=1,
        ),
        TransformerRec(
            objective="rtd", embedding_dim=8, num_blocks=1, num_heads=2,
            n_epochs=1, batch_size=16, n_sample=8, max_len=6, seed=1,
        ),
    ]:
        m.fit(ev.train_set)
        before = m.score(0, [1, 2])
        m.save(str(tmp_path))
        loaded = Recommender.load(str(tmp_path / m.name))
        np.testing.assert_allclose(
            np.asarray(before), np.asarray(loaded.score(0, [1, 2])), rtol=1e-6
        )
        assert type(m.clone()) is type(m)
