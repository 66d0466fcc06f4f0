"""Metric tests: closed-form expectations for the per-user path, and
vectorized batch_compute vs per-user compute consistency on random data —
the parity guarantee the batched eval harness rests on."""

import numpy as np
import pytest

from cornac_tpu.metrics import (
    AUC,
    MAE,
    MAP,
    MRR,
    MSE,
    NCRR,
    NDCG,
    FMeasure,
    HitRatio,
    Precision,
    RankingContext,
    Recall,
    RMSE,
)


class TestRatingMetrics:
    def test_mae(self):
        assert MAE().compute(np.asarray([1.0, 2.0]), np.asarray([1.0, 3.0])) == 0.5

    def test_mse(self):
        assert MSE().compute(np.asarray([1.0, 2.0]), np.asarray([1.0, 4.0])) == 2.0

    def test_rmse(self):
        assert RMSE().compute(np.asarray([0.0, 0.0]), np.asarray([3.0, 4.0])) == pytest.approx(
            np.sqrt(12.5)
        )

    def test_names(self):
        assert MAE().name == "MAE" and MSE().name == "MSE" and RMSE().name == "RMSE"


class TestRankingClosedForm:
    def test_ndcg_perfect(self):
        gt_pos = np.array([0, 1])
        pd_rank = np.array([0, 1, 2, 3])
        assert NDCG(k=2).compute(gt_pos=gt_pos, pd_rank=pd_rank) == pytest.approx(1.0)

    def test_ndcg_partial(self):
        gt_pos = np.array([2])
        pd_rank = np.array([0, 1, 2])
        expected = (1 / np.log2(4)) / (1 / np.log2(2))
        assert NDCG(k=3).compute(gt_pos=gt_pos, pd_rank=pd_rank) == pytest.approx(expected)

    def test_precision_recall_f1(self):
        gt_pos = np.array([0, 2])
        pd_rank = np.array([0, 1, 2, 3])
        assert Precision(k=2).compute(gt_pos=gt_pos, pd_rank=pd_rank) == 0.5
        assert Recall(k=2).compute(gt_pos=gt_pos, pd_rank=pd_rank) == 0.5
        assert FMeasure(k=2).compute(gt_pos=gt_pos, pd_rank=pd_rank) == 0.5

    def test_hit_ratio(self):
        assert HitRatio(k=1).compute(gt_pos=np.array([5]), pd_rank=np.array([5, 1])) == 1.0
        assert HitRatio(k=1).compute(gt_pos=np.array([1]), pd_rank=np.array([5, 1])) == 0.0

    def test_mrr(self):
        assert MRR().compute(gt_pos=np.array([3]), pd_rank=np.array([1, 2, 3])) == pytest.approx(
            1 / 3
        )
        with pytest.raises(ValueError):
            MRR().compute(gt_pos=np.array([9]), pd_rank=np.array([1, 2]))

    def test_auc(self):
        item_indices = np.arange(4)
        pd_scores = np.array([4.0, 3.0, 2.0, 1.0])
        gt_pos = np.array([0])
        assert AUC().compute(
            item_indices=item_indices, pd_scores=pd_scores, gt_pos=gt_pos
        ) == pytest.approx(1.0)
        gt_pos = np.array([3])
        assert AUC().compute(
            item_indices=item_indices, pd_scores=pd_scores, gt_pos=gt_pos
        ) == pytest.approx(0.0)

    def test_map(self):
        item_indices = np.arange(3)
        pd_scores = np.array([3.0, 2.0, 1.0])
        gt_pos = np.array([0, 2])
        # AP = mean(1/1, 2/3)
        assert MAP().compute(
            item_indices=item_indices, pd_scores=pd_scores, gt_pos=gt_pos
        ) == pytest.approx((1.0 + 2.0 / 3.0) / 2)


def _random_case(rng, n_items=50):
    """Random candidate/positive structure + tie-free scores."""
    scores = rng.permutation(n_items).astype(np.float64)  # unique -> no ties
    cand = rng.rand(n_items) < 0.8
    cand[rng.randint(n_items)] = True
    pos = cand & (rng.rand(n_items) < 0.3)
    if not pos.any():
        pos[np.flatnonzero(cand)[0]] = True
    return scores, pos, cand


METRICS = [
    NDCG(k=5),
    NDCG(k=-1),
    NCRR(k=5),
    NCRR(k=-1),
    MRR(),
    HitRatio(k=5),
    Precision(k=5),
    Recall(k=5),
    FMeasure(k=5),
    AUC(),
    MAP(),
]


class TestBatchVsPerUser:
    """batch_compute must reproduce per-user compute (reference semantics)
    on tie-free inputs."""

    @pytest.mark.parametrize("metric", METRICS, ids=lambda m: m.name)
    def test_consistency(self, metric):
        rng = np.random.RandomState(0)
        B, N = 40, 50
        rows = [_random_case(rng, N) for _ in range(B)]
        scores = np.stack([r[0] for r in rows])
        pos_mask = np.stack([r[1] for r in rows])
        cand_mask = np.stack([r[2] for r in rows])

        masked = np.where(cand_mask, scores, -np.inf)
        ctx = RankingContext(masked, pos_mask, cand_mask)
        batch_vals = metric.batch_compute(ctx)

        for b in range(B):
            item_indices = np.flatnonzero(cand_mask[b])
            gt_pos = np.flatnonzero(pos_mask[b])
            gt_neg = np.flatnonzero(cand_mask[b] & ~pos_mask[b])
            item_scores = scores[b][item_indices]
            order = item_indices[np.argsort(-item_scores, kind="stable")]
            expected = metric.compute(
                gt_pos=gt_pos,
                gt_neg=gt_neg,
                pd_rank=order,
                pd_scores=item_scores,
                item_indices=item_indices,
            )
            assert batch_vals[b] == pytest.approx(expected, abs=1e-10), (
                f"{metric.name} row {b}"
            )

    def test_auc_with_ties_exact(self):
        """Count-based metrics stay exact under tied scores."""
        rng = np.random.RandomState(1)
        B, N = 20, 30
        scores = rng.randint(0, 5, size=(B, N)).astype(np.float64)  # many ties
        cand_mask = np.ones((B, N), dtype=bool)
        pos_mask = rng.rand(B, N) < 0.3
        pos_mask[:, 0] = True

        ctx = RankingContext(scores, pos_mask, cand_mask)
        for metric in [AUC(), MAP()]:
            batch_vals = metric.batch_compute(ctx)
            for b in range(B):
                expected = metric.compute(
                    item_indices=np.arange(N),
                    pd_scores=scores[b],
                    gt_pos=np.flatnonzero(pos_mask[b]),
                    gt_neg=np.flatnonzero(~pos_mask[b]),
                )
                assert batch_vals[b] == pytest.approx(expected, abs=1e-10)


class TestTinyCatalogTruncation:
    """k larger than the catalog must not inflate @k metrics (regression:
    the non-positive sentinel rank used to be N, which passes ``rank < k``
    whenever k > N)."""

    def _ctx(self):
        from cornac_tpu.metrics import RankingContext

        scores = np.array([[0.2, 0.8], [0.9, 0.1]])
        pos = np.array([[True, False], [True, False]])
        cand = np.ones((2, 2), bool)
        return RankingContext(scores, pos, cand)

    def test_ndcg_k_gt_catalog(self):
        from cornac_tpu.metrics import NDCG

        vals = NDCG(k=10).batch_compute(self._ctx())
        # row0 target ranked 2nd -> 1/log2(3); row1 target ranked 1st -> 1
        np.testing.assert_allclose(vals, [1.0 / np.log2(3.0), 1.0], rtol=1e-12)

    def test_measures_k_gt_catalog(self):
        from cornac_tpu.metrics import NCRR, HitRatio, Precision, Recall

        ctx = self._ctx()
        np.testing.assert_allclose(Recall(k=10).batch_compute(ctx), [1.0, 1.0])
        # reference Precision@k divides by k even when k > catalog
        np.testing.assert_allclose(Precision(k=10).batch_compute(ctx), [0.1, 0.1])
        np.testing.assert_allclose(HitRatio(k=10).batch_compute(ctx), [1.0, 1.0])
        np.testing.assert_allclose(NCRR(k=10).batch_compute(ctx), [0.5, 1.0])

    def test_batch_matches_per_user_reference_form(self):
        from cornac_tpu.metrics import NDCG

        rng = np.random.RandomState(3)
        scores = rng.randn(8, 5)
        pos = np.zeros((8, 5), bool)
        pos[np.arange(8), rng.randint(0, 5, 8)] = True
        from cornac_tpu.metrics import RankingContext

        ctx = RankingContext(scores, pos, np.ones_like(pos))
        m = NDCG(k=10)
        batch = m.batch_compute(ctx)
        for b in range(8):
            pd_rank = np.argsort(-scores[b], kind="stable")
            oracle = m.compute(gt_pos=np.flatnonzero(pos[b]), pd_rank=pd_rank)
            np.testing.assert_allclose(batch[b], oracle, rtol=1e-12)


def test_device_rank_path_matches_host(monkeypatch):
    """The device rank/tie computation must agree with the numpy path,
    including under ties."""
    import cornac_tpu.metrics.ranking as R

    rng = np.random.RandomState(9)
    scores = np.round(rng.randn(64, 200), 1)  # coarse grid -> many ties
    pos = rng.rand(64, 200) < 0.05
    pos[:, 0] = True  # every row has a positive
    cand = rng.rand(64, 200) < 0.9
    cand |= pos
    scores = np.where(cand, scores, -np.inf)

    from cornac_tpu.metrics import AUC, MAP, NDCG, RankingContext, Recall

    host = RankingContext(scores, pos, cand)
    monkeypatch.setattr(R, "_DEVICE_MIN_CELLS", 1)
    dev = RankingContext(scores, pos, cand)
    assert dev._try_device_path()  # device path must actually engage

    for m in (AUC(), MAP(), NDCG(k=10), Recall(k=10)):
        np.testing.assert_allclose(
            m.batch_compute(dev), m.batch_compute(host), rtol=1e-6, atol=1e-9
        )
    np.testing.assert_array_equal(dev.rank_of, host.rank_of)
    np.testing.assert_array_equal(dev.c_lt, host.c_lt)
    np.testing.assert_array_equal(dev.p_lt, host.p_lt)


def test_fused_device_engine_matches_host():
    """The single-program fused metric kernel must agree with the host
    batch engine for every supported metric kind, including under ties
    and with k larger than the catalog."""
    from cornac_tpu.metrics import (
        AUC, FMeasure, HitRatio, MAP, MRR, NCRR, NDCG, Precision,
        RankingContext, Recall,
    )
    from cornac_tpu.metrics.ranking import batch_eval_device, metric_device_specs

    rng = np.random.RandomState(11)
    scores = np.round(rng.randn(48, 150), 1).astype(np.float32)  # many ties
    pos = rng.rand(48, 150) < 0.06
    pos[:, 3] = True  # every row has a positive
    cand = rng.rand(48, 150) < 0.9
    cand |= pos

    metrics = [
        NDCG(k=10), NDCG(k=-1), NDCG(k=500), NCRR(k=10), MRR(),
        HitRatio(k=10), Precision(k=10), Recall(k=10), FMeasure(k=10),
        AUC(), MAP(),
    ]
    specs = metric_device_specs(metrics)
    assert specs is not None
    fused = batch_eval_device(scores, pos, cand, specs)

    host_scores = np.where(cand, scores.astype(np.float64), -np.inf)
    ctx = RankingContext(host_scores, pos, cand)
    for i, m in enumerate(metrics):
        np.testing.assert_allclose(
            fused[:, i], m.batch_compute(ctx), rtol=1e-5, atol=1e-6,
            err_msg=m.name,
        )


def test_fused_device_engine_beyond_old_item_gate():
    """r5 removed the flat catalog gate entirely (the eval loop shrinks its
    user batch to keep B*N cells bounded; only the f32 count-exactness
    limit of 2^24 items remains). The kernel must stay exact vs the host
    engine past every historical boundary — this runs past the r4 200k
    gate."""
    from cornac_tpu.metrics import AUC, MAP, NDCG, RankingContext, Recall
    from cornac_tpu.metrics.ranking import (
        _FUSED_MAX_ITEMS, batch_eval_device, metric_device_specs,
    )

    assert _FUSED_MAX_ITEMS >= 1 << 24
    rng = np.random.RandomState(12)
    N = 250_000  # past the r4 gate
    scores = rng.randn(4, N).astype(np.float32)
    pos = np.zeros((4, N), bool)
    for b in range(4):
        pos[b, rng.choice(N, size=30, replace=False)] = True
    cand = np.ones((4, N), bool)
    cand[:, ::97] = False
    cand |= pos

    metrics = [AUC(), MAP(), NDCG(k=10), Recall(k=20)]
    fused = batch_eval_device(
        scores, pos, cand, metric_device_specs(metrics)
    )
    ctx = RankingContext(
        np.where(cand, scores.astype(np.float64), -np.inf), pos, cand
    )
    for i, m in enumerate(metrics):
        np.testing.assert_allclose(
            fused[:, i], m.batch_compute(ctx), rtol=1e-5, atol=1e-6,
            err_msg=m.name,
        )


def test_fused_specs_reject_unsupported():
    from cornac_tpu.metrics import NDCG, RankingMetric
    from cornac_tpu.metrics.ranking import metric_device_specs

    class Custom(NDCG):  # overridden semantics must not silently fuse
        pass

    assert metric_device_specs([NDCG(k=3), Custom(k=3)]) is None
    assert metric_device_specs([NDCG(k=[1, 2])]) is None
    assert metric_device_specs([RankingMetric(name="x")]) is None
