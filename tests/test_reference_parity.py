"""Numerical parity against the reference implementation's own metric code.

Loads ``cornac/metrics/{ranking,rating}.py`` from the reference checkout by
file path (they are dependency-free pure Python) and compares this
framework's per-user ``compute`` and vectorized ``batch_compute`` against
them on randomized cases, including heavy score ties. Skipped when the
reference checkout is absent.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/cornac/metrics"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_ranking():
    return _load("_ref_ranking", os.path.join(REF_DIR, "ranking.py"))


@pytest.fixture(scope="module")
def ref_rating():
    return _load("_ref_rating", os.path.join(REF_DIR, "rating.py"))


def _random_case(rng, n_items, tie_grid=None):
    """One user's candidate set: scores, positives, negatives."""
    scores = rng.randn(n_items)
    if tie_grid:
        scores = np.round(scores * tie_grid) / tie_grid  # coarse grid -> ties
    n_pos = rng.randint(1, max(2, n_items // 4))
    pos = rng.choice(n_items, size=n_pos, replace=False)
    neg = np.setdiff1d(np.arange(n_items), pos)
    pd_rank = np.argsort(-scores, kind="stable")
    return scores, pos, neg, pd_rank


CASES = [(50, None), (50, 2), (7, None), (300, 4)]


class TestRankingParity:
    @pytest.mark.parametrize("n_items,tie_grid", CASES)
    def test_per_user_compute_matches_reference(self, ref_ranking, n_items, tie_grid):
        import cornac_tpu.metrics as M

        rng = np.random.RandomState(42)
        pairs = [
            (M.NDCG(k=5), ref_ranking.NDCG(k=5)),
            (M.NDCG(k=-1), ref_ranking.NDCG(k=-1)),
            (M.NCRR(k=5), ref_ranking.NCRR(k=5)),
            (M.HitRatio(k=5), ref_ranking.HitRatio(k=5)),
            (M.Precision(k=5), ref_ranking.Precision(k=5)),
            (M.Recall(k=5), ref_ranking.Recall(k=5)),
            (M.FMeasure(k=5), ref_ranking.FMeasure(k=5)),
            (M.MRR(), ref_ranking.MRR()),
            (M.AUC(), ref_ranking.AUC()),
            (M.MAP(), ref_ranking.MAP()),
        ]
        item_indices = np.arange(n_items)
        for trial in range(20):
            scores, pos, neg, pd_rank = _random_case(rng, n_items, tie_grid)
            for ours, ref in pairs:
                kwargs = dict(
                    item_indices=item_indices,
                    pd_scores=scores,
                    pd_rank=pd_rank,
                    gt_pos=pos,
                    gt_neg=neg,
                )
                np.testing.assert_allclose(
                    ours.compute(**kwargs),
                    ref.compute(**kwargs),
                    rtol=1e-10,
                    err_msg=f"{ours.name} trial {trial}",
                )

    @pytest.mark.parametrize("n_items,tie_grid", CASES)
    def test_batch_engine_matches_reference(self, ref_ranking, n_items, tie_grid):
        """The vectorized batch engine must agree with the reference's
        per-user code. Count-based metrics (AUC/MAP/Precision/Recall/Hit)
        are tie-exact; order-based ones (NDCG/NCRR/MRR) agree whenever the
        positive set's tie structure doesn't straddle the cutoff, so for
        them ties are compared through the same stable ordering."""
        from cornac_tpu.metrics import RankingContext
        import cornac_tpu.metrics as M

        rng = np.random.RandomState(7)
        B = 16
        item_indices = np.arange(n_items)

        cases = [_random_case(rng, n_items, tie_grid) for _ in range(B)]
        scores = np.stack([c[0] for c in cases])
        pos_mask = np.zeros((B, n_items), bool)
        for b, (_, pos, _, _) in enumerate(cases):
            pos_mask[b, pos] = True
        cand = np.ones((B, n_items), bool)
        ctx = RankingContext(scores, pos_mask, cand)

        tie_exact = [
            (M.AUC(), ref_ranking.AUC()),
            (M.MAP(), ref_ranking.MAP()),
            (M.Precision(k=5), ref_ranking.Precision(k=5)),
            (M.Recall(k=5), ref_ranking.Recall(k=5)),
            (M.HitRatio(k=5), ref_ranking.HitRatio(k=5)),
            (M.FMeasure(k=5), ref_ranking.FMeasure(k=5)),
        ]
        order_based = [
            (M.NDCG(k=5), ref_ranking.NDCG(k=5)),
            (M.NCRR(k=5), ref_ranking.NCRR(k=5)),
            (M.MRR(), ref_ranking.MRR()),
        ]
        for ours, ref in tie_exact + order_based:
            batch_vals = ours.batch_compute(ctx)
            for b, (s, pos, neg, pd_rank) in enumerate(cases):
                ref_val = ref.compute(
                    item_indices=item_indices,
                    pd_scores=s,
                    pd_rank=pd_rank,
                    gt_pos=pos,
                    gt_neg=neg,
                )
                np.testing.assert_allclose(
                    batch_vals[b], ref_val, rtol=1e-10,
                    err_msg=f"{ours.name} row {b}",
                )


class TestRatingParity:
    def test_rating_metrics_match_reference(self, ref_rating):
        import cornac_tpu.metrics as M

        rng = np.random.RandomState(3)
        gt = rng.uniform(1, 5, 500)
        pd = gt + rng.randn(500) * 0.7
        w = rng.rand(500)
        for ours, ref in [
            (M.MAE(), ref_rating.MAE()),
            (M.MSE(), ref_rating.MSE()),
            (M.RMSE(), ref_rating.RMSE()),
        ]:
            np.testing.assert_allclose(
                ours.compute(gt, pd), ref.compute(gt, pd), rtol=1e-12
            )
            np.testing.assert_allclose(
                ours.compute(gt, pd, weights=w),
                ref.compute(gt, pd, weights=w),
                rtol=1e-12,
            )
