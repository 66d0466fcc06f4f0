"""Chronological evaluation: global TimestampSplit and per-user
StratifiedSplit on MovieLens 100K (UIRT)."""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import StratifiedSplit, TimestampSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import BPR

ml_100k = movielens.load_feedback(fmt="UIRT", variant="100K")

ts = TimestampSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123, verbose=True)
ss = StratifiedSplit(
    data=ml_100k, group_by="user", chrono=True,
    test_size=0.2, rating_threshold=4.0, seed=123, verbose=True,
)

for method in (ts, ss):
    ct.Experiment(
        eval_method=method,
        models=[BPR(k=10, max_iter=100, seed=123)],
        metrics=[NDCG(k=10), Recall(k=10)],
    ).run()
