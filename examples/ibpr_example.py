"""Indexable BPR (angular embeddings) vs. OnlineIBPR on MovieLens 1M.

Capability parity with reference ``examples/ibpr_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import IBPR, OnlineIBPR

ml_1m = movielens.load_feedback(variant="1M")
rs = RatioSplit(data=ml_1m, test_size=0.2, rating_threshold=1.0, seed=123, verbose=True)

ct.Experiment(
    eval_method=rs,
    models=[
        IBPR(k=10, max_iter=50, seed=123, verbose=True),
        OnlineIBPR(k=10, max_iter=50, seed=123, verbose=True),
    ],
    metrics=[Precision(k=10), Recall(k=10), NDCG(k=10)],
).run()
