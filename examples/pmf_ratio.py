"""Probabilistic Matrix Factorization (PMF) with a RatioSplit.

Capability parity with reference ``examples/pmf_ratio.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE, Recall
from cornac_tpu.models import PMF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123)

pmf = PMF(k=10, max_iter=100, learning_rate=0.001, lambda_reg=0.001, seed=123)

ct.Experiment(
    eval_method=rs, models=[pmf], metrics=[MAE(), RMSE(), Recall(k=20)]
).run()
