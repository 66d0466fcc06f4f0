"""Spherical k-means based recommender on MovieLens 100K.

Capability parity with reference ``examples/skm_movielens.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import SKMeans

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, seed=123, verbose=True)

skm = SKMeans(k=5, max_iter=100, tol=1e-6, seed=123)

ct.Experiment(eval_method=rs, models=[skm], metrics=[MAE(), RMSE()]).run()
