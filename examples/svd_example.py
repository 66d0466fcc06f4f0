"""SVD (biased MF trained on observed ratings) on MovieLens 100K.

Capability parity with reference ``examples/svd_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import SVD

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, seed=123, verbose=True)

ct.Experiment(
    eval_method=rs,
    models=[SVD(k=10, max_iter=30, learning_rate=0.01, lambda_reg=0.02, seed=123)],
    metrics=[MAE(), RMSE()],
).run()
