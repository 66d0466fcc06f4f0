"""Biased Matrix Factorization (MF) with user/item biases on MovieLens 100K.

Capability parity with reference ``examples/biased_mf.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import MF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, verbose=True, seed=123)

mf = MF(
    k=10, max_iter=25, learning_rate=0.01, lambda_reg=0.02,
    use_bias=True, early_stop=True, verbose=True, seed=123,
)

ct.Experiment(eval_method=rs, models=[mf], metrics=[MAE(), RMSE()], user_based=True).run()
