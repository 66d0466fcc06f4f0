"""Non-negative Matrix Factorization with multiplicative updates.

Capability parity with reference ``examples/nmf_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import NMF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123, verbose=True)

nmf = NMF(
    k=15, max_iter=50, learning_rate=0.005,
    lambda_u=0.06, lambda_v=0.06, lambda_bu=0.02, lambda_bi=0.02,
    use_bias=False, seed=123, verbose=True,
)

ct.Experiment(eval_method=rs, models=[nmf], metrics=[MAE(), RMSE()]).run()
