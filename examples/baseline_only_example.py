"""BaselineOnly (global mean + user/item biases) — the sanity floor every
factor model should beat.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, RMSE
from cornac_tpu.models import BaselineOnly, GlobalAvg

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, seed=123)

ct.Experiment(
    eval_method=rs,
    models=[GlobalAvg(), BaselineOnly(max_iter=20, learning_rate=0.01, seed=123)],
    metrics=[MAE(), RMSE()],
).run()
