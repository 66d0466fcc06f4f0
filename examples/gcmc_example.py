"""GCMC — graph convolutional matrix completion (rating-typed edges) on
MovieLens 100K.

Capability parity with reference ``examples/gcmc_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import RMSE
from cornac_tpu.models import GCMC

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, exclude_unknowns=True, verbose=True, seed=123)

gcmc = GCMC(max_iter=1000, learning_rate=0.01, train_early_stopping_patience=100, verbose=True, seed=123)

ct.Experiment(eval_method=rs, models=[gcmc], metrics=[RMSE()]).run()
