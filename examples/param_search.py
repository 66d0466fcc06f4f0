"""Hyperparameter search (GridSearch / RandomSearch) wrapped around BPR —
searches compose with Experiment because they are Recommenders themselves.

Capability parity with reference ``examples/param_search.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.hyperopt import Continuous, Discrete, GridSearch, RandomSearch
from cornac_tpu.metrics import AUC, Recall
from cornac_tpu.models import BPR

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(
    data=ml_100k, test_size=0.1, val_size=0.1, rating_threshold=4.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

recall100 = Recall(k=100)
bpr = BPR(k=50, max_iter=200, lambda_reg=0.001, seed=123)

gs_bpr = GridSearch(
    model=bpr,
    space=[
        Discrete("k", [5, 10, 50]),
        Discrete("learning_rate", [0.001, 0.05, 0.01, 0.1]),
    ],
    metric=recall100,
    eval_method=rs,
)

rnd_bpr = RandomSearch(
    model=bpr,
    space=[
        Discrete("k", [5, 10, 50]),
        Continuous("learning_rate", low=0.001, high=0.01),
    ],
    metric=recall100,
    eval_method=rs,
    n_trails=20,
)

ct.Experiment(
    eval_method=rs,
    models=[gs_bpr, rnd_bpr],
    metrics=[AUC(), recall100],
    user_based=False,
).run()

print("GridSearch best:", gs_bpr.best_params)
print("RandomSearch best:", rnd_bpr.best_params)
