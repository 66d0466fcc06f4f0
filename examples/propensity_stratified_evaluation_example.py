"""Propensity-stratified evaluation — debiased (IPS / per-stratum /
unbiased-aggregate) comparison of MF vs. MostPop on MovieLens 1M.

Capability parity with reference
``examples/propensity_stratified_evaluation_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import PropensityStratifiedEvaluation
from cornac_tpu.metrics import MAE, NDCG, Recall, RMSE
from cornac_tpu.models import MF, MostPop

ml_1m = movielens.load_feedback(variant="1M")

stra_eval_method = PropensityStratifiedEvaluation(
    data=ml_1m, n_strata=2, rating_threshold=4.0, verbose=True, seed=123,
)

ct.Experiment(
    eval_method=stra_eval_method,
    models=[
        MF(k=10, max_iter=40, learning_rate=0.01, lambda_reg=0.02, use_bias=True, seed=123),
        MostPop(),
    ],
    metrics=[MAE(), RMSE(), NDCG(k=10), Recall(k=10)],
).run()
