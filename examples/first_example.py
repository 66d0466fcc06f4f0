"""Your very first example with cornac_tpu: MF vs. BPR on MovieLens 100K.

Capability parity with reference ``examples/first_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, AUC, NDCG, Precision, Recall, RMSE
from cornac_tpu.models import BPR, MF

# Load user-item ratings and split them 80/20 under a fixed seed.
ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123)

# Compare a rating model against a ranking model on the same split.
ct.Experiment(
    eval_method=rs,
    models=[
        MF(k=10, max_iter=25, learning_rate=0.01, lambda_reg=0.02, use_bias=True, seed=123),
        BPR(k=10, max_iter=200, learning_rate=0.001, lambda_reg=0.01, seed=123),
    ],
    metrics=[MAE(), RMSE(), AUC(), NDCG(k=10), Precision(k=10), Recall(k=10)],
    user_based=True,
).run()
