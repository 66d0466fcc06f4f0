"""SANSA — sparse approximate inverse variant of EASE on MovieLens 100K.

Capability parity with reference ``examples/sansa_movielens.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, NDCG, Precision, Recall
from cornac_tpu.models import SANSA

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123, verbose=True)

ct.Experiment(
    eval_method=rs,
    models=[SANSA(l2=500.0, weight_matrix_density=0.01, verbose=True)],
    metrics=[AUC(), NDCG(k=10), Precision(k=10), Recall(k=10)],
).run()
