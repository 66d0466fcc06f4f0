"""Maximum Margin Matrix Factorization (hinge ranking loss) on MovieLens.

Capability parity with reference ``examples/mmmf_exp.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import MMMF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123)

mmmf = MMMF(k=10, max_iter=200, learning_rate=0.001, verbose=True, seed=123)

ct.Experiment(
    eval_method=rs, models=[mmmf], metrics=[NDCG(k=10), Precision(k=10), Recall(k=10)]
).run()
