"""Weighted Matrix Factorization (batched ALS on the MXU) on CiteULike.

Capability parity with reference ``examples/wmf_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import citeulike
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import WMF

_, item_ids = citeulike.load_text()
data = citeulike.load_feedback(reader=None)

rs = RatioSplit(
    data=data, test_size=0.2, rating_threshold=0.5,
    exclude_unknowns=True, verbose=True, seed=123,
)

wmf = WMF(k=50, max_iter=30, a=1.0, b=0.01, lambda_u=0.01, lambda_v=0.01, seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[wmf], metrics=[NDCG(k=100), Recall(k=300)]).run()
