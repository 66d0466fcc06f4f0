"""BPR vs. MostPop on the Netflix (small) dataset.

Capability parity with reference ``examples/bpr_netflix.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import netflix
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, MAP, NDCG, Precision, Recall
from cornac_tpu.models import BPR, MostPop

nf = netflix.load_feedback(variant="small")
rs = RatioSplit(
    data=nf, test_size=0.1, rating_threshold=1.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

ct.Experiment(
    eval_method=rs,
    models=[
        MostPop(),
        BPR(k=10, max_iter=100, learning_rate=0.001, lambda_reg=0.01, seed=123),
    ],
    metrics=[AUC(), MAP(), NDCG(k=10), Precision(k=10), Recall(k=10)],
).run()
