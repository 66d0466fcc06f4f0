"""MCF — matrix co-factorization of ratings and the item "also-viewed"
network on Amazon Office.

Capability parity with reference ``examples/mcf_office.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import GraphModality
from cornac_tpu.datasets import amazon_office
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, NDCG, Precision, Recall, RMSE
from cornac_tpu.models import MCF

ratings = amazon_office.load_feedback()
contexts = amazon_office.load_graph()

rs = RatioSplit(
    data=ratings, test_size=0.2, rating_threshold=1.0,
    exclude_unknowns=True, verbose=True, seed=123,
    item_graph=GraphModality(data=contexts),
)

mcf = MCF(k=10, max_iter=40, learning_rate=0.001, verbose=True, seed=123)

ct.Experiment(
    eval_method=rs, models=[mcf],
    metrics=[MAE(), RMSE(), Precision(k=10), Recall(k=10), NDCG(k=10)],
).run()
