"""C2PF — collaborative-context Poisson factorization with item contexts
(edge-based CAVI on device) on Amazon Office.

Capability parity with reference ``examples/c2pf_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import GraphModality
from cornac_tpu.datasets import amazon_office
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import MAE, NDCG, Precision, Recall, RMSE
from cornac_tpu.models import C2PF

ratings = amazon_office.load_feedback()
contexts = amazon_office.load_graph()

rs = RatioSplit(
    data=ratings, test_size=0.2, rating_threshold=1.0,
    exclude_unknowns=True, verbose=True, seed=123,
    item_graph=GraphModality(data=contexts),
)

c2pf = C2PF(k=100, max_iter=80, variant="c2pf")

ct.Experiment(
    eval_method=rs, models=[c2pf],
    metrics=[MAE(), RMSE(), Precision(k=10), Recall(k=10), NDCG(k=10)],
).run()
