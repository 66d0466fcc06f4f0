"""PCRL — Poisson factorization + deep collaborative representation
learning with item contexts, on Amazon Office.

Capability parity with reference ``examples/pcrl_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.data import GraphModality
from cornac_tpu.datasets import amazon_office
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import PCRL

ratings = amazon_office.load_feedback()
contexts = amazon_office.load_graph()

rs = RatioSplit(
    data=ratings, test_size=0.2, rating_threshold=1.0,
    exclude_unknowns=True, verbose=True, seed=123,
    item_graph=GraphModality(data=contexts),
)

# demo-sized epoch budget; the reference example's setting is max_iter=300
pcrl = PCRL(k=100, z_dims=[300], max_iter=60, batch_size=300, learning_rate=0.001, seed=123)

ct.Experiment(
    eval_method=rs, models=[pcrl],
    metrics=[Precision(k=10), Recall(k=10), NDCG(k=10)],
).run()
