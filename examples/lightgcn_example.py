"""LightGCN (flat-edge propagation, no DGL) with early stopping on ML-100K.

Capability parity with reference ``examples/lightgcn_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import LightGCN

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(
    data=ml_100k, test_size=0.1, val_size=0.1, rating_threshold=4.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

lightgcn = LightGCN(
    emb_size=64, num_epochs=300, learning_rate=0.001, batch_size=1024,
    num_layers=3, lambda_reg=1e-4, seed=2020, verbose=True,
    early_stopping={"min_delta": 1e-4, "patience": 50},
)

ct.Experiment(
    eval_method=rs, models=[lightgcn],
    metrics=[Precision(k=20), Recall(k=20), NDCG(k=20)],
).run()
