"""NGCF — neural graph collaborative filtering on MovieLens 100K.

Capability parity with reference ``examples/ngcf_example.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Precision, Recall
from cornac_tpu.models import NGCF

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(
    data=ml_100k, test_size=0.1, val_size=0.1, rating_threshold=4.0,
    exclude_unknowns=True, verbose=True, seed=123,
)

ngcf = NGCF(
    emb_size=64, layer_sizes=[64, 64, 64], dropout_rates=[0.1, 0.1, 0.1],
    num_epochs=200, learning_rate=0.001, batch_size=1024, lambda_reg=1e-5,
    seed=2020, verbose=True,
    early_stopping={"min_delta": 1e-4, "patience": 50},
)

ct.Experiment(
    eval_method=rs, models=[ngcf],
    metrics=[Precision(k=20), Recall(k=20), NDCG(k=20)],
).run()
