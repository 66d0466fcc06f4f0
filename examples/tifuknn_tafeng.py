"""TIFUKNN — temporal-decay user-KNN for next-basket prediction on Ta Feng.

Capability parity with reference ``examples/tifuknn_tafeng.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import tafeng
from cornac_tpu.eval_methods import NextBasketEvaluation
from cornac_tpu.metrics import HitRatio, Recall
from cornac_tpu.models import TIFUKNN

baskets = tafeng.load_basket()

nbe = NextBasketEvaluation(data=baskets, fmt="UBITJson", test_size=0.2, seed=123, verbose=True)

tifuknn = TIFUKNN(n_neighbors=300, within_decay_rate=0.9, group_decay_rate=0.7, alpha=0.7, n_groups=7)

ct.Experiment(
    eval_method=nbe, models=[tifuknn],
    metrics=[Recall(k=10), Recall(k=50), HitRatio(k=10)],
).run()
