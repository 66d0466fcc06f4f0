"""UPCF — user-popularity collaborative filtering with recency for
next-basket prediction on Ta Feng.

Capability parity with reference ``examples/upcf_tafeng.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import tafeng
from cornac_tpu.eval_methods import NextBasketEvaluation
from cornac_tpu.metrics import HitRatio, Recall
from cornac_tpu.models import UPCF

baskets = tafeng.load_basket()

nbe = NextBasketEvaluation(data=baskets, fmt="UBITJson", test_size=0.2, seed=123, verbose=True)

upcf = UPCF(recency=1, locality=1, asymmetry=0.25, verbose=True)

ct.Experiment(
    eval_method=nbe, models=[upcf],
    metrics=[Recall(k=10), Recall(k=50), HitRatio(k=10)],
).run()
