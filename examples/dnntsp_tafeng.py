"""DNNTSP — deep neural network for temporal-sets prediction on Ta Feng.

Capability parity with reference ``examples/dnntsp_tafeng.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import tafeng
from cornac_tpu.eval_methods import NextBasketEvaluation
from cornac_tpu.metrics import HitRatio, Recall
from cornac_tpu.models import DNNTSP

baskets = tafeng.load_basket()

nbe = NextBasketEvaluation(data=baskets, fmt="UBITJson", test_size=0.2, seed=123, verbose=True)

dnntsp = DNNTSP(emb_dim=32, loss_type="bpr", lr=0.001, n_epochs=30, batch_size=64, seed=123, verbose=True)

ct.Experiment(
    eval_method=nbe, models=[dnntsp],
    metrics=[Recall(k=10), Recall(k=50), HitRatio(k=10)],
).run()
