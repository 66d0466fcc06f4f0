"""Beacon — correlation-sensitive basket RNN on Ta Feng.

Capability parity with reference ``examples/beacon_tafeng.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import tafeng
from cornac_tpu.eval_methods import NextBasketEvaluation
from cornac_tpu.metrics import HitRatio, Recall
from cornac_tpu.models import Beacon

baskets = tafeng.load_basket()

nbe = NextBasketEvaluation(data=baskets, fmt="UBITJson", test_size=0.2, seed=123, verbose=True)

beacon = Beacon(
    emb_dim=2, rnn_unit=4, alpha=0.5, rnn_cell_type="LSTM",
    n_epochs=15, batch_size=32, lr=0.001, seed=123, verbose=True,
)

ct.Experiment(
    eval_method=nbe, models=[beacon],
    metrics=[Recall(k=10), Recall(k=50), HitRatio(k=10)],
).run()
