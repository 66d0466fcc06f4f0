"""GRU4Rec — session-based RNN (lax.scan GRU, logQ-corrected sampled
losses) on YooChoose.

Capability parity with reference ``examples/gru4rec_yoochoose.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import yoochoose
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, HitRatio, NDCG
from cornac_tpu.models import GRU4Rec

buys = yoochoose.load_buy()
test = yoochoose.load_test()

nie = NextItemEvaluation.from_splits(
    train_data=buys, test_data=test, fmt="SITJson",
    exclude_unknowns=True, verbose=True, seed=123, mode="last",
)

gru4rec = GRU4Rec(
    layers=[100], loss="bpr-max", batch_size=512, learning_rate=0.05,
    n_epochs=5, n_sample=2048, max_len=50, seed=123, verbose=True,
)

ct.Experiment(
    eval_method=nie, models=[gru4rec],
    metrics=[MRR(), HitRatio(k=20), NDCG(k=20)],
).run()
