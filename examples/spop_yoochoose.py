"""SPop — session/global popularity baseline under next-item evaluation on
YooChoose buy events.

Capability parity with reference ``examples/spop_yoochoose.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import yoochoose
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, HitRatio, NDCG
from cornac_tpu.models import SPop

buys = yoochoose.load_buy()
test = yoochoose.load_test()

nie = NextItemEvaluation.from_splits(
    train_data=buys, test_data=test, fmt="SITJson",
    exclude_unknowns=True, verbose=True, seed=123, mode="last",
)

ct.Experiment(
    eval_method=nie,
    models=[SPop(), SPop(use_session_popularity=False, name="Pop")],
    metrics=[MRR(), HitRatio(k=20), NDCG(k=20)],
).run()
