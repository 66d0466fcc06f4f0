"""SASRec — self-attentive sequential recommendation under leave-last-out
next-item evaluation on Diginetica.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import diginetica
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, HitRatio, NDCG
from cornac_tpu.models import SASRec

train = diginetica.load_train()
test = diginetica.load_test()

nie = NextItemEvaluation.from_splits(
    train_data=train, test_data=test, fmt="USIT",
    exclude_unknowns=True, verbose=True, seed=123, mode="last",
)

sasrec = SASRec(
    embedding_dim=64, n_layers=2, n_heads=1, max_len=50,
    n_epochs=10, batch_size=128, learning_rate=0.001, seed=123, verbose=True,
)

ct.Experiment(
    eval_method=nie, models=[sasrec],
    metrics=[MRR(), HitRatio(k=20), NDCG(k=20)],
).run()
