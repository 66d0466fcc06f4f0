"""FPMC — factorized personalized Markov chains on Diginetica sessions.

Capability parity with reference ``examples/fpmc_diginetica.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import diginetica
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, HitRatio, NDCG
from cornac_tpu.models import FPMC

train = diginetica.load_train()
test = diginetica.load_test()

nie = NextItemEvaluation.from_splits(
    train_data=train, test_data=test, fmt="USIT",
    exclude_unknowns=True, verbose=True, seed=123, mode="last",
)

fpmc = FPMC(embedding_dim=32, n_epochs=10, learning_rate=0.01, batch_size=1024, seed=123, verbose=True)

ct.Experiment(
    eval_method=nie, models=[fpmc],
    metrics=[MRR(), HitRatio(k=10), NDCG(k=10)],
).run()
