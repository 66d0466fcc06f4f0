"""TransformerRec — in-house transformer backbones (bert/gpt2-style) with
mlm/clm objectives on Diginetica; BERT4Rec is the (backbone=bert,
objective=mlm) alias.

Capability parity with reference ``examples/transformer_rec_diginetica.py``.
"""

import cornac_tpu as ct
from cornac_tpu.datasets import diginetica
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, HitRatio, NDCG
from cornac_tpu.models import BERT4Rec, TransformerRec

train = diginetica.load_train()
test = diginetica.load_test()

nie = NextItemEvaluation.from_splits(
    train_data=train, test_data=test, fmt="USIT",
    exclude_unknowns=True, verbose=True, seed=123, mode="last",
)

models = [
    BERT4Rec(embedding_dim=64, n_layers=2, n_heads=2, max_len=50, mask_prob=0.2,
             n_epochs=10, batch_size=128, seed=123),
    TransformerRec(backbone="gpt2", objective="clm", embedding_dim=64, n_layers=2,
                   n_heads=2, max_len=50, n_epochs=10, batch_size=128, seed=123),
]

ct.Experiment(
    eval_method=nie, models=models,
    metrics=[MRR(), HitRatio(k=20), NDCG(k=20)],
).run()
