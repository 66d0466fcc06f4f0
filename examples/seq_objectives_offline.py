"""The sequential-family training surface, end-to-end on synthetic
sessions (no downloads): every transformer objective (mlm / clm / rtd /
plm), the GRU4Rec loss family with logQ correction and dropout, FPMC's
generalized losses, and best-on-validation model selection.

Mirrors the reference's objective coverage
(``cornac/models/transformer_rec/objectives/``,
``cornac/models/seq_utils/losses.py``).
"""

import numpy as np

import cornac_tpu as ct
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import MRR, HitRatio, NDCG
from cornac_tpu.models import FPMC, GRU4Rec, SASRec, TransformerRec

# ---- synthetic sessions with a strong next-item pattern ----------------
rng = np.random.RandomState(42)


def gen(n_sessions, sid0):
    rows = []
    for s in range(n_sessions):
        start = rng.randint(0, 60)
        items = [(start + j) % 80 for j in range(rng.randint(3, 10))]
        user = f"u{rng.randint(100)}"
        for t, item in enumerate(items):
            rows.append((user, f"s{sid0 + s}", f"i{item}", t))
    return rows


nie = NextItemEvaluation.from_splits(
    train_data=gen(600, 0),
    test_data=gen(100, 20000),
    val_data=gen(80, 10000),
    fmt="USIT",
    exclude_unknowns=True,
    seed=123,
)

shared = dict(n_epochs=5, batch_size=128, n_sample=64, seed=123)

models = [
    GRU4Rec(
        name="GRU4Rec-xe-logq",
        layers=[64],
        loss="cross-entropy",
        logq=1.0,
        dropout_p_hidden=0.1,
        max_len=12,
        **shared,
    ),
    GRU4Rec(
        name="GRU4Rec-bprmax-best",
        layers=[64, 32],
        loss="bpr-max",
        model_selection="best",
        val_eval_every=2,
        max_len=12,
        **shared,
    ),
    SASRec(
        name="SASRec-ce",
        embedding_dim=32,
        num_blocks=1,
        dropout=0.2,
        use_biases=True,
        max_len=12,
        **shared,
    ),
    TransformerRec(
        name="TRec-clm-last",
        backbone="gpt2",
        objective="clm",
        loss_at="last",
        embedding_dim=32,
        num_blocks=1,
        max_len=12,
        **shared,
    ),
    TransformerRec(
        name="TRec-rtd",
        backbone="electra",
        objective="rtd",
        rtd_lambda=0.5,
        embedding_dim=32,
        num_blocks=1,
        max_len=12,
        **shared,
    ),
    TransformerRec(
        name="TRec-plm",
        backbone="xlnet",
        objective="plm",
        embedding_dim=32,
        num_blocks=1,
        max_len=12,
        **shared,
    ),
    FPMC(name="FPMC-ce", embedding_dim=32, loss="ce", **shared),
]

ct.Experiment(
    eval_method=nie,
    models=models,
    metrics=[MRR(), HitRatio(k=10), NDCG(k=10)],
).run()
