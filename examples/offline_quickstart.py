"""Offline quick-start: the full train/evaluate/recommend loop on synthetic
data — runs with zero network access (all other examples download a
benchmark dataset on first use).
"""

import numpy as np

import cornac_tpu as ct
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC, NDCG, Recall, RMSE
from cornac_tpu.models import MF, BPR, MostPop

# Synthetic explicit feedback: 120 users x 80 items, ~3k ratings.
rng = np.random.RandomState(42)
users = rng.randint(0, 120, size=3000)
items = rng.randint(0, 80, size=3000)
ratings = np.clip(np.round(3.0 + 0.8 * rng.randn(3000) + 0.02 * (users % 5)), 1, 5)
data = list(zip((f"u{u}" for u in users), (f"i{i}" for i in items), ratings))

rs = RatioSplit(data=data, test_size=0.2, rating_threshold=4.0, seed=123)

experiment = ct.Experiment(
    eval_method=rs,
    models=[
        MostPop(),
        MF(k=8, max_iter=20, seed=123),
        BPR(k=8, max_iter=50, seed=123),
    ],
    metrics=[RMSE(), AUC(), NDCG(k=10), Recall(k=10)],
)
experiment.run()

# Post-hoc: raw-ID recommendations from a fitted model.
bpr = experiment.models[2]
print("Top-5 for user u7:", bpr.recommend("u7", k=5, remove_seen=True, train_set=rs.train_set))
